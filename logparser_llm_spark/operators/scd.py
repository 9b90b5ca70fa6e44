"""SCD Type-2 history build: collapse a stream of per-snapshot
observations ``(key, ts, attrs…)`` into validity intervals
``(key, attrs…, valid_from, valid_to, version, is_current)`` — one row
per run of consecutive snapshots with identical attributes. The
capture-history shape of a continuous crawl (what did this url's
content digest look like, and when did it change?) and the classic
warehouse slowly-changing-dimension operator.

The reference engine has no history surface; this sits next to the
snapshot operators (`crawl_diff`, `dedup_against_snapshot`) in the
repo's beyond-reference tier.

Scale shape (the part that must survive 100 TB):

- Everything is keyed on the entity: the change-detection lag, the
  running island sum, the per-island aggregate and the interval-chain
  lead all share ``partitionBy(key)`` — ONE shuffle on the key, then
  partition-parallel windows (no global sort anywhere).
- The island aggregate is an ordinary groupBy — partially aggregable,
  so a key observed in millions of snapshots pre-reduces map-side.
- No UDF anywhere; change detection is the null-safe equality operator
  (``<=>`` / ``IS NOT DISTINCT FROM``) inside whole-stage codegen.

Cross-engine determinism: island boundaries are exact (null-safe
equality over exact values — no float, no hash beyond whatever the
caller puts in the attrs), ``valid_to`` is the next island's
``valid_from`` (NULL for the current row), ``version`` numbers islands
per key in ``valid_from`` order. ``(key, ts)`` pairs must be unique —
duplicate observations make "previous row" ill-defined on any engine.
The gap-and-islands algebra is mirrored in :func:`scd2_sql`.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__isl", "valid_from", "valid_to", "version", "is_current")


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Build the type-2 history of ``attr_cols`` over snapshots.

    Output: ``(*key_cols, *attr_cols, valid_from, valid_to, version,
    is_current)`` — one row per island of consecutive equal attributes
    (null-safe: NULL == NULL does not open a new island), ``valid_to``
    exclusive-NULL for each key's latest island.
    """
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    clash = set(_RESERVED) & (set(key_cols) | {ts_col} | set(attr_cols))
    if clash:
        raise ValueError(f"reserved output column name(s): {sorted(clash)}")
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    same_as_prev = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in attr_cols],
    )
    is_change = F.lag(F.col(ts_col)).over(w).isNull() | ~same_as_prev
    islands = df.withColumn(
        "__isl",
        F.sum(is_change.cast("bigint")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    hist = islands.groupBy(*key_cols, "__isl").agg(
        F.min(ts_col).alias("valid_from"),
        # attrs are constant within an island by construction
        *[F.min(c).alias(c) for c in attr_cols],
    )
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    return (
        hist.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2).cast("bigint"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols, *attr_cols,
            "valid_from", "valid_to", "version", "is_current",
        )
    )


def scd2_sql(
    *,
    snapshots: str,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> str:
    """DuckDB recompute of the gap-and-islands history, generated here
    so the two spellings cannot drift. ``snapshots`` is a relation (or
    parenthesized subquery) with the same columns."""
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    keys = ", ".join(key_cols)
    attrs = ", ".join(attr_cols)
    same = " and ".join(
        f"({c} is not distinct from lag({c}) over w)" for c in attr_cols
    )
    attr_mins = ", ".join(f"min({c}) as {c}" for c in attr_cols)
    return f"""
        with flagged as (
          select {keys}, {ts_col}, {attrs},
                 case when lag({ts_col}) over w is null
                        or not ({same})
                      then 1 else 0 end as chg
          from {snapshots}
          window w as (partition by {keys} order by {ts_col})
        ),
        isl as (
          select *,
                 sum(chg) over (
                   partition by {keys} order by {ts_col}
                   rows between unbounded preceding and current row
                 ) as grp
          from flagged
        ),
        hist as (
          select {keys}, grp, min({ts_col}) as valid_from, {attr_mins}
          from isl group by {keys}, grp
        )
        select {keys}, {attrs},
               valid_from,
               lead(valid_from) over w2 as valid_to,
               (row_number() over w2)::BIGINT as version,
               (lead(valid_from) over w2 is null) as is_current
        from hist
        window w2 as (partition by {keys} order by valid_from)
    """


_CDC_RESERVED = ("last_seq", "_n", "_nd", "_op", "_seq", "_rawop")


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Apply a CDC change batch to a snapshot — the MERGE INTO / upsert
    shape every lakehouse ingestion job runs: ``changes`` carries
    ``(keys…, seq, op, attrs…)`` rows with op ∈ {'I','U','D'}; the
    output is the NEW snapshot ``(keys…, attrs…, last_seq)`` where each
    key's LATEST change (max ``seq``) wins — 'I'/'U' upsert the attrs
    (``last_seq`` = the applied seq), 'D' removes the row, and keys
    untouched by the batch pass through (``last_seq`` NULL).

    Scale shape: the change batch collapses FIRST via one partially
    aggregable groupBy (``max_by(attr, seq)`` per column — a key
    churned by 10⁶ changes pre-reduces inside map tasks before the
    shuffle; no window, no sort), then ONE full-outer equi-join against
    the snapshot. Contracts are enforced loudly at execution time, not
    in droppable columns (the bigram_pmi dead-guard lesson): a
    duplicate (key, seq) pair — which would make "latest" ill-defined —
    and an unknown op letter both raise inside the KEPT op expression.

    The DuckDB mirror (:func:`cdc_apply_sql`) deliberately reduces the
    batch with the INDEPENDENT window row_number spelling, so hash
    agreement validates the max_by reduction rather than restating it.

    NULL keys never match (the join is null-unsafe on BOTH engines —
    the oracle spells ``=`` on purpose): a NULL-key snapshot row passes
    through untouched and a NULL-key change row applies as its own row.
    Use a sentinel if NULL must be a joinable key value.
    """
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    names = set(key_cols) | {seq_col, op_col} | set(attr_cols)
    clash = (set(_CDC_RESERVED) & names) | {
        c for c in names if c.startswith("_c_")  # internal attr aliases
    }
    if clash:
        raise ValueError(f"reserved output column name(s): {sorted(clash)}")
    keys = list(key_cols)
    latest = (
        changes.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct(F.col(seq_col)).alias("_nd"),
            F.max(F.col(seq_col)).alias("_seq"),
            F.max_by(F.col(op_col), F.col(seq_col)).alias("_rawop"),
            *[
                F.max_by(F.col(c), F.col(seq_col)).alias(f"_c_{c}")
                for c in attr_cols
            ],
        )
        .select(
            *keys,
            "_seq",
            # both guards woven into the kept op expression — Catalyst
            # cannot prune them away without dropping the op itself
            F.when(
                F.assert_true(
                    F.col("_n") == F.col("_nd"),
                    F.lit("cdc_apply: duplicate (key, seq) in change batch"),
                ).isNull()
                & F.assert_true(
                    F.col("_rawop").isin("I", "U", "D"),
                    F.concat(
                        F.lit("cdc_apply: unknown op: "), F.col("_rawop")
                    ),
                ).isNull(),
                F.col("_rawop"),
            ).alias("_op"),
            *[F.col(f"_c_{c}") for c in attr_cols],
        )
    )
    snap = snapshot.select(*keys, *attr_cols)
    joined = snap.alias("s").join(latest.alias("c"), keys, "full_outer")
    upserted = F.col("_op").isin("I", "U")
    return (
        joined.where(F.col("_op").isNull() | (F.col("_op") != "D"))
        .select(
            *keys,
            *[
                F.when(upserted, F.col(f"_c_{c}"))
                .otherwise(F.col(f"s.{c}"))
                .alias(c)
                for c in attr_cols
            ],
            F.when(upserted, F.col("_seq")).cast("long").alias("last_seq"),
        )
    )


def cdc_apply_sql(
    *,
    snapshot: str,
    changes: str,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    attr_cols: Sequence[str],
) -> str:
    """DuckDB recompute of :func:`cdc_apply` using the window
    row_number latest-change spelling (independent of the Spark side's
    max_by reduction). ``snapshot``/``changes`` are relations or
    parenthesized subqueries with the documented columns."""
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    keys = ", ".join(key_cols)
    # plain (null-UNSAFE) equality on purpose: Spark's join-on-name-list
    # is null-unsafe, so a NULL-key row never matches on either engine —
    # a null-safe spelling here would silently diverge from the Spark side
    on = " and ".join(f"s.{k} = c.{k}" for k in key_cols)
    key_out = ", ".join(f"coalesce(s.{k}, c.{k}) as {k}" for k in key_cols)
    attr_out = ", ".join(
        f"case when c.{op_col} in ('I','U') then c.{c} else s.{c} end as {c}"
        for c in attr_cols
    )
    cattrs = ", ".join(f"c.{c}" for c in attr_cols)
    return f"""
        with ranked as (
          select {keys}, {seq_col}, {op_col},
                 {", ".join(attr_cols)},
                 row_number() over (
                   partition by {keys} order by {seq_col} desc
                 ) as rn
          from {changes}
        ),
        latest as (select * from ranked where rn = 1)
        select {key_out}, {attr_out},
               (case when c.{op_col} in ('I','U')
                     then c.{seq_col} end)::BIGINT as last_seq
        from {snapshot} s
        full outer join (select {keys}, {seq_col}, {op_col}, {cattrs}
                         from latest c) c
          on {on}
        where c.{op_col} is null or c.{op_col} <> 'D'
    """


def cdc_apply_py(
    snapshot: dict,
    changes: Sequence[tuple],
) -> dict:
    """Reference over single-key single-attr rows: ``snapshot`` maps
    key → attr; ``changes`` is (key, seq, op, attr) tuples. Returns the
    new key → (attr, last_seq) mapping."""
    latest: dict = {}
    seen = set()
    for k, seq, op, a in changes:
        if (k, seq) in seen:
            raise ValueError(f"duplicate (key, seq): {(k, seq)}")
        if op not in ("I", "U", "D"):
            raise ValueError(f"unknown op: {op}")
        seen.add((k, seq))
        if k not in latest or seq > latest[k][0]:
            latest[k] = (seq, op, a)
    out = {k: (a, None) for k, a in snapshot.items()}
    for k, (seq, op, a) in latest.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = (a, seq)
    return out


# --- driver-side reference (differential tests) ------------------------

def scd2_py(
    rows: Sequence[tuple],
) -> list[tuple]:
    """Reference over ``(key, ts, attr)`` single-key single-attr rows →
    sorted ``(key, attr, valid_from, valid_to, version, is_current)``."""
    by_key: dict = {}
    seen = set()
    for k, ts, a in rows:
        if (k, ts) in seen:
            raise ValueError(f"duplicate (key, ts) observation: {(k, ts)}")
        seen.add((k, ts))
        by_key.setdefault(k, []).append((ts, a))
    out = []
    for k, obs in by_key.items():
        obs.sort(key=lambda t: t[0])
        islands = []
        prev = object()
        for ts, a in obs:
            if not islands or a != prev or (a is None) != (prev is None):
                islands.append([ts, a])
            prev = a
        for i, (vf, a) in enumerate(islands):
            vt = islands[i + 1][0] if i + 1 < len(islands) else None
            out.append((k, a, vf, vt, i + 1, vt is None))
    return sorted(out, key=lambda t: (str(t[0]), t[4]))
