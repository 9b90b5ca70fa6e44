"""Table profiling: per-column null counts, exact distinct counts, and
min/max — the data-quality summary every ingestion pipeline runs before
trusting a new drop of crawl data (row counts drifting, a column going
all-NULL, a timestamp range outside the crawl window).

Contract: the input frame must be staged to **string and bigint
columns only** (the caller casts doubles to integer micro-units and
timestamps to epoch micros first, per the repo-wide integerization
convention). That makes every statistic exact and engine-portable:
bigint and ASCII-string min/max render identically on Spark and
DuckDB, and distinct counts are exact integers — no float formatting,
no collation surprises.

Scale shape: ONE aggregation pass. The multi-column exact distinct
counts compile to Spark's Expand strategy (input replicated once per
distinct-aggregate — k× map-side fan-out, still a single shuffle whose
output is one row); the per-column rows are then unpivoted driver-side
from that single row via an explode over a k-element array. At
extreme scale swap the exact distinct counts for the mergeable HLL
sketch in ``operators/sketch.py`` (hll_distinct) — exactness is chosen
here because the profile IS the oracle surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALLOWED = {"string", "bigint"}
_OUT = ("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def table_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all columns) of a staged frame.

    Output: one row per column —
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with min/max rendered as strings (NULL when the column is
    all-NULL). ``n_distinct`` excludes NULLs (both engines' count
    distinct semantics).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    types = dict(df.dtypes)
    for c in cols:
        if c not in types:
            raise ValueError(f"unknown column: {c}")
        if types[c] not in _ALLOWED:
            raise ValueError(
                f"column {c} has type {types[c]}; stage to string/bigint "
                "first (integer micro-units / epoch micros)"
            )
    if set(_OUT) & set(cols):
        raise ValueError(
            f"reserved output column name(s): {sorted(set(_OUT) & set(cols))}"
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def table_profile_sql(*, rel: str, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`table_profile` — a per-column UNION ALL
    over the same staged relation, generated here so the spellings
    cannot drift."""
    cols = list(cols)
    if not cols:
        raise ValueError("no columns to profile")
    parts = [
        f"""select '{c}' as column,
               count(*)::BIGINT as n_rows,
               (count(*) - count({c}))::BIGINT as n_nulls,
               count(distinct {c})::BIGINT as n_distinct,
               min({c})::VARCHAR as min_value,
               max({c})::VARCHAR as max_value
        from {rel}"""
        for c in cols
    ]
    return " union all ".join(parts)


def table_profile_py(rows: list[dict], cols: Sequence[str]) -> list[tuple]:
    """Driver-side reference for :func:`table_profile` (differential
    tests) over dict rows of string/int values."""
    out = []
    n = len(rows)
    for c in cols:
        vals = [r.get(c) for r in rows]
        nn = [v for v in vals if v is not None]
        out.append(
            (
                c,
                n,
                n - len(nn),
                len(set(nn)),
                str(min(nn)) if nn else None,
                str(max(nn)) if nn else None,
            )
        )
    return out


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy in integer
    micro-nats → ``(id, n_chars, distinct_chars, entropy_e6)`` — the
    gibberish/encoded-blob detector of the published quality recipes
    (base64 dumps and minified blobs read near-uniform ≈ ln(alphabet)
    high; single-character runs read 0; natural language sits in a
    stable mid band). A compression-ratio proxy with no codec
    dependency and an exact cross-engine contract.

    Exactness (the lm.py ln convention): H = (1/N)·Σ_ch c·ln(N/c) —
    each per-character term quantizes ``round(1e6·ln(N/c))`` (ONE
    double division + ONE ln, HALF_UP, arguments ≥ 1 so the value is
    non-negative) BEFORE the per-doc sum, making the aggregate an
    order-free exact integer sum; ``entropy_e6`` is then one floor
    division by N (non-negative operands — floor == truncate on every
    engine).

    Scale shape: one character explode feeds a partially-aggregable
    (doc, char) count — a 10⁶-repeat character pre-reduces map-side;
    per-doc totals are one more partial agg; everything else is a
    doc-keyed join. NULL text counts as empty and still emits a row
    (n_chars 0, entropy 0 — the silent-drop lesson)."""
    cnt = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "")
            ).alias("_ch"),
        )
        .where(F.length("_ch") > 0)
        .groupBy(id_col, "_ch")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    tot = cnt.groupBy(id_col).agg(
        F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("_d")
    )
    terms = (
        cnt.join(tot, id_col)
        .select(
            F.col(id_col),
            "_n",
            "_d",
            (
                F.col("_c")
                * F.round(
                    F.log(F.col("_n").cast("double") / F.col("_c")) * 1_000_000
                ).cast("bigint")
            ).alias("_t"),
        )
        .groupBy(id_col, "_n", "_d")
        .agg(F.sum("_t").alias("_s"))
    )
    return (
        df.select(id_col)
        .join(terms, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce(F.col("_d"), F.lit(0)).cast("long")
            .alias("distinct_chars"),
            F.coalesce(F.expr("_s div _n"), F.lit(0)).cast("long")
            .alias("entropy_e6"),
        )
    )


def char_entropy_sql(*, rel: str, id_col: str, text_col: str) -> str:
    """DuckDB recompute of :func:`char_entropy`, generated here so the
    two spellings cannot drift (same quantize-before-sum order, same
    floor division)."""
    return f"""
        with chars as (
          select {id_col},
                 unnest(regexp_split_to_array(coalesce({text_col}, ''), ''))
                   as ch
          from {rel}
        ),
        cnt as (
          select {id_col}, ch, count(*) as c
          from chars where ch <> '' group by {id_col}, ch
        ),
        tot as (
          select {id_col}, sum(c) as n, count(*) as d
          from cnt group by {id_col}
        ),
        agg as (
          select cnt.{id_col},
                 max(tot.n) as n, max(tot.d) as d,
                 sum(cnt.c * cast(round(1e6 * ln(cast(tot.n as double)
                                                 / cnt.c)) as bigint)) as s
          from cnt join tot on tot.{id_col} = cnt.{id_col}
          group by cnt.{id_col}
        )
        select r.{id_col},
               cast(coalesce(a.n, 0) as bigint) as n_chars,
               cast(coalesce(a.d, 0) as bigint) as distinct_chars,
               cast(coalesce(a.s // a.n, 0) as bigint) as entropy_e6
        from {rel} r left join agg a on a.{id_col} = r.{id_col}
    """


def char_entropy_py(text: str | None) -> tuple[int, int, int]:
    """Reference: (n_chars, distinct_chars, entropy_e6) for one text."""
    import math
    from collections import Counter

    c = Counter(text or "")
    n = sum(c.values())
    if n == 0:
        return 0, 0, 0
    s = 0
    for v in c.values():
        x = math.log(n / v) * 1_000_000
        s += v * math.floor(x + 0.5)  # HALF_UP, x >= 0
    return n, len(c), s // n
