"""Z-order (Morton) data layout: interleave the bits of several
dimensions into one clustering key so that sorting/range-partitioning
on it gives every output file a small bounding box in EVERY dimension —
the standard data-layout technique behind multi-dimensional scan
pruning at 100 TB (a file whose (min, max) range excludes the predicate
is skipped at plan time; linear sort shrinks one dimension's ranges
while leaving every other dimension's at full width).

The reference engine has no layout surface; this sits in the repo's
beyond-reference scale tier next to the bucketed co-located joins
(sources/bucketed.py) and the md5-addressed shard export
(sources/sinks.py).

Two spellings, deliberately separate:

- :func:`zorder_file` — the DETERMINISTIC value-range assignment
  ``file = (z · files) div 2^(k·bits)`` (a pure map, zero shuffle):
  uniform tiling of z-space, exact integers on every engine, which is
  what makes the registered layout-statistics query fully
  DuckDB-oracle-able. Uniform tiling balances files only under roughly
  uniform key mass — it is the demonstration/statistics spelling.
- :func:`zorder_write` — the production writer:
  ``repartitionByRange(files, z).sortWithinPartitions(z)`` + parquet.
  Range partitioning samples the actual z distribution, so skewed data
  still balances; the boundaries are data-dependent (NOT cross-engine
  reproducible), which is why the oracle-able query uses the tiling
  spelling instead. Per-file z-ranges are disjoint either way — the
  pruning property pytest pins on the files this writer actually
  produces.

Cross-engine determinism: the Morton code is pure integer bit
arithmetic — ``Σ_{i,j} ((x_i >> j) & 1) << (j·k + i)`` — identical in
Spark, DuckDB and Python with no hash and no float anywhere; inputs are
range-checked per row (a loud ``raise_error``/ValueError, the kmeans
ragged-row convention) because silent masking would quietly destroy the
locality the operator exists to provide.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_DIMS = 4
_MAX_KEY_BITS = 62  # signed-BIGINT-safe, incl. the file multiply


def _check(n_dims: int, bits: int, files: int = 1) -> None:
    if not (isinstance(n_dims, int) and 1 <= n_dims <= _MAX_DIMS):
        raise ValueError(f"morton dims must be in [1, {_MAX_DIMS}], got {n_dims}")
    if not (isinstance(bits, int) and bits >= 1):
        raise ValueError(f"bits must be a positive int, got {bits}")
    if not (isinstance(files, int) and files >= 1):
        raise ValueError(f"files must be a positive int, got {files}")
    key_bits = n_dims * bits + max(files - 1, 0).bit_length()
    if key_bits > _MAX_KEY_BITS:
        raise ValueError(
            f"dims*bits + log2(files) = {key_bits} exceeds {_MAX_KEY_BITS} "
            "(the signed-BIGINT budget)"
        )


def morton_code(cols: Sequence[Column], bits: int) -> Column:
    """Interleaved-bit Morton code of ``len(cols)`` dimensions, ``bits``
    bits each — a BIGINT in ``[0, 2^(dims·bits))``. Every input must be
    an integer in ``[0, 2^bits)``; an out-of-range row raises at
    execution time (silent masking would scramble locality)."""
    k = len(cols)
    _check(k, bits)
    lo, hi = 0, (1 << bits) - 1
    guarded = [
        F.when(
            (c >= lo) & (c <= hi), c.cast("bigint")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"morton dimension {i} out of [0, {hi}]: "),
                    c.cast("string"),
                )
            ).cast("bigint")
        )
        for i, c in enumerate(cols)
    ]
    terms = [
        F.shiftleft(F.shiftright(g, j).bitwiseAND(F.lit(1)), j * k + i)
        for i, g in enumerate(guarded)
        for j in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms)


def zorder_file(z: Column, *, n_dims: int, bits: int, files: int) -> Column:
    """Uniform z-space tiling: ``(z · files) div 2^(dims·bits)`` — the
    deterministic file id of the statistics spelling. The z-space size
    is a power of two, so the division is an exact integer right-shift
    (no double anywhere; z·files stays inside the validated
    signed-BIGINT budget)."""
    _check(n_dims, bits, files)
    return F.shiftright(z * F.lit(files), n_dims * bits).cast("bigint")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int,
    files: int,
) -> None:
    """Production z-order writer: range-partition on the Morton code
    (sampled boundaries — balances skew), sort within partitions, write
    one parquet file per partition. The per-file z-ranges are disjoint,
    so each file's bounding box in every clustered dimension is small —
    the pruning property the pytest pins on the actual output files."""
    z = morton_code([F.col(c) for c in cols], bits)
    _check(len(cols), bits, files)
    (
        df.withColumn("__z", z)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# --- oracle ------------------------------------------------------------

def morton_sql(exprs: Sequence[str], bits: int) -> str:
    """DuckDB twin of :func:`morton_code` (no range guard — oracle
    corpora are pre-validated by the Spark side failing loudly),
    generated here so the two spellings cannot drift."""
    k = len(exprs)
    _check(k, bits)
    # each term fully parenthesized: '+' binds tighter than '<<' in
    # DuckDB (C-like precedence), so a bare A << 1 + B << 3 would parse
    # as A << (1 + B) << 3
    terms = [
        f"(((({e}) >> {j}) & 1) << {j * k + i})"
        for i, e in enumerate(exprs)
        for j in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_file_sql(z_expr: str, *, n_dims: int, bits: int, files: int) -> str:
    """DuckDB twin of :func:`zorder_file`."""
    _check(n_dims, bits, files)
    return f"((({z_expr}) * {files}) >> {n_dims * bits})"


# --- driver-side reference (differential tests) ------------------------

def morton_py(vals: Sequence[int], bits: int) -> int:
    k = len(vals)
    _check(k, bits)
    hi = (1 << bits) - 1
    z = 0
    for i, v in enumerate(vals):
        if not (0 <= v <= hi):
            raise ValueError(f"morton dimension {i} out of [0, {hi}]: {v}")
        for j in range(bits):
            z |= ((v >> j) & 1) << (j * k + i)
    return z


# --- min-max clustering quality (overlap depth) ------------------------------


def overlap_depth(df: DataFrame, file_col: str, val_col: str) -> DataFrame:
    """Min-max CLUSTERING-QUALITY metric over a file assignment — the
    number every table-format optimizer reports after a rewrite
    (Delta/Iceberg clustering depth): for each point of the value
    domain, how many files' [min, max] ranges cover it? A perfectly
    sorted layout reads max depth 1 (any predicate point prunes to
    one file); an unsorted layout reads depth ≈ n_files (min-max
    pruning is useless — every file's range spans the domain). This
    is the measurement that JUSTIFIES zorder_write/sorted layouts
    rather than asserting them.

    Exact closed form, closed intervals: boundary events (+1 at each
    file's min, −1 just after its max — at equal points the +1 sorts
    first, so touching ranges count as overlapping); depth = running
    prefix sum over the 2·n_files boundary rows; also
    ``n_overlapping_pairs`` (files whose ranges intersect) from the
    tiny interval self-join. NULL values are ignored for ranges; a
    file with only NULLs carries NULL bounds and joins nothing but
    still counts in n_files.

    Scale shape: ONE partial agg collapses the table to n_files
    (min, max) rows; the sweep window and the pair join both run on
    that file-count-sized frame — the raw table is scanned once.
    Output: ONE row (n_files, max_depth, n_overlapping_pairs)."""
    ranges = df.groupBy(F.col(file_col).alias("f")).agg(
        F.min(val_col).alias("lo"), F.max(val_col).alias("hi")
    )
    n_files = ranges.agg(F.count(F.lit(1)).alias("n_files"))
    bounded = ranges.where(F.col("lo").isNotNull())
    ev = bounded.select(
        F.col("lo").alias("p"), F.lit(0).alias("k"), F.lit(1).alias("d")
    ).unionByName(
        bounded.select(
            F.col("hi").alias("p"), F.lit(1).alias("k"),
            F.lit(-1).alias("d"),
        )
    )
    from pyspark.sql import Window as W

    w = W.orderBy("p", "k").rowsBetween(W.unboundedPreceding, W.currentRow)
    depth = ev.select(F.sum("d").over(w).alias("depth")).agg(
        F.coalesce(F.max("depth"), F.lit(0)).cast("bigint")
        .alias("max_depth")
    )
    a, b = bounded.alias("a"), bounded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.f") < F.col("b.f"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlapping_pairs"))
    )
    return (
        n_files.crossJoin(F.broadcast(depth))
        .crossJoin(F.broadcast(pairs))
        .select(
            F.col("n_files").cast("bigint").alias("n_files"),
            "max_depth",
            "n_overlapping_pairs",
        )
    )


def overlap_depth_sql(*, rel: str, file_col: str, val_col: str) -> str:
    """DuckDB recompute of :func:`overlap_depth` — same closed-interval
    boundary sweep, same pair join, generated here so the two
    spellings cannot drift."""
    return f"""
        with _od_r as (
          select {file_col} as f, min({val_col}) as lo,
                 max({val_col}) as hi
          from {rel} group by 1
        ),
        _od_b as (select * from _od_r where lo is not null),
        _od_e as (
          select lo as p, 0 as k, 1 as d from _od_b
          union all
          select hi as p, 1 as k, -1 as d from _od_b
        ),
        _od_d as (
          select sum(d) over (order by p, k
            rows between unbounded preceding and current row) as depth
          from _od_e
        ),
        _od_m as (
          select coalesce(max(depth), 0)::BIGINT as max_depth from _od_d
        ),
        _od_p as (
          select count(*)::BIGINT as n_overlapping_pairs
          from _od_b a join _od_b b
            on a.f < b.f and a.lo <= b.hi and b.lo <= a.hi
        ),
        _od_n as (select count(*)::BIGINT as n_files from _od_r)
        select n.n_files, m.max_depth, p.n_overlapping_pairs
        from _od_n n cross join _od_m m cross join _od_p p
    """
