"""Mergeable sketches: portable HyperLogLog (distinct counts),
Count-Min (frequencies) and Bloom filter (membership) — one family,
one shared md5 hash convention.

The canonical 100 TB counting problem — "distinct users per key over a
corpus that does not fit anywhere" — needs a sketch, not a count
(distinct): exact distinct shuffles every (key, value) pair; a
HyperLogLog shuffles at most ``m`` integers per key, is map-side
partially aggregable (register max combines in the scan stage), and
sketches from different days/partitions UNION by element-wise max, so
rollups (hour → day → month) never rescan the raw data. The reference
has no sketch surface (its scale ceiling is one process); this module
is part of the repo's beyond-reference training-data-pipeline tier,
next to dedup/ANN (SURVEY §2 "beyond" block).

Design constraints, in priority order:

1. **Portable** — like every cross-engine artifact in this repo
   (functions/hashing.py), the hash is md5: Spark, DuckDB and Python
   ``hashlib`` compute bit-identical registers, so the registered
   query's oracle is a FULL hash-green DuckDB recompute of the sketch
   itself, not a tolerance band. We take the first 15 hex chars = 60
   bits, the widest md5 prefix that fits a signed BIGINT in both
   engines (16 chars can overflow to negative).
2. **Deterministic estimate** — the HLL estimate is kept to ONE
   floating-point division per group: the harmonic sum is computed in
   exact integer arithmetic (``Σ 2^(K−ρ_j)`` with K = max possible ρ,
   so every addend is an integer ≤ 2^K and the BIGINT sum is exact),
   and only the final ``alpha·m²·2^K / S`` happens in IEEE doubles —
   identical in the JVM and DuckDB. The ``ln``-based linear-counting
   branch (small cardinalities) is implemented but its cross-engine
   parity is only ulp-level (libm vs JVM); the registered query's
   corpus is asserted (tests) to stay on the division branch.
3. **Scale shape** — ``hll_registers`` is a single groupBy(key, idx)
   max: partially aggregable, skew-free (register index is uniform by
   construction), output ≤ m rows per key. No UDF anywhere.

Precision ``p`` gives m = 2^p registers and ~1.04/√m relative error:
p=12 (default, 4096 registers) ≈ 1.6%; the registered query uses p=8
(256 registers ≈ 6.5%) so the zero-register/branch structure is
exercised at test-data cardinalities.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# 15 hex chars = 60 bits: the widest md5 prefix whose unsigned value
# always fits a signed 64-bit integer in Spark, DuckDB and Python.
HASH_HEX_CHARS = 15
HASH_BITS = 4 * HASH_HEX_CHARS

DEFAULT_P = 12


def _check_p(p: int) -> int:
    if not isinstance(p, int) or not (4 <= p <= 16):
        raise ValueError(f"HLL precision p must be an int in [4, 16], got {p!r}")
    return p


def _alpha(m: int) -> float:
    """Bias-correction constant from Flajolet et al. 2007, Fig. 3."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _estimate_const(p: int) -> float:
    """alpha_m * m^2 * 2^K as one double — the numerator of the raw
    estimate. K = (60 - p) + 1 is the maximum possible register value,
    the scaling that makes the harmonic denominator an exact integer."""
    m = 1 << p
    k = (HASH_BITS - p) + 1
    return _alpha(m) * m * m * float(2**k)


def hll_register_exprs(value_col: str, p: int = DEFAULT_P):
    """(reg_idx, rho) column expressions over a raw row — the shared
    building block of the batch groupBy (:func:`hll_registers`) and the
    streaming windowed aggregation (streaming/incremental.py).

    ρ = 1 + number of leading zeros of the low ``60-p`` hash bits
    (``60-p+1`` if they are all zero); reg_idx = the high ``p`` bits.
    """
    _check_p(p)
    wbits = HASH_BITS - p
    mask = (1 << wbits) - 1
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, HASH_HEX_CHARS), 16, 10).cast(
        "bigint"
    )
    idx = F.shiftright(h, wbits)
    w = h.bitwiseAND(F.lit(mask))
    rho = (
        F.when(w > 0, F.lit(wbits + 1) - F.length(F.bin(w)))
        .otherwise(F.lit(wbits + 1))
        .cast("int")
    )
    return idx, rho


def hll_registers(
    df: DataFrame, key_cols: Sequence[str], value_col: str, p: int = DEFAULT_P
) -> DataFrame:
    """Build per-key HLL registers: key_cols + (reg_idx, rho).

    One partially-aggregable groupBy-max; absent (idx) rows ARE the
    zero registers and are materialized only at estimate time. NULL
    values are skipped (count-distinct semantics). The value column
    must already be a string with an engine-agnostic rendering (cast
    numerics explicitly, as the sampling module requires of its keys).
    """
    idx, rho = hll_register_exprs(value_col, p)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*key_cols, idx.alias("reg_idx"), rho.alias("rho"))
        .groupBy(*key_cols, "reg_idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(reg_df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Union of sketches = element-wise register max. Feed it the
    unioned register frames of any number of :func:`hll_registers`
    outputs (built with the SAME p) — e.g. daily sketches rolling up
    to monthly without rescanning raw data."""
    return reg_df.groupBy(*key_cols, "reg_idx").agg(F.max("rho").alias("rho"))


def hll_estimate(
    reg_df: DataFrame, key_cols: Sequence[str], p: int = DEFAULT_P
) -> DataFrame:
    """Per-key cardinality estimate from a register frame.

    Output: key_cols + ``n_registers`` (= m), ``zero_registers``,
    ``est_distinct`` (BIGINT). Exact-integer harmonic sum; one double
    division (see module docstring); linear-counting fallback below
    2.5·m with zero registers present, exactly the published
    small-range correction.
    """
    _check_p(p)
    m = 1 << p
    k = (HASH_BITS - p) + 1
    const = _estimate_const(p)
    # Σ 2^(K-ρ) over SEEN registers, exact in BIGINT (ρ ∈ [1, K] here;
    # the 2^K addend belongs to zero registers, added arithmetically).
    addend = F.expr(f"shiftleft(cast(1 as bigint), {k} - rho)")
    seen = reg_df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_seen"),
        F.sum(addend).alias("_s_seen"),
    )
    zero = F.lit(m).cast("bigint") - F.col("_seen")
    s_total = (F.col("_s_seen") + zero * F.lit(1 << k).cast("bigint")).cast("double")
    est_raw = F.lit(const) / s_total
    est_lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zero.cast("double"))
    est = F.when((est_raw <= 2.5 * m) & (zero > 0), est_lc).otherwise(est_raw)
    return seen.select(
        *key_cols,
        F.lit(m).cast("bigint").alias("n_registers"),
        zero.cast("bigint").alias("zero_registers"),
        F.round(est).cast("bigint").alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, key_cols: Sequence[str], value_col: str, p: int = DEFAULT_P
) -> DataFrame:
    """registers → estimate in one call (the common single-pass use)."""
    return hll_estimate(hll_registers(df, key_cols, value_col, p), key_cols, p)


def hll_estimate_sql(
    table: str, group_expr: str, value_expr: str, p: int, group_alias: str = "grp"
) -> str:
    """DuckDB rendering of registers+estimate over ``table`` — the
    oracle half. Kept in lockstep with the three Spark/Python
    renderings above; a change to one desynchronizes the registered
    query's hash parity."""
    _check_p(p)
    m = 1 << p
    wbits = HASH_BITS - p
    k = wbits + 1
    mask = (1 << wbits) - 1
    const = repr(_estimate_const(p))
    return f"""
      with hll_h as (
        select {group_expr} as {group_alias},
               ('0x' || substr(md5({value_expr}), 1, {HASH_HEX_CHARS}))::BIGINT as h
        from {table}
        where {value_expr} is not null
      ),
      hll_r as (
        select {group_alias}, h >> {wbits} as reg_idx,
               max(case when (h & {mask}) > 0
                        then {wbits + 1} - length(bin(h & {mask}))
                        else {wbits + 1} end) as rho
        from hll_h group by 1, 2
      ),
      hll_a as (
        select {group_alias}, count(*) as seen,
               cast(sum(1::BIGINT << ({k} - rho)) as bigint) as s_seen
        from hll_r group by 1
      ),
      hll_e as (
        select {group_alias}, {m} - seen as zero_registers,
               cast(s_seen + ({m} - seen) * (1::BIGINT << {k}) as double) as s_total
        from hll_a
      )
      select {group_alias}, cast({m} as bigint) as n_registers,
             cast(zero_registers as bigint) as zero_registers,
             cast(round(case when {const} / s_total <= {2.5 * m}
                              and zero_registers > 0
                             then {m} * ln({m} / cast(zero_registers as double))
                             else {const} / s_total end) as bigint) as est_distinct
      from hll_e
    """


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation
#
# The companion sketch to HLL: "how often does value v occur" over a
# stream too large to count exactly per value. D independent hash rows
# of W counters; point estimate = min over rows; union of sketches =
# element-wise SUM (mergeable map-side, like every aggregate here).
# Estimates are deterministic OVERcounts (est ≥ true, never under).
# Unlike HLL there is no floating point anywhere — the cross-engine
# contract is exact integer equality by construction.


def _check_cms(depth: int, width: int) -> None:
    if not (isinstance(depth, int) and 1 <= depth <= 16):
        raise ValueError(f"CMS depth must be an int in [1, 16], got {depth!r}")
    if not (isinstance(width, int) and 2 <= width <= 1 << 24):
        raise ValueError(f"CMS width must be an int in [2, 2^24], got {width!r}")


def _cms_bucket_expr(depth_col, value_col, width: int):
    """Row-d bucket: md5('<d>|<value>') first 8 hex chars mod width —
    the repo's shared portable bucket hash (functions/hashing.py) with
    the depth index salted into the key, giving D independent hash
    functions from one md5 family."""
    key = F.concat(depth_col.cast("string"), F.lit("|"), F.col(value_col))
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint"),
        F.lit(width),
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build a Count-Min sketch of the ``value_col`` stream: one row
    per non-empty (depth_i, bucket) with its count. NULL values are
    skipped. One partially-aggregable groupBy over a depth-expanded
    stream (D rows per input row; D is 4 — the expansion happens
    inside the scan stage, never shuffled raw)."""
    _check_cms(depth, width)
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth_i")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col), d)
        .select(
            F.col("depth_i").cast("int").alias("depth_i"),
            _cms_bucket_expr(F.col("depth_i"), value_col, width).alias("bucket"),
        )
        .groupBy("depth_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(cms_df: DataFrame) -> DataFrame:
    """Union of sketches = element-wise counter sum. Feed the unioned
    row frames of any number of :func:`cms_build` outputs (same
    depth/width)."""
    return cms_df.groupBy("depth_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms_df: DataFrame,
    probes: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate the count of every probe value: min over the D
    rows of the addressed counters (absent counter = 0). Output:
    ``<value_col>``, ``est_count``. The probe side is expected small
    (it drives a broadcast-able D-way expansion)."""
    _check_cms(depth, width)
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("depth_i")
    addressed = probes.select(F.col(value_col), d).select(
        value_col,
        F.col("depth_i").cast("int").alias("depth_i"),
        _cms_bucket_expr(F.col("depth_i"), value_col, width).alias("bucket"),
    )
    return (
        addressed.join(cms_df, ["depth_i", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
    )


def cms_sql(
    stream_cte: str,
    value_expr: str,
    probes_cte: str,
    probe_expr: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB rendering of build+estimate: ``stream_cte``/``probes_cte``
    are CTE names already defined in the enclosing WITH; returns the
    chained CTE body ``cms_c, cms_e`` where ``cms_e(v, est_count)`` is
    the estimate relation. Exact integer parity with the Spark path."""
    _check_cms(depth, width)
    bucket = (
        "(('0x' || substr(md5(cast(d.depth_i as varchar) || '|' || {v}), 1, 8))"
        f"::BIGINT % {width})"
    )
    return f"""
      cms_d as (select unnest(range({depth})) as depth_i),
      cms_c as (
        select d.depth_i, {bucket.format(v=value_expr)} as bucket, count(*) as cnt
        from {stream_cte} cross join cms_d d
        where {value_expr} is not null
        group by 1, 2
      ),
      cms_e as (
        select p.{probe_expr} as v,
               cast(min(coalesce(c.cnt, 0)) as bigint) as est_count
        from {probes_cte} p
        cross join cms_d d
        left join cms_c c
          on c.depth_i = d.depth_i
         and c.bucket = {bucket.format(v=f"p.{probe_expr}")}
        group by 1
      )
    """


def cms_build_py(values: Iterable[str], *, depth: int = 4, width: int = 1024) -> dict:
    _check_cms(depth, width)
    counters: dict[tuple[int, int], int] = {}
    for v in values:
        if v is None:
            continue
        for d in range(depth):
            key = f"{d}|{v}".encode()
            b = int(hashlib.md5(key).hexdigest()[:8], 16) % width
            counters[(d, b)] = counters.get((d, b), 0) + 1
    return counters


def cms_estimate_py(
    counters: dict, value: str, *, depth: int = 4, width: int = 1024
) -> int:
    _check_cms(depth, width)
    return min(
        counters.get(
            (d, int(hashlib.md5(f"{d}|{value}".encode()).hexdigest()[:8], 16) % width),
            0,
        )
        for d in range(depth)
    )


# ---------------------------------------------------------------------------
# Pure-Python rendering (tests / driver-side spot checks)


def hll_registers_py(values: Iterable[str], p: int = DEFAULT_P) -> dict[int, int]:
    _check_p(p)
    wbits = HASH_BITS - p
    mask = (1 << wbits) - 1
    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:HASH_HEX_CHARS], 16)
        idx = h >> wbits
        w = h & mask
        rho = (wbits + 1 - w.bit_length()) if w else (wbits + 1)
        if rho > regs.get(idx, 0):
            regs[idx] = rho
    return regs


def hll_estimate_py(regs: dict[int, int], p: int = DEFAULT_P) -> dict:
    """Python rendering of :func:`hll_estimate` for one key. Returns
    the same fields plus ``raw_branch`` (True when the division branch
    was taken — the branch whose cross-engine parity is exact)."""
    _check_p(p)
    m = 1 << p
    k = (HASH_BITS - p) + 1
    zero = m - len(regs)
    s_total = sum(1 << (k - rho) for rho in regs.values()) + zero * (1 << k)
    est_raw = _estimate_const(p) / float(s_total)
    raw_branch = not (est_raw <= 2.5 * m and zero > 0)
    est = est_raw if raw_branch else m * math.log(m / float(zero))
    return {
        "n_registers": m,
        "zero_registers": zero,
        "est_distinct": int(round(est)),
        "raw_branch": raw_branch,
    }


# ---------------------------------------------------------------------------
# Bloom filter — the membership third of the mergeable-sketch trio
# (HLL: how many distinct; CMS: how often; Bloom: have we SEEN it).
# The canonical crawl use is the frontier seen-set: 10^11 urls do not
# fit a hash set anywhere, but a Bloom filter answers "maybe seen /
# definitely new" in m bits with union = bitwise OR — partial filters
# built per partition/day combine without rescanning anything, and a
# false positive only means a url is needlessly skipped, never
# re-fetched work lost. Same portability contract as HLL/CMS: the bit
# positions come from the shared md5 bucket hash, so Spark, DuckDB and
# Python set bit-identical words and the registered query's oracle is
# an exact recompute, not a statistical bound.
#
# Representation: a sparse table (word_idx, bits) with 60 bits per
# word — the repo's signed-BIGINT-safe width convention (a 1 << 63
# mask is negative in two's complement; staying ≤ 1 << 59 keeps every
# word positive and engine-comparison trivial). Absent word = all
# zero. k hash functions are the depth-salted md5 family, exactly as
# CMS rows.

BLOOM_BITS_PER_WORD = 60


def _check_bloom(m_bits: int, k: int) -> None:
    if not (isinstance(m_bits, int) and 64 <= m_bits <= 1 << 32):
        raise ValueError(f"bloom m_bits must be an int in [64, 2^32], got {m_bits!r}")
    if not (isinstance(k, int) and 1 <= k <= 16):
        raise ValueError(f"bloom k must be an int in [1, 16], got {k!r}")


def _bloom_pos(hash_i_col, value_col, m_bits: int):
    """Bit position of hash i for a value: the shared md5 bucket hash
    mod m_bits (identical to the CMS row hash family)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(hash_i_col.cast("string"), F.lit("|"), F.col(value_col))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(m_bits),
    )


# a bit position splits into a 60-bit word index and an in-word mask;
# computed from a materialized `pos` column (shiftleft needs a SQL expr
# for a column shift amount)
_BLOOM_WORD = f"cast(pos div {BLOOM_BITS_PER_WORD} as bigint)"
_BLOOM_MASK = f"shiftleft(cast(1 as bigint), cast(pos % {BLOOM_BITS_PER_WORD} as int))"


def bloom_build(
    df: DataFrame,
    value_col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    group_cols: "Sequence[str]" = (),
) -> DataFrame:
    """Build a Bloom filter of the ``value_col`` stream: one row per
    non-empty (word_idx, bits). NULLs are skipped. One partially
    aggregable groupBy over a k-expanded stream (the expansion happens
    inside the scan stage; at most m_bits/60 rows ever shuffle, however
    large the input).

    With ``group_cols`` set, builds ONE INDEPENDENT filter per group
    (at most m_bits/60 rows each) — the per-file / per-partition
    skip-index shape: a point lookup probes every group's filter and
    reads only the groups that might contain the key."""
    _check_bloom(m_bits, k)
    gcols = list(group_cols)
    h = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("hash_i")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*gcols, F.col(value_col), h)
        .select(*gcols, _bloom_pos(F.col("hash_i"), value_col, m_bits).alias("pos"))
        .select(
            *gcols,
            F.expr(_BLOOM_WORD).alias("word_idx"),
            F.expr(_BLOOM_MASK).alias("mask"),
        )
        .groupBy(*gcols, "word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(bloom_df: DataFrame) -> DataFrame:
    """Union of filters = per-word bitwise OR. Feed the unioned row
    frames of any number of :func:`bloom_build` outputs (same
    m_bits/k)."""
    return bloom_df.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    bloom_df: DataFrame,
    probes: DataFrame,
    value_col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    group_cols: "Sequence[str]" = (),
) -> DataFrame:
    """Membership test for every probe value: present iff ALL k
    addressed bits are set (absent word = zero). Output:
    ``<value_col>`` (+ ``group_cols``), ``maybe_present`` (boolean —
    true can be a false positive, false is definitive). The probe side
    drives a k-way expansion and a join on word_idx; the filter side
    is at most m_bits/60 rows (per group), so Spark broadcasts it.

    With ``group_cols`` set, ``probes`` must already carry the group
    columns (one row per (value, group) to test — the caller builds
    the probe×group grid) and the verdict is per (value, group)."""
    _check_bloom(m_bits, k)
    gcols = list(group_cols)
    h = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("hash_i")
    addressed = (
        probes.select(*gcols, F.col(value_col), h)
        .select(*gcols, value_col,
                _bloom_pos(F.col("hash_i"), value_col, m_bits).alias("pos"))
        .select(*gcols, value_col,
                F.expr(_BLOOM_WORD).alias("word_idx"),
                F.expr(_BLOOM_MASK).alias("mask"))
    )
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).cast(
        "int"
    )
    return (
        addressed.join(bloom_df, [*gcols, "word_idx"], "left")
        .select(*gcols, value_col, hit.alias("hit"))
        .groupBy(value_col, *gcols)
        .agg((F.min("hit") == 1).alias("maybe_present"))
    )


def bloom_sql(
    stream_cte: str,
    value_expr: str,
    probes_cte: str,
    probe_expr: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    group_expr: "str | None" = None,
) -> str:
    """DuckDB rendering of build+contains: returns the chained CTE body
    ``bloom_h, bloom_w, bloom_e`` where ``bloom_e(v, maybe_present)``
    is the membership relation. Exact bit parity with the Spark path.

    With ``group_expr`` (a column present in BOTH ``stream_cte`` and
    ``probes_cte`` — the probe side is the caller-built value×group
    grid, mirroring :func:`bloom_contains`'s group_cols contract),
    one independent filter per group: ``bloom_e(v, grp,
    maybe_present)``."""
    _check_bloom(m_bits, k)
    pos = (
        "(('0x' || substr(md5(cast(h.hash_i as varchar) || '|' || {v}), 1, 8))"
        f"::BIGINT % {m_bits})"
    )
    word = f"({pos} // {BLOOM_BITS_PER_WORD})"
    mask = f"(1::BIGINT << ({pos} % {BLOOM_BITS_PER_WORD})::INT)"
    g_build = f"{group_expr} as grp," if group_expr else ""
    g_build_by = ", " + "grp" if group_expr else ""
    g_probe = f"p.{group_expr} as grp," if group_expr else ""
    g_join = f" and w.grp = p.{group_expr}" if group_expr else ""
    g_probe_by = f", p.{group_expr}" if group_expr else ""
    return f"""
      bloom_h as (select unnest(range({k})) as hash_i),
      bloom_w as (
        select {g_build} {word.format(v=value_expr)} as word_idx,
               bit_or({mask.format(v=value_expr)}) as bits
        from {stream_cte} cross join bloom_h h
        where {value_expr} is not null
        group by word_idx{g_build_by}
      ),
      bloom_e as (
        select p.{probe_expr} as v, {g_probe}
               min(case when coalesce(w.bits, 0) & {mask.format(v=f"p.{probe_expr}")}
                        <> 0 then 1 else 0 end) = 1 as maybe_present
        from {probes_cte} p
        cross join bloom_h h
        left join bloom_w w
          on w.word_idx = {word.format(v=f"p.{probe_expr}")}{g_join}
        group by p.{probe_expr}{g_probe_by}
      )
    """


def bloom_build_py(
    values: Iterable[str], *, m_bits: int = 1 << 20, k: int = 5
) -> dict[int, int]:
    _check_bloom(m_bits, k)
    words: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        for i in range(k):
            pos = int(hashlib.md5(f"{i}|{v}".encode()).hexdigest()[:8], 16) % m_bits
            w, b = divmod(pos, BLOOM_BITS_PER_WORD)
            words[w] = words.get(w, 0) | (1 << b)
    return words


def bloom_contains_py(
    words: dict[int, int], value: str, *, m_bits: int = 1 << 20, k: int = 5
) -> bool:
    _check_bloom(m_bits, k)
    for i in range(k):
        pos = int(hashlib.md5(f"{i}|{value}".encode()).hexdigest()[:8], 16) % m_bits
        w, b = divmod(pos, BLOOM_BITS_PER_WORD)
        if not words.get(w, 0) & (1 << b):
            return False
    return True


# --- Logarithmic histogram (HdrHistogram-style quantile sketch) -------
#
# The fourth mergeable sketch: QUANTILES. Exact percentiles over 100 TB
# need a full sort (or a per-key value shuffle — `value_percentiles`'s
# shape, correct but O(rows) state per key); the log histogram shuffles
# at most a few hundred (key, bucket) counter rows per key, combines
# map-side, and histograms from different days/partitions union by
# counter SUM, so latency-style rollups (hour → day → month p99) never
# rescan raw data. Same portability contract as HLL/CMS/Bloom — but
# stronger: there is NO hash and NO floating point anywhere. The bucket
# index is pure integer bit arithmetic (HdrHistogram's bucketing:
# value's octave from the binary bit length + the top `sub_bits`
# mantissa bits), the quantile rank is ceil(n·pct/100) in exact integer
# form, and the estimate is the bucket's exact integer lower bound — so
# Spark, DuckDB and Python agree bit for bit and the registered query's
# oracle recomputes the sketch with zero tolerance.
#
# Accuracy contract: values in [0, 2^sub_bits+1) are EXACT (one bucket
# per integer); above that, a bucket spanning [lo, lo + 2^(k-sub_bits))
# with lo ≥ 2^k gives relative error < 2^-sub_bits (12.5% at the
# default sub_bits=3; use 6 for ~1.6%). Buckets per key ≤
# (63 - sub_bits + 1) · 2^sub_bits + 2^sub_bits  (~490 at sub_bits=3)
# regardless of input size.

LOGHIST_DEFAULT_SUB_BITS = 3


def _check_loghist(sub_bits: int, percents: Sequence[int] = ()) -> None:
    if not (isinstance(sub_bits, int) and 1 <= sub_bits <= 8):
        raise ValueError(f"loghist sub_bits must be an int in [1, 8], got {sub_bits!r}")
    for p in percents:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError(f"loghist percents must be ints in [1, 100], got {p!r}")


def _loghist_bucket_sql(v: str, sub_bits: int, *, duck: bool) -> str:
    """Bucket index for non-negative integer ``v`` — the same string
    renders in Spark SQL and DuckDB (only the bigint cast spelling and
    shift operator differ). k = max(sub_bits, bit_length(v) - 1);
    bucket = (k - sub_bits)·2^sub_bits + (v >> (k - sub_bits))."""
    s = sub_bits
    big = "::BIGINT" if duck else ""
    k = f"greatest(cast({s} as bigint), cast(length(bin({v})) - 1 as bigint))"
    shifted = (
        f"(({v}){big} >> (({k}) - {s})::INT)"
        if duck
        else f"shiftright({v}, cast(({k}) - {s} as int))"
    )
    return f"(({k}) - {s}) * {1 << s} + {shifted}"


def _loghist_lo_sql(b: str, sub_bits: int, *, duck: bool) -> str:
    """Exact integer lower bound of bucket ``b`` (the quantile
    representative): m = b div 2^sub_bits; m = 0 → b itself (the exact
    region), else (b - (m-1)·2^sub_bits) << (m-1)."""
    s = sub_bits
    m = f"(({b}) // {1 << s})" if duck else f"(({b}) div {1 << s})"
    w = f"(({b}) - (({m}) - 1) * {1 << s})"
    shl = (
        f"({w} << (({m}) - 1)::INT)"
        if duck
        else f"shiftleft({w}, cast(({m}) - 1 as int))"
    )
    return f"case when {m} = 0 then ({b}) else {shl} end"


def loghist_build(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    *,
    sub_bits: int = LOGHIST_DEFAULT_SUB_BITS,
) -> DataFrame:
    """Build per-key log-histograms of a non-negative integer column:
    one row per non-empty (key..., bucket) with its count. NULLs are
    skipped; a negative value raises (assert_true) rather than aliasing
    into a wrong bucket. One partially aggregable groupBy — the counter
    sum combines map-side inside the scan stage."""
    _check_loghist(sub_bits)
    bucket = F.expr(_loghist_bucket_sql("__lh_v", sub_bits, duck=False))
    guarded = F.when(
        F.expr("assert_true(__lh_v >= 0, 'loghist: negative value')").isNull(), bucket
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*key_cols, F.col(value_col).cast("bigint").alias("__lh_v"))
        .select(*key_cols, guarded.alias("bucket"))
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def loghist_merge(hist_df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Union of histograms = per-bucket counter SUM. Feed the unioned
    row frames of any number of :func:`loghist_build` outputs (same
    sub_bits)."""
    return hist_df.groupBy(*key_cols, "bucket").agg(F.sum("cnt").alias("cnt"))


def loghist_quantiles(
    hist_df: DataFrame,
    key_cols: Sequence[str],
    *,
    percents: Sequence[int] = (50, 95, 99),
    sub_bits: int = LOGHIST_DEFAULT_SUB_BITS,
) -> DataFrame:
    """Finish per-key quantile estimates from a histogram: for each
    integer percent pct, the exact lower bound of the first bucket whose
    cumulative count reaches rank = ceil(n·pct/100). Output: key...,
    ``n``, one ``p<pct>`` bigint column per percent. All-integer: the
    rank uses the exact form (n·pct + 99) div 100, so engines agree bit
    for bit. One window pass + one groupBy over ≤ a few hundred rows
    per key."""
    from pyspark.sql import Window

    _check_loghist(sub_bits, percents)
    w = Window.partitionBy(*key_cols).orderBy("bucket")
    lo = _loghist_lo_sql("bucket", sub_bits, duck=False)
    cum = hist_df.select(
        *key_cols,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*key_cols)).alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for pct in percents:
        rank = f"(n * {pct} + 99) div 100"
        aggs.append(
            F.min(F.expr(f"case when cum >= {rank} then {lo} end")).alias(f"p{pct}")
        )
    return cum.groupBy(*key_cols).agg(*aggs)


def loghist_sql(
    stream_cte: str,
    key_expr: str,
    value_expr: str,
    *,
    percents: Sequence[int] = (50, 95, 99),
    sub_bits: int = LOGHIST_DEFAULT_SUB_BITS,
    group_alias: str = "key",
) -> str:
    """DuckDB rendering of build+quantiles: returns chained CTE body
    ``lh_hist, lh_cum, lh_q`` where ``lh_q(<group_alias>, n, p<pct>...)``
    matches :func:`loghist_quantiles` bit for bit."""
    _check_loghist(sub_bits, percents)
    bucket = _loghist_bucket_sql(f"({value_expr})::BIGINT", sub_bits, duck=True)
    lo = _loghist_lo_sql("bucket", sub_bits, duck=True)
    cols = []
    for pct in percents:
        rank = f"(n * {pct} + 99) // 100"
        cols.append(
            f"min(case when cum >= {rank} then {lo} end) as p{pct}"
        )
    return f"""
      lh_hist as (
        select {key_expr} as {group_alias}, {bucket} as bucket,
               count(*) as cnt
        from {stream_cte}
        where {value_expr} is not null
        group by 1, 2
      ),
      lh_cum as (
        select {group_alias}, bucket,
               sum(cnt) over (partition by {group_alias} order by bucket) as cum,
               sum(cnt) over (partition by {group_alias}) as n
        from lh_hist
      ),
      lh_q as (
        select {group_alias}, max(n)::BIGINT as n, {', '.join(cols)}
        from lh_cum group by 1
      )
    """


def loghist_bucket_py(v: int, sub_bits: int = LOGHIST_DEFAULT_SUB_BITS) -> int:
    if v < 0:
        raise ValueError("loghist: negative value")
    k = max(sub_bits, v.bit_length() - 1)
    return (k - sub_bits) * (1 << sub_bits) + (v >> (k - sub_bits))


def loghist_lo_py(bucket: int, sub_bits: int = LOGHIST_DEFAULT_SUB_BITS) -> int:
    m = bucket >> sub_bits
    if m == 0:
        return bucket
    return (bucket - (m - 1) * (1 << sub_bits)) << (m - 1)


def loghist_quantiles_py(
    values: Iterable[int],
    *,
    percents: Sequence[int] = (50, 95, 99),
    sub_bits: int = LOGHIST_DEFAULT_SUB_BITS,
) -> dict:
    _check_loghist(sub_bits, percents)
    hist: dict[int, int] = {}
    n = 0
    for v in values:
        if v is None:
            continue
        hist[loghist_bucket_py(v, sub_bits)] = (
            hist.get(loghist_bucket_py(v, sub_bits), 0) + 1
        )
        n += 1
    out = {"n": n}
    cum = 0
    remaining = sorted(percents)
    for b in sorted(hist):
        cum += hist[b]
        while remaining and cum >= (n * remaining[0] + 99) // 100:
            out[f"p{remaining.pop(0)}"] = loghist_lo_py(b, sub_bits)
    for pct in remaining:
        out[f"p{pct}"] = None
    return out


# --- Misra-Gries heavy hitters (two-pass exact) ------------------------
#
# The frequency-threshold shape: "every value occurring in ≥ phi of the
# corpus", EXACTLY, without ever shuffling the full distinct-value set
# (ngram_topk's partial-agg + TakeOrdered shape is right for top-k but
# still shuffles one row per distinct value — at 10^11 distinct n-grams
# that is the bottleneck stage). Two passes:
#
#   1. A Misra-Gries summary per input partition (Arrow-batched
#      mapInPandas; counter dict capacity `cap`, batched decrement =
#      subtract the (cap+1)-th largest counter — the Agarwal et al.
#      2013 mergeable-summaries form, guaranteeing
#      weight(v) ≥ count_p(v) − N_p/(cap+1) per partition and therefore
#      Σ_p weight(v) ≥ count(v) − N/(cap+1) after the merge). NO
#      shuffle: per-partition state is ≤ cap counters however large
#      the partition.
#   2. The merged summaries (≤ cap·partitions tiny rows) are cut with
#      the exact-integer soundness bound (any true heavy hitter
#      survives), and the candidate set — ≈cap values — is recounted
#      EXACTLY with an ordinary partially-aggregable groupBy behind a
#      broadcast semi-join. Output = exact counts ≥ threshold, so the
#      registered query's oracle is plain SQL (group by + having), no
#      sketch recompute needed.
#
# phi is an exact rational (phi_num/phi_den) and the threshold is
# ceil(N·phi) in integer form, so there is no float anywhere in the
# correctness path. The input is scanned twice (the standard two-pass
# trade: bounded memory + exact answers for two sequential reads).

def _check_mg(phi_num: int, phi_den: int, cap: int) -> None:
    if not (isinstance(phi_num, int) and isinstance(phi_den, int)
            and 1 <= phi_num <= phi_den):
        raise ValueError(
            f"phi must be a rational 0 < phi_num/phi_den <= 1, got {phi_num}/{phi_den}"
        )
    if not (isinstance(cap, int) and cap >= 1):
        raise ValueError(f"mg cap must be an int >= 1, got {cap!r}")


def _mg_partition(cap: int):
    import pandas as pd

    def fn(batches):
        counters: dict = {}
        processed = 0
        for pdf in batches:
            vc = pdf.iloc[:, 0].value_counts()
            processed += int(vc.sum())
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                # batched MG decrement: subtract the (cap+1)-th largest
                # weight from every counter, drop the non-positive ones
                # (ties with the pivot die too, so size <= cap after)
                d = sorted(counters.values(), reverse=True)[cap]
                counters = {v: c - d for v, c in counters.items() if c > d}
        rows = [(v, int(c), 0) for v, c in counters.items()]
        rows.append((None, 0, processed))
        yield pd.DataFrame(rows, columns=["value", "weight", "processed"])

    return fn


def heavy_hitters_exact(
    df: DataFrame,
    value_col: str,
    *,
    phi_num: int = 1,
    phi_den: int = 100,
    cap: int | None = None,
) -> DataFrame:
    """All values of string column ``value_col`` with exact count ≥
    ceil(N·phi_num/phi_den), with their exact counts (``value_col``,
    ``cnt``). NULLs are skipped. ``cap`` defaults to ceil(2·phi⁻¹),
    which makes the per-partition error N_p/(cap+1) < phi·N_p/2 — small
    enough that no true heavy hitter can be cut before the exact
    recount."""
    if cap is None:
        cap = -(-2 * phi_den // phi_num)
    _check_mg(phi_num, phi_den, cap)
    src = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("value")
    )
    summaries = src.mapInPandas(
        _mg_partition(cap), "value string, weight long, processed long"
    )
    merged = (
        summaries.groupBy("value")
        .agg(F.sum("weight").alias("w"), F.sum("processed").alias("p"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_total = merged.agg(F.sum("p")).collect()[0][0] or 0
    threshold = (n_total * phi_num + phi_den - 1) // phi_den
    # soundness cut in exact integers: keep v unless even the most
    # optimistic true count (w + N/(cap+1)) is below threshold
    candidates = merged.where(F.col("value").isNotNull()).where(
        F.col("w") * (cap + 1) >= threshold * (cap + 1) - n_total
    ).select("value")
    out = (
        src.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= threshold)
        .select(F.col("value").alias(value_col), "cnt")
    )
    merged.unpersist()
    return out


def mg_summary_py(values: Iterable[str], cap: int) -> tuple[dict, int]:
    """Driver-side reference of one partition's summary (same batched
    decrement), for differential tests."""
    _check_mg(1, 1, cap)
    counters: dict = {}
    n = 0
    for v in values:
        if v is None:
            continue
        n += 1
        counters[v] = counters.get(v, 0) + 1
        if len(counters) > cap:
            d = sorted(counters.values(), reverse=True)[cap]
            counters = {k: c - d for k, c in counters.items() if c > d}
    return counters, n
