"""Robust statistics for pipeline operations: median/MAD outlier
flagging and shuffle-key skew auditing.

Why these two together: both answer the operational questions a
100 TB pipeline owner asks BEFORE trusting a run — "which latencies
are anomalous?" (alerting must not let one straggler host drag a mean,
so median/MAD, the breakdown-point-0.5 estimators, not mean/stddev)
and "which key can I safely shuffle on?" (a skewed key turns one
reducer into the job's critical path; measure concentration BEFORE
picking the partitioning, not after the 4-hour stage straggles).

Exactness contract (repo-wide convention): inputs are integer-staged
(``value_e2`` cents, epoch micros, …). Medians are LOWER medians —
``min(v : 2·cdf(v) ≥ n)`` — a pure integer law with no even-count
averaging, so Spark and DuckDB agree bit-for-bit; the outlier flag
``|x − med| > k·MAD`` is an all-integer comparison. The Gini
coefficient's numerator ``2·Σ(rank·cnt) − (m+1)·T`` is exact bigint;
the ONE double division is correctly rounded and e6-quantized once
(HALF_UP), so the audit row is a zero-tolerance cross-engine contract.

Scale shape (the reason these are not one-liner aggs): the median is
computed by histogram-CDF — per-(group, value) counts (partially
aggregable map-side: a million identical boilerplate latencies
pre-reduce before the shuffle) then a window over each group's
DISTINCT values only, bounded by value cardinality, never corpus rows
(the ppl_buckets law from operators/lm.py, reused for rank-(n+1)//2
instead of terciles). The skew audit windows over the per-key COUNT
frame — m rows for m distinct keys — which is exactly the frame whose
skew is being measured, so by construction it fits wherever the
planned shuffle would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_lower_median(
    df: DataFrame, group_col: str, val_col: str, *, alias: str = "med"
) -> DataFrame:
    """Per-group LOWER median of an integer column by histogram-CDF:
    ``min(v : 2·cdf(v) ≥ n)`` — rank ``(n+1)//2`` without a corpus
    sort (window over distinct values per group only). Returns the
    small ``(group_col, alias)`` frame; callers join it back (AQE
    broadcasts it — one row per group)."""
    hist = df.groupBy(group_col, val_col).agg(F.count(F.lit(1)).alias("_hc"))
    cum = Window.partitionBy(group_col).orderBy(val_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(group_col)
    return (
        hist.select(
            group_col,
            val_col,
            F.sum("_hc").over(cum).alias("_cum"),
            F.sum("_hc").over(tot).alias("_n"),
        )
        .where(F.col("_cum") * 2 >= F.col("_n"))
        .groupBy(group_col)
        .agg(F.min(val_col).alias(alias))
    )


def _lower_median_sql(rel: str, g: str, v: str, alias: str) -> str:
    return f"""
        select {g}, min({v}) as {alias} from (
          select {g}, {v},
                 sum(hc) over (partition by {g} order by {v}
                               rows between unbounded preceding
                               and current row) as cum,
                 sum(hc) over (partition by {g}) as n
          from (select {g}, {v}, count(*) as hc from {rel} group by 1, 2)
        ) where cum * 2 >= n group by 1
    """


def mad_outliers(
    df: DataFrame, group_col: str, val_col: str, *, k: int = 3
) -> DataFrame:
    """Median/MAD outlier flags per group: a row is an outlier iff
    ``|x − med| > k · MAD`` where ``med`` is the group's lower median
    and ``MAD`` the lower median of ``|x − med|`` — the classic
    robust-z rule with breakdown point 0.5 (one straggler host cannot
    move the threshold the way it moves a mean/stddev fence). All
    integer: the flag needs no division at all, so it is bit-decidable
    cross-engine. When MAD = 0 (more than half the group identical —
    a heartbeat emitting a constant latency) ANY deviation is flagged;
    that is the correct alerting semantics for a constant signal and
    is documented behavior, not an edge case.

    Two histogram-CDF median passes + two small broadcast joins back;
    the corpus is never sorted. The deviation frame feeds BOTH the MAD
    histogram and the final output, so it is persisted MEMORY_AND_DISK
    (the repo's shared-subtree rule — without it Catalyst re-scans the
    corpus and rebuilds the median join per consumer); the result is
    lazy, so there is no safe unpersist point here. Output: the input
    columns plus ``med``, ``mad``, ``is_outlier``."""
    from pyspark import StorageLevel

    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    med = group_lower_median(df, group_col, val_col, alias="med")
    with_med = df.join(med, group_col)
    dev = with_med.withColumn(
        "_absdev", F.abs(F.col(val_col) - F.col("med"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    mad = group_lower_median(dev, group_col, "_absdev", alias="mad")
    return (
        dev.join(mad, group_col)
        .withColumn(
            "is_outlier", F.col("_absdev") > F.lit(k) * F.col("mad")
        )
        .drop("_absdev")
    )


def mad_outliers_sql(
    *, rel: str, group_col: str, val_col: str, cols: str, k: int = 3
) -> str:
    """DuckDB recompute of :func:`mad_outliers` (same lower-median
    histogram-CDF law, same integer flag), generated here so the two
    spellings cannot drift. ``cols`` is the projected input column
    list (qualified with ``r.``)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    med = _lower_median_sql(rel, group_col, val_col, "med")
    dev = (
        f"select r.*, m.med, abs(r.{val_col} - m.med) as _absdev"
        f" from {rel} r join ({med}) m using ({group_col})"
    )
    mad = _lower_median_sql("_mo_dev", group_col, "_absdev", "mad")
    return f"""
        with _mo_dev as ({dev}),
        _mo_mad as ({mad})
        select {cols}, r.med, d.mad, (r._absdev > {k} * d.mad) as is_outlier
        from _mo_dev r join _mo_mad d using ({group_col})
    """


def key_skew_audit(
    df: DataFrame, candidates: dict[str, Column]
) -> DataFrame:
    """Shuffle-key skew audit: for each named candidate partitioning
    key, the concentration statistics that predict reducer imbalance —
    ``n_keys`` (parallelism ceiling), ``top1_cnt``/``top1_share_e6``
    (the single hottest reducer's share: the straggler bound, since
    one key can never split across reducers without salting), and the
    exact-integer Gini coefficient ``gini_e6`` of the key-count
    distribution (0 = perfectly even, → 1 = all rows on one key).

    Gini over counts x₁ ≤ … ≤ x_m:  G = (2·Σ i·xᵢ − (m+1)·T) / (m·T).
    The rank-weighted sum is order-deterministic despite count ties —
    a tie block contributes x·(sum of its fixed rank range) whatever
    the within-block order — so the bigint numerator is exact and the
    one division is e6-quantized once (HALF_UP, cross-engine
    bit-identical).

    One partial-agg count per candidate plus a window over the per-key
    count frame (m rows); candidates evaluated independently and
    unioned — each is a tiny independent job, no cross-candidate
    shuffle. Read the output BEFORE picking a join/groupBy key: a
    candidate with top1_share ≥ 1/parallelism is a straggler in
    waiting (salt it or pick another key). An EMPTY input still emits
    one row per candidate, with n_keys = 0 and the remaining stats
    NULL (a global agg over zero rows) — callers auditing a frame that
    might be empty should gate on n_keys."""
    if not candidates:
        raise ValueError("key_skew_audit needs at least one candidate")
    outs = []
    for name, expr in candidates.items():
        cnt = df.select(expr.alias("_k")).groupBy("_k").agg(
            F.count(F.lit(1)).alias("_c")
        )
        w = Window.orderBy("_c", "_k")
        ranked = cnt.select(
            F.col("_c"), F.row_number().over(w).cast("bigint").alias("_i")
        )
        outs.append(
            ranked.agg(
                F.lit(name).alias("candidate"),
                F.sum("_c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("_c").alias("top1_cnt"),
                F.round(
                    F.lit(1_000_000.0) * F.max("_c").cast("double")
                    / F.sum("_c").cast("double")
                ).cast("bigint").alias("top1_share_e6"),
                F.round(
                    F.lit(1_000_000.0)
                    * (
                        F.lit(2) * F.sum(F.col("_i") * F.col("_c"))
                        - (F.count(F.lit(1)) + F.lit(1)) * F.sum("_c")
                    ).cast("double")
                    / (F.count(F.lit(1)) * F.sum("_c")).cast("double")
                ).cast("bigint").alias("gini_e6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def key_skew_audit_sql(*, rel: str, candidates: dict[str, str]) -> str:
    """DuckDB recompute of :func:`key_skew_audit` — same per-candidate
    count → rank → closed-form Gini, generated here so the two
    spellings cannot drift. ``candidates`` maps name → SQL key expr."""
    if not candidates:
        raise ValueError("key_skew_audit needs at least one candidate")
    parts = []
    for name, expr in candidates.items():
        parts.append(f"""
        select '{name}' as candidate,
               sum(_c)::BIGINT as n_rows,
               count(*)::BIGINT as n_keys,
               max(_c)::BIGINT as top1_cnt,
               cast(round(1000000.0 * cast(max(_c) as double)
                    / cast(sum(_c) as double)) as bigint) as top1_share_e6,
               cast(round(1000000.0
                    * cast(2 * sum(_i * _c) - (count(*) + 1) * sum(_c)
                           as double)
                    / cast(count(*) * sum(_c) as double)) as bigint)
                 as gini_e6
        from (
          select _c, row_number() over (order by _c, _k)::BIGINT as _i
          from (select {expr} as _k, count(*)::BIGINT as _c
                from {rel} group by 1)
        )""")
    return " union all ".join(parts)


# --- per-group quantile normalization (rank transform) -------------------

def quantile_normalize(
    df: DataFrame, group_col: str, score_col: str, *,
    out_col: str = "pct_e6",
) -> DataFrame:
    """Per-group percentile-rank transform of an integer score:
    ``pct_e6 = round(1e6 · cum_below / (n − 1))`` where ``cum_below``
    counts the group's rows STRICTLY below the row's score — the
    standard way to make a quality signal comparable ACROSS groups
    (CCNet compares documents by per-language perplexity percentile,
    never raw perplexity, because each language's LM has its own score
    scale; same for fusing entropy/readability/LM signals into one
    ranking). The group minimum maps to 0, a unique maximum to
    exactly 1e6, ties share one value (their common cum_below), and a
    single-row group maps to 0 (the n−1 denominator is guarded to 1).

    Same histogram-CDF shape as ppl_buckets (operators/lm.py): one
    partially-aggregable (group, score) count, a window over each
    group's DISTINCT scores only — bounded by score cardinality, never
    corpus rows — and one (group, score) equi-join back. The one
    division is correctly rounded on non-negative operands and
    e6-quantized once, so the transform is a zero-tolerance
    cross-engine contract. Output: the input columns plus
    ``out_col``."""
    hist = df.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("_hc")
    )
    cum = Window.partitionBy(group_col).orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(group_col)
    pct = hist.select(
        group_col,
        score_col,
        F.round(
            F.lit(1_000_000.0)
            * (F.sum("_hc").over(cum) - F.col("_hc")).cast("double")
            / F.greatest(F.sum("_hc").over(tot) - F.lit(1), F.lit(1))
            .cast("double")
        ).cast("bigint").alias(out_col),
    )
    return df.join(pct, [group_col, score_col])


def quantile_normalize_sql(
    *, rel: str, group_col: str, score_col: str, cols: str,
    out_col: str = "pct_e6",
) -> str:
    """DuckDB recompute of :func:`quantile_normalize` (same histogram
    law, same strictly-below numerator and guarded n−1 denominator),
    generated here so the two spellings cannot drift."""
    return f"""
        with _qn_hist as (
          select {group_col} as g, {score_col} as s, count(*) as hc
          from {rel} group by 1, 2
        ),
        _qn_pct as (
          select g, s,
                 cast(round(1000000.0
                   * cast(sum(hc) over (partition by g order by s
                       rows between unbounded preceding and current row)
                       - hc as double)
                   / cast(greatest(sum(hc) over (partition by g) - 1, 1)
                       as double)) as bigint) as {out_col}
          from _qn_hist
        )
        select {cols}, p.{out_col}
        from {rel} r
        join _qn_pct p on p.g = r.{group_col} and p.s = r.{score_col}
    """


# --- trimmed mean ------------------------------------------------------------


def trimmed_mean(
    df: DataFrame, group_col: str, val_col: str, *, trim_permille: int = 100
) -> DataFrame:
    """Per-group symmetric trimmed mean of an integer column — the
    robust location between the mean (breakdown 0) and the median
    (breakdown 0.5, but throws away all magnitude): drop the
    ``k = n·trim_permille DIV 1000`` smallest AND largest values by
    rank, average the rest. The host-quality aggregate that a single
    spam blob or a single empty page cannot move, while real mass
    shifts still register.

    Exact integer law by histogram-CDF clipping — never a per-row
    rank: each distinct value v with count c occupies ranks
    ``[cum−c+1, cum]``; its kept multiplicity is the overlap with
    ``[k+1, n−k]``, so ``trimmed_sum = Σ v·clip`` and
    ``mean_e6 = trimmed_sum·10⁶ / (n−2k)`` with the SIGN PEELED
    before the division (Spark ``div`` truncates, DuckDB ``//``
    floors — they agree only on non-negatives; values may be
    negative). A group left empty by the trim (n ≤ 2k) emits NULL.

    Scale shape: one (group, value) partial-agg histogram; two
    partition-parallel windows over DISTINCT values per group (cum +
    total); one final per-group rollup. Output:
    (group, n, n_kept, mean_e6)."""
    if not 0 <= trim_permille <= 499:
        raise ValueError(
            f"trim_permille must be in [0, 499], got {trim_permille}"
        )
    hist = df.groupBy(
        F.col(group_col).alias("g"), F.col(val_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    cum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("g")
    clipped = (
        hist.select(
            "g", "v", "c",
            F.sum("c").over(cum).alias("cum"),
            F.sum("c").over(tot).alias("n"),
        )
        .withColumn("k", F.expr(f"n * {trim_permille} div 1000"))
        .withColumn(
            "clip",
            F.greatest(
                F.lit(0).cast("bigint"),
                F.least(F.col("cum"), F.col("n") - F.col("k"))
                - F.greatest(
                    F.col("cum") - F.col("c") + 1, F.col("k") + 1
                )
                + 1,
            ),
        )
    )
    agg = clipped.groupBy("g", "n", "k").agg(
        F.sum(F.col("v") * F.col("clip")).alias("ts"),
        F.sum("clip").alias("n_kept"),
    )
    mean = F.when(F.col("n_kept") == 0, F.lit(None).cast("bigint")).otherwise(
        F.when(F.col("ts") >= 0, F.expr("ts * 1000000 div n_kept"))
        .otherwise(-F.expr("(-ts) * 1000000 div n_kept"))
        .cast("bigint")
    )
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n"),
        F.col("n_kept"),
        mean.alias("mean_e6"),
    )


def trimmed_mean_sql(
    *, rel: str, group_col: str, val_col: str, trim_permille: int = 100
) -> str:
    """DuckDB recompute of :func:`trimmed_mean` — same histogram-CDF
    clip, same sign-peeled division, generated here so the two
    spellings cannot drift."""
    if not 0 <= trim_permille <= 499:
        raise ValueError(
            f"trim_permille must be in [0, 499], got {trim_permille}"
        )
    return f"""
        with _tm_h as (
          select {group_col} as g, {val_col} as v, count(*)::BIGINT as c
          from {rel} group by 1, 2
        ),
        _tm_c as (
          select g, v, c,
                 sum(c) over (partition by g order by v
                   rows between unbounded preceding and current row
                 )::BIGINT as cum,
                 sum(c) over (partition by g)::BIGINT as n
          from _tm_h
        ),
        _tm_k as (
          select g, v, c, cum, n, (n * {trim_permille} // 1000) as k
          from _tm_c
        ),
        _tm_clip as (
          select g, n, k,
                 greatest(0, least(cum, n - k)
                             - greatest(cum - c + 1, k + 1) + 1) as clip,
                 v
          from _tm_k
        ),
        _tm_agg as (
          select g, n, k, sum(v * clip)::BIGINT as ts,
                 sum(clip)::BIGINT as n_kept
          from _tm_clip group by 1, 2, 3
        )
        select g as {group_col}, n, n_kept,
               case when n_kept = 0 then NULL
                    when ts >= 0 then ts * 1000000 // n_kept
                    else -((-ts) * 1000000 // n_kept)
               end::BIGINT as mean_e6
        from _tm_agg
    """


# --- weighted lower median ---------------------------------------------------


def weighted_lower_median(
    df: DataFrame, group_col: str, val_col: str, weight_col: str,
    *, alias: str = "wmed"
) -> DataFrame:
    """Per-group weight-lower median of an integer column: the
    smallest value v with ``2·cumweight(v) ≥ total_weight`` — the
    size-weighted location a curator wants when documents are not
    equal ("the median BYTE lives in a doc of this length", not "the
    median doc has this length"; on a heavy-tailed corpus the two
    differ wildly). Degrades exactly to :func:`group_lower_median`
    under unit weights (tested). Weights must be non-negative
    bigints; zero-weight rows carry no mass (a group with only
    zero-weight rows emits no row — it has no weighted median, and
    the absence is the honest answer). Same histogram-CDF law as the
    whole robust family: one (group, value) weight-sum partial agg,
    two partition-parallel windows over distinct values, never a
    per-row rank."""
    w = F.col(weight_col).cast("bigint")
    guarded = F.when(
        F.assert_true(
            w >= 0, F.lit("weighted_lower_median requires weights >= 0")
        ).isNull(),
        w,
    )
    hist = df.groupBy(
        F.col(group_col).alias("g"), F.col(val_col).alias("v")
    ).agg(F.sum(guarded).alias("wc"))
    cum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("g")
    return (
        hist.select(
            "g", "v",
            F.sum("wc").over(cum).alias("cw"),
            F.sum("wc").over(tot).alias("tw"),
        )
        .where((F.col("tw") > 0) & (F.col("cw") * 2 >= F.col("tw")))
        .groupBy(F.col("g").alias(group_col))
        .agg(F.min("v").alias(alias))
    )


def weighted_lower_median_sql(
    *, rel: str, group_col: str, val_col: str, weight_col: str,
    alias: str = "wmed"
) -> str:
    """DuckDB recompute of :func:`weighted_lower_median` — same
    histogram law, generated here so the two spellings cannot
    drift."""
    return f"""
        select {group_col}, min(v) as {alias} from (
          select {group_col} as {group_col}, v,
                 sum(wc) over (partition by {group_col} order by v
                   rows between unbounded preceding and current row
                 ) as cw,
                 sum(wc) over (partition by {group_col}) as tw
          from (
            select {group_col}, {val_col} as v,
                   sum(cast({weight_col} as bigint))::BIGINT as wc
            from {rel} group by 1, 2
          )
        ) where tw > 0 and cw * 2 >= tw
        group by 1
    """
