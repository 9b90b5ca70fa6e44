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
    # r6 (guide §1.2 step 1): mixing the multi-column DISTINCT
    # aggregates with min/max in ONE agg made Spark rewrite every plain
    # aggregate as an order-sensitive first(...) over the Expand, which
    # demotes the whole pass to SortAggregate — two full sorts of the
    # n_cols+1 × expanded stream. Split: the plain aggregates keep the
    # codegen HashAggregate over one un-expanded scan; the distinct
    # counts keep the Expand but with count-only (fixed-width) buffers,
    # also HashAggregate. The two one-row frames recombine with a
    # scalar cross join (the repo's idiomatic single-row attach).
    # Measured 2.0 → 1.0 s at sf0.1; identical output rows.
    plain = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            a
            for c in cols
            for a in (
                F.count(F.col(c)).alias(f"__nn_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            )
        ],
    )
    dist = df.agg(*[F.countDistinct(F.col(c)).alias(f"__nd_{c}") for c in cols])
    one = plain.crossJoin(dist)
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


# round(1e6 * ln 2) — the micro-nat absent-token term of the JSD split.
LN2_E6 = 693147

# bigint headroom for the quantized JSD term sums: with total corpus
# tokens B <= 1e11, each |term| <= b * (1e6 * ln(a*B + b*A)) < b * 5.2e7
# and the per-source sum stays under B * 5.2e7 = 5.2e18 < 2^63. Beyond
# that, shard per source or rescale counts before calling.
_JSD_B_MAX = 100_000_000_000


def mixture_jsd(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence between each source's token
    unigram distribution and the WHOLE-corpus mixture, in integer
    micro-nats — the data-mixture drift audit a training pipeline runs
    on every new crawl drop (a source whose JSD jumps between snapshots
    changed character: spam flood, template rollout, language shift;
    0 = indistinguishable from the corpus, ln 2 ≈ 0.693 = disjoint
    support). Same family of corpus-vs-corpus divergence audits as the
    DSIR importance weights (operators/dsir.py score per DOCUMENT for
    selection; this scores per SOURCE for monitoring).

    Exactness (the lm.py ln convention): with a = per-(source, token)
    count, A = source total, b = corpus token count, B = corpus total,
    the two KL halves are rewritten so every ln argument is >= 1:

        p-side term  a * (LN2_E6 - round(1e6 * ln((aB + bA) / aB)))
        q-side term  b * (LN2_E6 - round(1e6 * ln((aB + bA) / bA)))

    For a token ABSENT from the source (a = 0) the p-side term
    vanishes and the q-side ln is ln 1 = 0, so the term degrades to
    exactly b * LN2_E6 — which means the whole absent-token mass has
    the closed form LN2_E6 * (B - Σ_present b) and the computation
    never materializes a sources × vocabulary grid: only tokens the
    source actually CONTAINS are joined. Each present-token term
    quantizes BEFORE the per-source sum, so ``jsd_p_num``/``jsd_q_num``
    are order-free exact bigints and the oracle hash has zero
    tolerance; ``jsd_e6`` = floor(num_p / 2A + num_q / 2B) is derived
    from them with one identically-spelled double expression per
    engine. The products feeding ln are computed in double (a and b
    stay < 2^53 long before B hits the bigint guard).

    Scale shape: one tokenize/explode feeds a partially-aggregable
    (source, token) count; corpus token counts are one more partial agg
    of THAT frame (the raw stream is never re-scanned); one token-keyed
    equi-join attaches corpus counts to the per-source counts (rows =
    Σ per-source vocabularies, the same cardinality the count frame
    already has — no grid blowup); the tiny per-source and corpus
    totals broadcast; one final partial-aggregable rollup per source
    plus the closed-form absent-mass correction. No UDF, no driver
    loop; bigint headroom is a loud woven assert_true (B <= 1e11), not
    a silent overflow wrap.

    Output: ``(source, n_tokens, vocab, jsd_p_num, jsd_q_num, jsd_e6)``
    — one row per source; a source whose every doc is NULL/empty text
    emits no row (it has no token distribution to diverge)."""
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("_tok"),
    )
    cnt = toks.groupBy("_g", "_tok").agg(F.count(F.lit(1)).alias("_a"))
    src_tot = cnt.groupBy("_g").agg(
        F.sum("_a").alias("_st"), F.count(F.lit(1)).alias("_vocab")
    )
    corpus = cnt.groupBy("_tok").agg(F.sum("_a").alias("_b"))
    tot = corpus.agg(F.sum("_b").alias("_ct"))
    present = (
        cnt.join(corpus, "_tok")
        .join(F.broadcast(src_tot), "_g")
        .crossJoin(F.broadcast(tot))
    )
    ad = F.col("_a").cast("double")
    bd = F.col("_b").cast("double")
    mix = ad * F.col("_ct") + bd * F.col("_st")
    q_q = F.round(F.log(mix / (bd * F.col("_st"))) * 1_000_000).cast("bigint")
    q_p = F.round(F.log(mix / (ad * F.col("_ct"))) * 1_000_000).cast("bigint")
    terms = present.select(
        "_g", "_st", "_vocab", "_ct", "_b",
        F.when(
            F.expr(
                f"assert_true(_ct <= {_JSD_B_MAX},"
                " 'mixture_jsd: corpus over bigint term headroom')"
            ).isNull(),
            F.col("_b") * (F.lit(LN2_E6) - q_q),
        ).alias("_tq"),
        (F.col("_a") * (F.lit(LN2_E6) - q_p)).alias("_tp"),
    )
    agg = terms.groupBy("_g", "_st", "_vocab", "_ct").agg(
        F.sum("_tp").alias("_np"),
        # present-token q-side sum + the closed-form absent mass
        (F.sum("_tq") + F.lit(LN2_E6) * (F.first("_ct") - F.sum("_b")))
        .alias("_nq"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("_st").cast("long").alias("n_tokens"),
        F.col("_vocab").cast("long").alias("vocab"),
        F.col("_np").cast("long").alias("jsd_p_num"),
        F.col("_nq").cast("long").alias("jsd_q_num"),
        F.floor(
            F.col("_np") / (F.lit(2.0) * F.col("_st"))
            + F.col("_nq") / (F.lit(2.0) * F.col("_ct"))
        ).cast("long").alias("jsd_e6"),
    )


def mixture_jsd_sql(*, rel: str, group_col: str, text_col: str) -> str:
    """DuckDB recompute of :func:`mixture_jsd`, generated here so the
    two spellings cannot drift (same tokenization, same >= 1 ln
    rewrite, same quantize-before-sum order, same floor expression)."""
    return f"""
        with _jsd_toks as (
          select {group_col} as g,
                 unnest(list_filter(
                   regexp_split_to_array(lower(coalesce({text_col}, '')),
                                         '[^a-z0-9]+'),
                   x -> x <> '')) as tok
          from {rel}
        ),
        _jsd_cnt as (
          select g, tok, count(*) as a from _jsd_toks group by 1, 2
        ),
        _jsd_src as (
          select g, sum(a) as st, count(*) as vocab from _jsd_cnt group by 1
        ),
        _jsd_corpus as (
          select tok, sum(a) as b from _jsd_cnt group by 1
        ),
        _jsd_tot as (select sum(b) as ct from _jsd_corpus),
        _jsd_present as (
          select s.g, s.st, s.vocab, t.ct, n.tok, n.a, c.b
          from _jsd_cnt n
          join _jsd_corpus c on c.tok = n.tok
          join _jsd_src s on s.g = n.g
          cross join _jsd_tot t
        ),
        _jsd_terms as (
          select g, st, vocab, ct, b,
                 b * ({LN2_E6} - cast(round(ln(
                       (cast(a as double) * ct + cast(b as double) * st)
                       / (cast(b as double) * st)) * 1000000) as bigint))
                   as tq,
                 a * ({LN2_E6} - cast(round(ln(
                       (cast(a as double) * ct + cast(b as double) * st)
                       / (cast(a as double) * ct)) * 1000000) as bigint))
                   as tp
          from _jsd_present
        )
        select g as {group_col},
               cast(st as bigint) as n_tokens,
               cast(vocab as bigint) as vocab,
               cast(sum(tp) as bigint) as jsd_p_num,
               cast(sum(tq) + {LN2_E6} * (ct - sum(b)) as bigint) as jsd_q_num,
               cast(floor(sum(tp) / (2.0 * st)
                          + (sum(tq) + {LN2_E6} * (ct - sum(b))) / (2.0 * ct))
                    as bigint) as jsd_e6
        from _jsd_terms group by g, st, vocab, ct
    """


# --- per-group 2x2 G-test drift (period A vs period B) -------------------

# chi-square critical value, 1 df, alpha = 0.05, e6-quantized — the
# conventional "did this template's rate really move" bar.
GTEST_CRIT_E6 = 3_841_459


def _sgnln_e6(num: Column, den: Column) -> Column:
    """round(1e6 · ln(num/den)) as a signed bigint with the ln argument
    rewritten >= 1 (the repo's mixture_jsd convention): HALF_UP round
    on a NON-NEGATIVE double is bit-identical across Spark/DuckDB/libm
    floor(x+0.5), which a signed round is not (away-from-zero vs
    toward-+inf disagree on negative halves)."""
    hi, lo = F.greatest(num, den), F.least(num, den)
    mag = F.round(F.log(hi / lo) * 1_000_000).cast("bigint")
    return F.when(num >= den, mag).otherwise(-mag)


def g_test_drift(
    df: DataFrame, group_col: str, period_col: str, *,
    crit_e6: int = GTEST_CRIT_E6,
) -> DataFrame:
    """Per-group log-likelihood-ratio drift test between two periods —
    "did template t's rate move between window A and window B, beyond
    sampling noise?" Each group gets the 2x2 G-statistic of its own
    counts against the rest of the corpus:

        G = 2 · Σ_cells O · ln(O·N / (R·C))

    over the four cells (period x {group, rest}); G is asymptotically
    chi-square(1), so ``drifted`` flags G above the conventional 95%
    bar (crit_e6 = 3.841459, overridable). The G-test is the
    additive-in-counts form of chi-square (Dunning 1993 — the standard
    choice for text count data, exact-zero-safe: an O = 0 cell
    contributes 0 by the x·ln x → 0 limit, no division by E).

    Exactness: each cell quantizes ``ln(O·N/(R·C))`` to signed integer
    micro-nats via the >= 1 ln-argument rewrite (_sgnln_e6), then
    multiplies by the exact bigint O and sums — quantize-before-sum,
    so ``g_e6`` is an order-free exact bigint and the oracle hash has
    zero tolerance. The products feeding ln are doubles: exact below
    2^53 (N <= ~9.4e13 rows per audit window); beyond that both
    engines still agree bit-for-bit (same IEEE ops), the ratio is
    merely correctly-rounded rather than exact.

    Scale shape: ONE partially-aggregable (group, period) count, then
    a per-group rollup of that tiny frame with the grand totals
    broadcast-joined; the corpus is scanned once, no window, no UDF.
    ``period_col`` must be 0/1 (bigint). Output: one row per group —
    (group, o1, o2, r1, r2, g_e6, drifted)."""
    cnt = df.groupBy(group_col, period_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_group = cnt.groupBy(group_col).agg(
        F.sum(F.when(F.col(period_col) == 0, F.col("_c")).otherwise(0))
        .alias("o1"),
        F.sum(F.when(F.col(period_col) == 1, F.col("_c")).otherwise(0))
        .alias("o2"),
    )
    tot = per_group.agg(
        F.sum("o1").alias("r1"), F.sum("o2").alias("r2")
    )
    j = per_group.crossJoin(F.broadcast(tot))
    n = (F.col("r1") + F.col("r2")).cast("double")
    c = (F.col("o1") + F.col("o2")).cast("double")

    def term(o: Column, r: Column, colc: Column) -> Column:
        od, rd = o.cast("double"), r.cast("double")
        return F.when(
            (o > 0) & (rd * colc > 0),
            o.cast("bigint") * _sgnln_e6(od * n, rd * colc),
        ).otherwise(F.lit(0).cast("bigint"))

    g = (
        term(F.col("o1"), F.col("r1"), c)
        + term(F.col("o2"), F.col("r2"), c)
        + term(F.col("r1") - F.col("o1"), F.col("r1"), n - c)
        + term(F.col("r2") - F.col("o2"), F.col("r2"), n - c)
    )
    return j.select(
        group_col, "o1", "o2", "r1", "r2",
        (F.lit(2) * g).alias("g_e6"),
        (F.lit(2) * g > F.lit(crit_e6)).alias("drifted"),
    )


def g_test_drift_sql(
    *, rel: str, group_col: str, period_col: str,
    crit_e6: int = GTEST_CRIT_E6,
) -> str:
    """DuckDB recompute of :func:`g_test_drift` — same cells, same
    signed >= 1-argument ln quantization, generated here so the two
    spellings cannot drift."""

    def sgnln(num: str, den: str) -> str:
        return (
            f"(case when {num} >= {den}"
            f" then cast(round(ln(greatest({num}, {den})"
            f" / least({num}, {den})) * 1000000) as bigint)"
            f" else -cast(round(ln(greatest({num}, {den})"
            f" / least({num}, {den})) * 1000000) as bigint) end)"
        )

    def term(o: str, r: str, colc: str) -> str:
        return (
            f"(case when {o} > 0 and cast({r} as double) * {colc} > 0"
            f" then cast({o} as bigint)"
            f" * {sgnln(f'cast({o} as double) * nn', f'cast({r} as double) * {colc}')}"
            f" else 0 end)"
        )

    cells = " + ".join([
        term("o1", "r1", "cc"),
        term("o2", "r2", "cc"),
        term("(r1 - o1)", "r1", "(nn - cc)"),
        term("(r2 - o2)", "r2", "(nn - cc)"),
    ])
    return f"""
        with _gt_cnt as (
          select {group_col} as g, {period_col} as p, count(*) as c
          from {rel} group by 1, 2
        ),
        _gt_pg as (
          select g,
                 sum(case when p = 0 then c else 0 end)::BIGINT as o1,
                 sum(case when p = 1 then c else 0 end)::BIGINT as o2
          from _gt_cnt group by 1
        ),
        _gt_tot as (
          select sum(o1)::BIGINT as r1, sum(o2)::BIGINT as r2 from _gt_pg
        ),
        _gt_j as (
          select g, o1, o2, r1, r2,
                 cast(r1 + r2 as double) as nn,
                 cast(o1 + o2 as double) as cc
          from _gt_pg cross join _gt_tot
        )
        select g as {group_col}, o1, o2, r1, r2,
               2 * ({cells}) as g_e6,
               (2 * ({cells}) > {crit_e6}) as drifted
        from _gt_j
    """


def g_test_drift_py(o1: int, o2: int, r1: int, r2: int) -> int:
    """Driver-side reference of one group's g_e6 (differential tests)
    — same cells, same signed quantization, same op order."""
    import math as _math

    n, c = float(r1 + r2), float(o1 + o2)

    def sgnln(num: float, den: float) -> int:
        hi, lo = max(num, den), min(num, den)
        mag = _math.floor(_math.log(hi / lo) * 1_000_000 + 0.5)
        return mag if num >= den else -mag

    def term(o: int, r: int, colc: float) -> int:
        if o <= 0 or float(r) * colc <= 0:
            return 0
        return o * sgnln(float(o) * n, float(r) * colc)

    return 2 * (
        term(o1, r1, c) + term(o2, r2, c)
        + term(r1 - o1, r1, n - c) + term(r2 - o2, r2, n - c)
    )


# --- pairwise source token-set Jaccard (corpus overlap matrix) -----------

def source_token_jaccard(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """EXACT pairwise Jaccard similarity between the token SETS of
    each pair of sources — the corpus-overlap matrix a mixture planner
    reads before weighting sources (two near-identical crawls should
    not both get full weight; a source disjoint from everything is
    either gold or garbage — look at it). Token sets, not counts:
    overlap of VOCABULARY is the mixture-planning signal (the
    count-weighted sibling is mixture_jsd above).

    Exact, not MinHash: the distinct (source, token) frame is persisted
    MEMORY_AND_DISK and feeds the per-source set sizes, both sides of
    the intersection self-join, and the pair grid. Intersections come
    from ONE token-keyed self-equi-join (a token on k sources yields
    k(k-1)/2 pair rows — Σk² is bounded by sources² x shared vocab,
    fine for the bounded source counts this audits, S <= ~2x10³; at
    larger S swap in the MinHash estimate from operators/dedup.py);
    the S x S pair grid itself is a broadcast nested-loop of two
    S-row frames — deliberately tiny, and the reason DISJOINT pairs
    still get their 0-row (a pure intersection join would silently
    drop them). jaccard_e6 = round(1e6 · |A∩B| / (|A|+|B|−|A∩B|)) —
    exact bigints into one correctly-rounded division, quantized once.

    Sources whose every doc is NULL/empty text have no token set and
    are absent from the matrix. Output: one row per unordered pair
    (g1 < g2) — (g1, g2, size1, size2, inter, jaccard_e6)."""
    from pyspark import StorageLevel

    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("_tok"),
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    sizes = toks.groupBy("_g").agg(F.count(F.lit(1)).alias("_sz"))
    inter = (
        toks.select(F.col("_g").alias("g1"), "_tok")
        .join(toks.select(F.col("_g").alias("g2"), "_tok"), "_tok")
        .where(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    grid = (
        sizes.select(F.col("_g").alias("g1"), F.col("_sz").alias("size1"))
        .join(
            F.broadcast(
                sizes.select(F.col("_g").alias("g2"),
                             F.col("_sz").alias("size2"))
            ),
            F.col("g1") < F.col("g2"),
        )
    )
    return (
        grid.join(inter, ["g1", "g2"], "left")
        .select(
            "g1", "g2", "size1", "size2",
            F.coalesce(F.col("inter"), F.lit(0)).alias("inter"),
            F.round(
                F.lit(1_000_000.0)
                * F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("size1") + F.col("size2")
                   - F.coalesce(F.col("inter"), F.lit(0))).cast("double")
            ).cast("bigint").alias("jaccard_e6"),
        )
    )


def source_token_jaccard_sql(
    *, rel: str, group_col: str, text_col: str
) -> str:
    """DuckDB recompute of :func:`source_token_jaccard` (same token
    law, same grid-left-join so disjoint pairs keep their 0-row)."""
    return f"""
        with _stj_toks as (
          select distinct {group_col} as g, tok
          from (
            select {group_col},
                   unnest(list_filter(
                     string_split_regex(lower(coalesce({text_col}, '')),
                                        '[^a-z0-9]+'),
                     x -> x != '')) as tok
            from {rel}
          )
        ),
        _stj_sizes as (
          select g, count(*)::BIGINT as sz from _stj_toks group by 1
        ),
        _stj_inter as (
          select a.g as g1, b.g as g2, count(*)::BIGINT as inter
          from _stj_toks a join _stj_toks b using (tok)
          where a.g < b.g group by 1, 2
        )
        select a.g as g1, b.g as g2,
               a.sz as size1, b.sz as size2,
               coalesce(i.inter, 0)::BIGINT as inter,
               cast(round(1000000.0 * cast(coalesce(i.inter, 0) as double)
                    / cast(a.sz + b.sz - coalesce(i.inter, 0) as double))
                    as bigint) as jaccard_e6
        from _stj_sizes a
        join _stj_sizes b on a.g < b.g
        left join _stj_inter i on i.g1 = a.g and i.g2 = b.g
    """


# --- Unicode script mix ------------------------------------------------------

# Char classes as LITERAL-character ranges (the Python source embeds the
# endpoints as real characters), so Java regex (Spark) and RE2 (DuckDB)
# interpret them identically by codepoint — no \uXXXX vs \x{XXXX}
# dialect split. All ranges are BMP, so surrogate handling never enters.
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("han", "[一-鿿]"),
    ("arabic", "[؀-ۿ]"),
)


def _second_max(cols: list) -> "F.Column":
    """Exact second-largest of the columns: the greatest of all pairwise
    leasts (for sorted x1 >= x2 >= ...: pair (x1, x2) contributes x2 and
    every other pair's least is <= x2). Spells identically in both
    engines (GREATEST/LEAST), no sort, no array."""
    pairs = [
        F.least(cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    return F.greatest(*pairs)


def script_mix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    mixed_permille: int = 100,
) -> DataFrame:
    """Per-document Unicode script histogram + mixed-script flag — the
    encoding-health / spam signal every multilingual crawl pipeline
    computes before language ID (mixed-script pages are dominated by
    keyword-stuffing spam and mojibake; CCNet-style pipelines drop or
    down-weight them, and a Latin page claiming lang=zh is a routing
    bug upstream).

    Per doc: the count of characters in each of :data:`SCRIPT_CLASSES`
    (latin / cyrillic / han / arabic — the four classes the synthetic
    corpus can stage decidably), ``n_letters`` their sum, ``dominant``
    the argmax with first-wins tie precedence in SCRIPT_CLASSES order
    (``none`` for a letterless doc), and ``is_mixed`` true iff the
    SECOND-largest script holds at least ``mixed_permille``/1000 of the
    letters — integer law ``second * 1000 >= mixed_permille *
    n_letters`` with n_letters > 0, so the boundary is bit-decidable
    cross-engine. The second max is the greatest-of-pairwise-leasts
    closed form (no sort). NULL text emits a row with zero counts and
    dominant ``none`` (the r4 silent-drop lesson).

    Scale shape: one regexp_count per class in a single projection —
    pure whole-stage-codegen scan, ZERO exchanges (the cdx_index
    shape); at 100 TB the cost is the four byte passes over each page,
    scan-bound. Output: (id, n_latin, n_cyrillic, n_han, n_arabic,
    n_letters, dominant, is_mixed)."""
    if not 1 <= mixed_permille <= 1000:
        raise ValueError(
            f"mixed_permille must be in [1, 1000], got {mixed_permille}"
        )
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("bigint")
        for name, pat in SCRIPT_CLASSES
    }
    names = [n for n, _ in SCRIPT_CLASSES]
    n_letters = sum(counts[n] for n in names)
    # first-wins CASE chain in SCRIPT_CLASSES order = deterministic
    # tie precedence latin > cyrillic > han > arabic
    chain = F.when(F.lit(False), F.lit(""))
    for i, n in enumerate(names):
        cond = None
        for m in names[i + 1:]:
            c = counts[n] >= counts[m]
            cond = c if cond is None else (cond & c)
        chain = chain.when(
            cond if cond is not None else F.lit(True), F.lit(n)
        )
    dominant = F.when(n_letters == 0, F.lit("none")).otherwise(chain)
    second = _second_max([counts[n] for n in names])
    mixed = (n_letters > 0) & (
        second * 1000 >= F.lit(mixed_permille) * n_letters
    )
    return df.select(
        F.col(id_col),
        *[counts[n].alias(f"n_{n}") for n in names],
        n_letters.alias("n_letters"),
        dominant.alias("dominant"),
        mixed.alias("is_mixed"),
    )


def script_mix_sql(
    *, rel: str, id_col: str, text_col: str, mixed_permille: int = 100
) -> str:
    """DuckDB recompute of :func:`script_mix` — same literal-range
    patterns, same first-wins CASE chain and pairwise-least second
    max, generated here so the two spellings cannot drift."""
    if not 1 <= mixed_permille <= 1000:
        raise ValueError(
            f"mixed_permille must be in [1, 1000], got {mixed_permille}"
        )
    names = [n for n, _ in SCRIPT_CLASSES]
    cnt = {
        n: (
            "cast(len(regexp_extract_all(coalesce("
            f"{text_col}, ''), '{pat}')) as bigint)"
        )
        for n, pat in SCRIPT_CLASSES
    }
    tot = " + ".join(f"n_{n}" for n in names)
    chain = []
    for i, n in enumerate(names):
        conds = [f"n_{n} >= n_{m}" for m in names[i + 1:]]
        chain.append(
            f"when {' and '.join(conds)} then '{n}'"
            if conds else f"else '{n}'"
        )
    pairs = ", ".join(
        f"least(n_{names[i]}, n_{names[j]})"
        for i in range(len(names))
        for j in range(i + 1, len(names))
    )
    return f"""
        with _sm_cnt as (
          select {id_col},
                 {', '.join(f'{cnt[n]} as n_{n}' for n in names)}
          from {rel}
        )
        select {id_col}, {', '.join(f'n_{n}' for n in names)},
               ({tot}) as n_letters,
               case when ({tot}) = 0 then 'none'
                    {' '.join(chain[:-1])} {chain[-1]} end as dominant,
               (({tot}) > 0 and greatest({pairs}) * 1000
                  >= {mixed_permille} * ({tot})) as is_mixed
        from _sm_cnt
    """


# --- two-sample KS drift -----------------------------------------------------


def ks_drift(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov statistic against the
    REST of the corpus — the distribution-shape drift audit that
    catches what count-based tests miss (a source whose document-length
    DISTRIBUTION shifted while its volume stayed flat). For each group
    g: ``D = max_v |CDF_g(v) − CDF_rest(v)|`` over the integer value
    column, computed EXACTLY as the bigint
    ``ks_num = max_v |cum_g(v)·n_rest − cum_rest(v)·n_g|`` over the
    common denominator ``n_g·n_rest`` (no floats anywhere until the
    single e6 quantization), with ``at_value`` the SMALLEST value
    achieving the max (deterministic argmax). A group that is the
    whole corpus (or empty rest) emits ks_e6 = 0 with at_value NULL
    rather than dividing by zero.

    Exactness bound: the cross products need ``n_g·n_rest ≤ 2⁶³``, so
    the corpus must hold ≤ 3·10⁹ rows — enforced by a woven
    assert_true (the mixture_jsd headroom pattern); beyond that,
    pre-aggregate values into quantized buckets or sample per group
    upstream.

    Scale shape: one (group, value) partial-agg count; per-value
    totals are a second partial agg of THAT frame; the evaluation grid
    is groups × distinct values (two small frames cross-joined — the
    CDF step function only changes at support points, so this grid is
    sufficient AND necessary); one partition-parallel cumulative
    window per group ordered by value; the argmax resolves via a tiny
    equi-join of the per-group max back to the grid. The raw corpus
    is scanned ONCE. Output: (group, n_g, n_rest, ks_e6, at_value)."""
    cnt = (
        df.groupBy(
            F.col(group_col).alias("g"), F.col(val_col).alias("v")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot_v = cnt.groupBy("v").agg(F.sum("c").alias("t"))
    n_g = cnt.groupBy("g").agg(F.sum("c").alias("n_g"))
    n_tot = (
        tot_v.agg(F.sum("t").alias("n_total"))
        .select(
            "n_total",
            F.assert_true(
                F.col("n_total") <= F.lit(3_000_000_000),
                F.lit("ks_drift exactness bound: corpus must be <= 3e9 "
                      "rows — pre-bucket or sample upstream"),
            ).alias("_chk"),
        )
        .drop("_chk")
    )
    grid = n_g.crossJoin(F.broadcast(tot_v.select("v")))
    joined = (
        grid.join(cnt, ["g", "v"], "left")
        .join(F.broadcast(tot_v), "v")
        .select(
            "g", "v", "n_g", "t",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("g").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = joined.select(
        "g", "v", "n_g",
        F.sum("c").over(w).alias("cum_g"),
        F.sum("t").over(w).alias("cum_tot"),
    ).crossJoin(F.broadcast(n_tot))
    d = cum.select(
        "g", "v", "n_g",
        (F.col("n_total") - F.col("n_g")).alias("n_rest"),
        F.abs(
            F.col("cum_g") * (F.col("n_total") - F.col("n_g"))
            - (F.col("cum_tot") - F.col("cum_g")) * F.col("n_g")
        ).alias("d_num"),
    )
    per_g = d.groupBy("g", "n_g", "n_rest").agg(
        F.max("d_num").alias("ks_num")
    )
    at_v = (
        per_g.join(
            d.select("g", "v", F.col("d_num").alias("ks_num")),
            ["g", "ks_num"],
        )
        .groupBy("g")
        .agg(F.min("v").alias("at_value"))
    )
    return (
        per_g.join(at_v, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_g",
            "n_rest",
            F.when(
                (F.col("n_g") == 0) | (F.col("n_rest") == 0),
                F.lit(0).cast("bigint"),
            )
            .otherwise(
                F.expr("ks_num * 1000000 div (n_g * n_rest)")
            )
            .alias("ks_e6"),
            F.when(
                (F.col("n_g") == 0) | (F.col("n_rest") == 0),
                F.lit(None).cast("bigint"),
            )
            .otherwise(F.col("at_value").cast("bigint"))
            .alias("at_value"),
        )
    )


def ks_drift_sql(*, rel: str, group_col: str, val_col: str) -> str:
    """DuckDB recompute of :func:`ks_drift` — same grid, same bigint
    cross products, same smallest-argmax law, generated here so the
    two spellings cannot drift."""
    return f"""
        with _ks_cnt as (
          select {group_col} as g, {val_col} as v,
                 count(*)::BIGINT as c
          from {rel} group by 1, 2
        ),
        _ks_tot as (select v, sum(c)::BIGINT as t from _ks_cnt group by 1),
        _ks_ng as (select g, sum(c)::BIGINT as n_g from _ks_cnt group by 1),
        _ks_n as (select sum(t)::BIGINT as n_total from _ks_tot),
        _ks_grid as (
          select ng.g, ng.n_g, tv.v from _ks_ng ng cross join _ks_tot tv
        ),
        _ks_cum as (
          select gr.g, gr.v, gr.n_g,
                 sum(coalesce(c.c, 0)) over (
                   partition by gr.g order by gr.v
                   rows between unbounded preceding and current row
                 )::BIGINT as cum_g,
                 sum(t.t) over (
                   partition by gr.g order by gr.v
                   rows between unbounded preceding and current row
                 )::BIGINT as cum_tot
          from _ks_grid gr
          left join _ks_cnt c on c.g = gr.g and c.v = gr.v
          join _ks_tot t on t.v = gr.v
        ),
        _ks_d as (
          select g, v, n_g, (n.n_total - n_g)::BIGINT as n_rest,
                 abs(cum_g * (n.n_total - n_g)
                     - (cum_tot - cum_g) * n_g)::BIGINT as d_num
          from _ks_cum cross join _ks_n n
        ),
        _ks_max as (
          select g, n_g, n_rest, max(d_num)::BIGINT as ks_num
          from _ks_d group by 1, 2, 3
        ),
        _ks_at as (
          select m.g, min(d.v)::BIGINT as at_value
          from _ks_max m join _ks_d d on d.g = m.g and d.d_num = m.ks_num
          group by 1
        )
        select m.g as {group_col}, m.n_g, m.n_rest,
               case when m.n_g = 0 or m.n_rest = 0 then 0
                    else m.ks_num * 1000000 // (m.n_g * m.n_rest)
               end::BIGINT as ks_e6,
               case when m.n_g = 0 or m.n_rest = 0 then NULL
                    else a.at_value end::BIGINT as at_value
        from _ks_max m left join _ks_at a on a.g = m.g
    """


# --- JSON schema profile -----------------------------------------------------


def json_schema_profile(
    df: DataFrame, group_col: str, json_col: str
) -> DataFrame:
    """Per-group TOP-LEVEL-key profile of a JSON payload column — the
    schema-drift audit for semi-structured telemetry: a producer that
    renamed a field, started emitting a new one, or began sending
    garbage shows up as a key's share moving between crawls, per
    event type. Invalid/NULL/non-object payloads surface as the
    reserved key ``∅invalid`` (they must be visible, not dropped —
    the r4 lesson applied to documents that don't even parse).

    Per (group, key): ``n`` and ``share_e6`` = n·10⁶ DIV the GROUP's
    total payload count (all rows, invalid included), so shares are
    comparable across keys and the invalid share is itself a tracked
    signal. Key order inside a document is irrelevant (keys explode to
    rows); duplicate keys in one document count once per occurrence
    as the engines report them.

    Scale shape: one scan → explode_outer of ``json_object_keys`` (a
    JVM codegen parser, no Python) → ONE partially-aggregable
    (group, key) count; group totals are a partial re-agg of that
    frame joined back broadcast. Output: (group, key, n, share_e6)."""
    keys = F.json_object_keys(F.col(json_col))
    exploded = df.select(
        F.col(group_col).alias("g"), F.explode_outer(keys).alias("k")
    ).select(
        "g", F.coalesce(F.col("k"), F.lit("∅invalid")).alias("k")
    )
    cnt = exploded.groupBy("g", "k").agg(F.count(F.lit(1)).alias("n"))
    tot = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("t")
    )
    return (
        cnt.join(F.broadcast(tot), "g")
        .select(
            F.col("g").alias(group_col),
            F.col("k").alias("key"),
            "n",
            F.expr("n * 1000000 div t").cast("bigint").alias("share_e6"),
        )
    )


def json_schema_profile_sql(
    *, rel: str, group_col: str, json_col: str
) -> str:
    """DuckDB recompute of :func:`json_schema_profile` — LEFT JOIN
    LATERAL over json_keys guarded by try_cast-to-JSON (a bare CASE
    over the VARCHAR column is NOT safe — DuckDB casts the whole input
    vector to JSON before CASE filters rows, erroring on malformed
    payloads; try_cast yields NULL per row),
    generated here so the two spellings cannot drift."""
    return f"""
        with _js_k as (
          select b.g, coalesce(u.k, '∅invalid') as k
          from (
            select {group_col} as g,
                   case when json_type(try_cast({json_col} as json))
                          = 'OBJECT'
                        then json_keys(try_cast({json_col} as json))
                   end as ks
            from {rel}
          ) b
          left join lateral (select unnest(b.ks) as k) u on true
        ),
        _js_c as (
          select g, k, count(*)::BIGINT as n from _js_k group by 1, 2
        ),
        _js_t as (
          select {group_col} as g, count(*)::BIGINT as t
          from {rel} group by 1
        )
        select c.g as {group_col}, c.k as key, c.n,
               (c.n * 1000000 // t.t)::BIGINT as share_e6
        from _js_c c join _js_t t on t.g = c.g
    """


# --- vocabulary growth (Heaps' law) ------------------------------------------


def vocab_growth(
    df: DataFrame, id_col: str, text_col: str, *, bucket_size: int
) -> DataFrame:
    """Vocabulary-growth curve (the Heaps'-law audit): walk the corpus
    in ``id_col`` order in buckets of ``bucket_size`` docs and report,
    per bucket, the NEW token types it introduces and the running
    totals — the diversity signal a data curator reads before adding
    another crawl dump (a flattening curve says the new data is
    repeating the old vocabulary; Heaps' law V ≈ K·N^β predicts the
    slope for healthy natural text, β ≈ 0.4–0.6). Exact, not fitted:
    the output IS the (cum_tokens, cum_types) point set; fit β
    downstream if wanted.

    Token law: the shared lowercase-alphanumeric tokenizer
    (functions/text.py single definition). A token's bucket of first
    appearance is ``min(bucket)`` over its occurrences — order inside
    a bucket doesn't matter, so the curve is partition-invariant and
    engine-portable without any global sort.

    Scale shape: one token explode → (token) MIN-bucket partial agg
    (map-side combinable) + one (bucket) token-total partial agg; the
    cumulative window runs over the ≤ n/bucket_size-row bucket frame,
    never the token stream. Empty buckets inside the id range emit no
    row (ids absent from the data cannot be distinguished from gaps —
    callers with sparse ids pre-densify). Output: (bucket, n_docs,
    n_tokens, new_types, cum_tokens, cum_types)."""
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1, got {bucket_size}")
    from ..functions.text import lower_tokens

    bucket = F.expr(f"{id_col} div {bucket_size}").cast("bigint")
    toks = df.select(
        bucket.alias("b"),
        F.explode(
            lower_tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("tok"),
    )
    first = toks.groupBy("tok").agg(F.min("b").alias("fb"))
    new_types = first.groupBy(F.col("fb").alias("b")).agg(
        F.count(F.lit(1)).alias("new_types")
    )
    per_bucket = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    docs = df.select(bucket.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql import Window as W

    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        docs.join(per_bucket, "b", "left")
        .join(new_types, "b", "left")
        .select(
            F.col("b").alias("bucket"),
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint")
            .alias("n_tokens"),
            F.coalesce("new_types", F.lit(0)).cast("bigint")
            .alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .withColumn("cum_types", F.sum("new_types").over(w).cast("bigint"))
    )


def vocab_growth_sql(
    *, rel: str, id_col: str, text_col: str, bucket_size: int
) -> str:
    """DuckDB recompute of :func:`vocab_growth` — same token law, same
    min-bucket first-appearance rule, generated here so the two
    spellings cannot drift."""
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1, got {bucket_size}")
    from ..functions.text import LOWER_TOKENS_SQL

    toks = LOWER_TOKENS_SQL.format(c=f"coalesce({text_col}, '')")
    return f"""
        with _vg_t as (
          select ({id_col} // {bucket_size}) as b, unnest({toks}) as tok
          from {rel}
        ),
        _vg_first as (
          select tok, min(b) as fb from _vg_t group by 1
        ),
        _vg_new as (
          select fb as b, count(*)::BIGINT as new_types
          from _vg_first group by 1
        ),
        _vg_tok as (
          select b, count(*)::BIGINT as n_tokens from _vg_t group by 1
        ),
        _vg_docs as (
          select ({id_col} // {bucket_size}) as b, count(*)::BIGINT as n_docs
          from {rel} group by 1
        )
        select d.b as bucket, d.n_docs,
               coalesce(t.n_tokens, 0)::BIGINT as n_tokens,
               coalesce(n.new_types, 0)::BIGINT as new_types,
               sum(coalesce(t.n_tokens, 0)) over (order by d.b
                 rows between unbounded preceding and current row
               )::BIGINT as cum_tokens,
               sum(coalesce(n.new_types, 0)) over (order by d.b
                 rows between unbounded preceding and current row
               )::BIGINT as cum_types
        from _vg_docs d
        left join _vg_tok t on t.b = d.b
        left join _vg_new n on n.b = d.b
    """


# --- Hill tail index ---------------------------------------------------------


def hill_tail_index(
    df: DataFrame, key_col: str, size_col: str, *, k: int
) -> DataFrame:
    """Hill estimator of the power-law tail index over per-key sizes —
    the heavy-tail audit a crawl planner runs on host-size /
    dup-family-size distributions (α ≤ 2 means the biggest hosts
    dominate total mass: partition-by-host will straggle and source
    caps are mandatory; α large means the tail is benign).

        α̂ = k / ( (1/k)·Σ_{i=1..k} ln(x_(i) / x_(k+1)) )⁻¹ … spelled
        alpha_e3 = k·10⁹ DIV Σ round(10⁶·ln(x_(i)/x_(k+1)))

    over the k largest sizes with x_(k+1) the reference order
    statistic. Each ln term quantizes to integer micro-nats BEFORE
    the sum (the char_entropy/lm convention: one double division +
    one ln on integer args — bit-identical cross-engine), so the
    output is exact given the inputs. Ties at the k-boundary resolve
    by (size desc, key asc) — deterministic. Requires at least k+1
    keys with positive size (ValueError-documented, runtime NULL row
    otherwise is not emitted — the single output row simply reports
    what it used).

    Output: ONE row (n_keys, k, x_ref, sum_ln_e6, alpha_e3); alpha
    NULL when the tail is degenerate (sum_ln_e6 = 0 — the top k+1
    sizes all equal, no tail to measure).

    Scale shape: one partial agg to the per-key size frame; the
    order-statistic selection is a window over that SMALL frame (keys
    ≪ rows — hosts, families); the estimator folds in one tiny agg."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.col(size_col)).cast("bigint").alias("sz")
    ).where(F.col("sz") > 0)
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("sz"), F.col("key"))
    ranked = sizes.select(
        "sz", F.row_number().over(w).alias("r")
    ).where(F.col("r") <= k + 1)
    ref = ranked.where(F.col("r") == k + 1).select(
        F.col("sz").alias("x_ref")
    )
    n_keys = sizes.agg(F.count(F.lit(1)).alias("n_keys"))
    terms = (
        ranked.where(F.col("r") <= k)
        .crossJoin(F.broadcast(ref))
        .select(
            "x_ref",
            F.round(
                F.log(F.col("sz").cast("double") / F.col("x_ref"))
                * 1_000_000
            ).cast("bigint").alias("t"),
        )
    )
    agg = terms.groupBy("x_ref").agg(
        F.sum("t").alias("sum_ln_e6"), F.count(F.lit(1)).alias("used_k")
    )
    return (
        n_keys.crossJoin(F.broadcast(agg))
        .select(
            "n_keys",
            F.col("used_k").cast("bigint").alias("k"),
            "x_ref",
            "sum_ln_e6",
            F.when(F.col("sum_ln_e6") <= 0, F.lit(None).cast("bigint"))
            .otherwise(
                F.expr("used_k * 1000000000 div sum_ln_e6")
            )
            .alias("alpha_e3"),
        )
    )


def hill_tail_index_sql(
    *, rel: str, key_col: str, size_col: str, k: int
) -> str:
    """DuckDB recompute of :func:`hill_tail_index` — same order
    statistics, same quantize-before-sum ln terms, generated here so
    the two spellings cannot drift."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return f"""
        with _ht_s as (
          select {key_col} as key, sum({size_col})::BIGINT as sz
          from {rel} group by 1 having sum({size_col}) > 0
        ),
        _ht_r as (
          select sz, row_number() over (order by sz desc, key) as r
          from _ht_s
        ),
        _ht_ref as (select sz as x_ref from _ht_r where r = {k + 1}),
        _ht_t as (
          select x_ref,
                 cast(round(ln(cast(sz as double) / x_ref) * 1000000)
                      as bigint) as t
          from _ht_r cross join _ht_ref where r <= {k}
        ),
        _ht_a as (
          select x_ref, sum(t)::BIGINT as sum_ln_e6,
                 count(*)::BIGINT as used_k
          from _ht_t group by 1
        ),
        _ht_n as (select count(*)::BIGINT as n_keys from _ht_s)
        select n.n_keys, a.used_k as k, a.x_ref, a.sum_ln_e6,
               case when a.sum_ln_e6 <= 0 then NULL
                    else a.used_k * 1000000000 // a.sum_ln_e6
               end::BIGINT as alpha_e3
        from _ht_n n cross join _ht_a a
    """


# --- columnar encoding advisor -----------------------------------------------

ENCODING_NDV_PERMILLE = 50   # dict when NDV <= 5% of rows
ENCODING_RUN_MIN = 4         # RLE when the average run is >= 4 rows


def encoding_advisor(
    df: DataFrame, id_col: str, cols: "Sequence[str]"
) -> DataFrame:
    """Columnar ENCODING advisor — per column, the two statistics that
    decide parquet/ORC encoding choices at write time, with the
    integer decision rule applied: exact NDV (dictionary pays off
    when the dictionary is small: NDV ≤ 5% of rows) and the exact RUN
    structure in ``id_col`` order (RLE pays off when the average run
    is ≥ 4 rows). Precedence: rle > dict > plain — a long-run column
    compresses better as runs even when its dictionary is also small.

    Run law WITHOUT a global window: ``id_col`` must be DENSE
    consecutive integers (the staged-corpus contract; validated by
    max−min+1 == count via a woven assert): a run boundary is a row
    whose predecessor (id−1) holds a different value, found by ONE
    equi-self-join on id = id+1 — shuffle on a bigint key, never a
    single-task ordering. NULL values compare as the reserved '∅'
    (a NULL run is still a run). n_runs = boundaries + 1.

    Scale shape per column: one NDV partial agg + one id-keyed
    equi-join; columns are unioned (k small — this is a schema-sized
    audit, not a row-sized one). Output per column: (column, n_rows,
    ndv, n_runs, avg_run_e3, advice)."""
    cols = list(cols)
    if not cols:
        raise ValueError("no columns to advise on")
    spark = df.sparkSession
    outs = []
    for c in cols:
        v = F.coalesce(F.col(c).cast("string"), F.lit("∅"))
        base = df.select(
            F.col(id_col).cast("bigint").alias("i"), v.alias("v")
        )
        # the dense-id assert is woven INTO the consumed n_rows column
        # (a dropped assert column is pruned by Catalyst — the snm
        # lesson, re-learned live in this arc's smoke test)
        stats = base.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("v").alias("ndv"),
            F.min("i").alias("_lo"),
            F.max("i").alias("_hi"),
        ).select(
            F.when(
                F.assert_true(
                    F.col("_hi") - F.col("_lo") + 1 == F.col("n_rows"),
                    F.lit("encoding_advisor requires dense consecutive "
                          f"ids in {id_col!r}"),
                ).isNull(),
                F.col("n_rows"),
            ).alias("n_rows"),
            "ndv",
        )
        nxt = base.select(
            (F.col("i") + 1).alias("i"), F.col("v").alias("pv")
        )
        bnd = (
            base.join(nxt, "i")
            .where(F.col("v") != F.col("pv"))
            .agg((F.count(F.lit(1)) + 1).cast("bigint").alias("n_runs"))
        )
        one = stats.crossJoin(F.broadcast(bnd)).select(
            F.lit(c).alias("column"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("ndv").cast("bigint").alias("ndv"),
            "n_runs",
            F.expr("n_rows * 1000 div n_runs").alias("avg_run_e3"),
            F.when(
                F.expr(f"n_rows >= {ENCODING_RUN_MIN} * n_runs"),
                F.lit("rle"),
            )
            .when(
                F.expr(f"ndv * 1000 <= {ENCODING_NDV_PERMILLE} * n_rows"),
                F.lit("dict"),
            )
            .otherwise(F.lit("plain"))
            .alias("advice"),
        )
        outs.append(one)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    _ = spark
    return out


def encoding_advisor_sql(
    *, rel: str, id_col: str, cols: "Sequence[str]"
) -> str:
    """DuckDB recompute of :func:`encoding_advisor` — same run law via
    the id = id+1 self-join, same thresholds, generated here so the
    two spellings cannot drift."""
    cols = list(cols)
    if not cols:
        raise ValueError("no columns to advise on")
    parts = []
    for c in cols:
        parts.append(f"""
        select '{c}' as column, s.n_rows, s.ndv, b.n_runs,
               (s.n_rows * 1000 // b.n_runs)::BIGINT as avg_run_e3,
               case when s.n_rows >= {ENCODING_RUN_MIN} * b.n_runs
                      then 'rle'
                    when s.ndv * 1000
                      <= {ENCODING_NDV_PERMILLE} * s.n_rows then 'dict'
                    else 'plain' end as advice
        from (
          select count(*)::BIGINT as n_rows,
                 count(distinct coalesce(cast({c} as varchar), '∅'))::BIGINT
                   as ndv
          from {rel}
        ) s cross join (
          select (count(*) + 1)::BIGINT as n_runs
          from (select cast({id_col} as bigint) as i,
                       coalesce(cast({c} as varchar), '∅') as v
                from {rel}) a
          join (select cast({id_col} as bigint) + 1 as i,
                       coalesce(cast({c} as varchar), '∅') as pv
                from {rel}) b using (i)
          where a.v != b.pv
        ) b""")
    return " union all ".join(parts)
