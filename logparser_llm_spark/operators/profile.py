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
