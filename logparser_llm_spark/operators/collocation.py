"""Collocation (phrase) detection: adjacent-bigram PMI over a text
corpus — the word2phrase step (Mikolov et al. 2013, "Distributed
Representations of Words and Phrases") that training-data pipelines
run before tokenizer training to decide which adjacent word pairs
deserve to be merged into single units.

Score: an integer-exact monotone rescaling of pointwise mutual
information. With ``pc`` the bigram count, ``c1``/``c2`` the unigram
counts and ``NU`` the total unigram count,

    score_e6 = (pc * NU * 1_000_000) // (c1 * c2)

which is ``1e6 · NU · p(w1,w2)·NB / (p(w1)·p(w2))`` up to the constant
corpus factor ``NU/NB ≈ 1`` — monotone in true PMI within a corpus, and
pure bigint arithmetic so Spark, DuckDB and Python agree bit-exactly
(no log, no float). Independence reads ≈ 1e6·NU/NB; attraction above,
repulsion below.

Scale shape: tokenization and bigram extraction are per-row array ops
(``split``/``slice``/``arrays_zip`` — JVM codegen, no Python); the
bigram and unigram counts are partially-aggregable groupBys whose
output is vocab-sized, so the unigram-count joins broadcast; top-k
compiles to TakeOrderedAndProject. The bigint headroom bounds the
corpus at ``NU ≤ 3e6`` tokens per invocation (``pc·NU·1e6 < 2^63``);
beyond that, shard the corpus or widen to DECIMAL — enforced with a
loud ``assert_true`` rather than Spark's silent non-ANSI overflow wrap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NU_MAX = 3_000_000


def bigram_pmi(
    df: DataFrame,
    text_col: str,
    *,
    min_count: int = 5,
    k: int = 100,
    nu_max: int = _NU_MAX,
) -> DataFrame:
    """Top-``k`` adjacent word pairs by integer PMI score.

    Tokens are whitespace runs (``split '[ ]+'``); empty tokens are
    dropped on both the unigram and bigram sides. Output:
    ``(w1, w2, pc, c1, c2, score_e6)`` ordered by score desc with the
    (w1, w2) lexicographic total tiebreak baked into the limit.
    ``nu_max`` exists so tests can trip the headroom guard on small
    corpora; lowering it below the real bound is the only sane use.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    if not (0 < nu_max <= _NU_MAX):
        raise ValueError(f"nu_max must be in 1..{_NU_MAX}")
    toks = df.select(F.split(F.col(text_col), " +").alias("__l")).select(
        F.expr("filter(__l, x -> x <> '')").alias("__l")
    )
    # adjacent pairs: zip the array against itself shifted by one
    bg = (
        toks.where(F.size("__l") >= 2)
        .select(
            F.expr("slice(__l, 1, size(__l) - 1)").alias("la"),
            F.expr("slice(__l, 2, size(__l) - 1)").alias("lb"),
        )
        .select(F.explode(F.arrays_zip("la", "lb")).alias("p"))
        .select(F.col("p.la").alias("w1"), F.col("p.lb").alias("w2"))
    )
    uni = toks.select(F.explode("__l").alias("w"))
    cnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = uni.agg(F.count(F.lit(1)).alias("__nu"))
    pairs = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pc"))
        .where(F.col("pc") >= min_count)
    )
    scored = (
        pairs.join(F.broadcast(cnt.select(F.col("w").alias("w1"),
                                          F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(cnt.select(F.col("w").alias("w2"),
                                     F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(nu))
        .select(
            "w1",
            "w2",
            "pc",
            "c1",
            "c2",
            # the guard is woven INTO the kept expression (assert_true
            # yields NULL on success, raises on violation) — a dropped
            # side column would be pruned by Catalyst and never run
            F.when(
                F.expr(
                    f"assert_true(__nu <= {nu_max},"
                    " 'bigram_pmi: corpus over bigint score headroom')"
                ).isNull(),
                F.expr("(pc * __nu * 1000000) div (c1 * c2)"),
            )
            .cast("bigint")
            .alias("score_e6"),
        )
    )
    return scored.orderBy(
        F.col("score_e6").desc(), F.col("w1"), F.col("w2")
    ).limit(k)


def bigram_pmi_sql(
    *, docs: str, text_col: str, min_count: int = 5, k: int = 100
) -> str:
    """DuckDB twin of :func:`bigram_pmi`, generated here so the two
    spellings cannot drift."""
    return f"""
        with toks as (
          select list_filter(string_split_regex({text_col}, ' +'),
                             x -> x <> '') as l
          from {docs}
        ),
        bg as (
          select unnest(list_zip(list_slice(l, 1, length(l) - 1),
                                 list_slice(l, 2, length(l)))) as p
          from toks where length(l) >= 2
        ),
        pairs as (
          select p[1] as w1, p[2] as w2, count(*)::BIGINT as pc
          from bg group by 1, 2 having count(*) >= {min_count}
        ),
        uni as (select unnest(l) as w from toks),
        cnt as (select w, count(*)::BIGINT as c from uni group by 1),
        nu as (select count(*)::BIGINT as nu from uni)
        select w1, w2, pc, c1.c as c1, c2.c as c2,
               (pc * nu.nu * 1000000 // (c1.c * c2.c))::BIGINT as score_e6
        from pairs
          join cnt c1 on pairs.w1 = c1.w
          join cnt c2 on pairs.w2 = c2.w
          cross join nu
        order by score_e6 desc, w1, w2 limit {k}
    """


def bigram_pmi_py(
    texts: list[str], *, min_count: int = 5, k: int = 100
) -> list[tuple]:
    """Driver-side reference for :func:`bigram_pmi` (differential
    tests): same tokenization, counts and integer score."""
    import re

    uni: dict = {}
    pairs: dict = {}
    for t in texts:
        toks = [w for w in re.split(" +", t) if w != ""]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    nu = sum(uni.values())
    scored = [
        (w1, w2, pc, uni[w1], uni[w2],
         pc * nu * 1_000_000 // (uni[w1] * uni[w2]))
        for (w1, w2), pc in pairs.items()
        if pc >= min_count
    ]
    scored.sort(key=lambda r: (-r[5], r[0], r[1]))
    return scored[:k]
