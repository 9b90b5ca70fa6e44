"""Statistical language-model quality scoring: distributed bigram LM
training + per-document negative log likelihood, the CCNet-style
perplexity filter (Wenzek et al. 2020: score every crawled page under a
LM trained on trusted text; keep the low-perplexity tail).

The reference engine has no LM surface; this sits in the repo's
beyond-reference training-data tier next to BM25/dedup/sketches.

Scale shape (the part that must survive 100 TB):

- Training is ONE token explode over the training corpus feeding a
  single partially-aggregable bigram ``groupBy(w1, w2)`` count; the
  context counts derive from that same frame (``groupBy(w1)`` sum — a
  second tiny aggregate over the model, not a second pass over text).
  Model size is O(distinct bigrams), never O(corpus).
- Scoring pre-aggregates the document bigram stream to
  ``(doc, w1, w2, cnt)`` (map-side combinable — repeated boilerplate
  bigrams collapse in the map tasks) before joining the model, so the
  model joins touch the distinct-bigram frame, not the raw stream. The
  two model joins are ordinary equi-joins; at test scale AQE broadcasts
  the model side, at 100 TB they degrade gracefully to shuffled joins.
- No UDF anywhere; bigram construction is a JVM ``transform(sequence)``
  expression inside whole-stage codegen.

Cross-engine determinism (the oracle story, same contract as BM25):
every count is an exact integer; add-k smoothing with RATIONAL k
(``k_num/k_den``) keeps the probability a ratio of two exact integers,
``P(w2|w1) = (c12·kd + kn) / (c1·kd + kn·V)``; the per-bigram score is
ONE double division + ONE ``ln`` + quantization to integer micro-units
(``round(1e6·ln(p))``) BEFORE the per-doc sum, so the aggregate is an
order-free integer sum. The only residual cross-engine wiggle is the
≤1-ulp libm-vs-JVM difference inside ``ln`` (see ranking.py — it has
never flipped a quantized value on the test corpora, and the registry
oracle hash would catch it loudly).

Exactness identity worth testing (and tested): with context counts
defined as ``c1 = Σ_w2 c12(w1, w2)``, the smoothed numerators sum to
exactly the denominator over the vocabulary —
``Σ_{w2∈V} (c12·kd + kn) = c1·kd + kn·V`` in exact integers — i.e. the
model is a true conditional distribution, not approximately one.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import LOWER_TOKENS_SQL, TOKEN_SPLIT_RE, lower_tokens

# one million micro-units per nat, the BM25 quantum
_E6 = 1_000_000

_GRAMS_EXPR = (
    "case when size(__toks) >= 2 then "
    "transform(sequence(0, size(__toks) - 2), "
    "i -> struct(__toks[i] as w1, __toks[i + 1] as w2)) "
    "else array() end"
)
# training variant: every token emits a pair, the doc-final one with a
# NULL successor — so ONE explode yields both the bigram stream (w2 not
# null) and the full vocabulary (every token appears as w1)
_TRAIN_PAIRS_EXPR = (
    "case when size(__toks) >= 1 then "
    "transform(sequence(0, size(__toks) - 1), "
    "i -> struct(__toks[i] as w1, "
    "case when i < size(__toks) - 1 then __toks[i + 1] end as w2)) "
    "else array() end"
)


def _check_k(k_num: int, k_den: int) -> None:
    if not (isinstance(k_num, int) and isinstance(k_den, int)
            and k_num >= 1 and k_den >= 1):
        raise ValueError(
            f"smoothing k must be a positive rational k_num/k_den, "
            f"got {k_num}/{k_den}"
        )


def _tokens_col(text_col: str):
    return lower_tokens(F.col(text_col))


def lm_train_bigram(df: DataFrame, text_col: str) -> tuple[DataFrame, DataFrame, int]:
    """Train a word-bigram model from ``text_col``.

    Returns ``(bigrams, contexts, v)``: ``bigrams`` is
    ``(w1, w2, c12)``; ``contexts`` is ``(w1, c1)`` with
    ``c1 = Σ_w2 c12`` (the bigram-context count, NOT the raw unigram
    count — this is what makes the smoothed model sum to exactly 1 per
    context); ``v`` is the vocabulary size (distinct tokens over the
    full training token stream, so a word only ever seen in final
    position still counts). ONE pass over the text, literally: every
    token emits a (w1, successor-or-NULL) pair, so the same exploded
    stream feeds the bigram counts AND the vocabulary (each token
    appears as w1 exactly once per position, doc-final included); the
    O(distinct pairs) count frame is persisted MEMORY_AND_DISK because
    it feeds three consumers (bigrams, contexts, v). ``v`` is the
    single driver-side scalar (a bounded aggregate, same contract as
    heavy-hitters' N)."""
    pairs = (
        df.select(_tokens_col(text_col).alias("__toks"))
        .select(F.explode(F.expr(_TRAIN_PAIRS_EXPR)).alias("g"))
        .groupBy(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bigrams = pairs.where(F.col("w2").isNotNull())
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = pairs.agg(F.countDistinct("w1").alias("v")).collect()[0]["v"]
    if not v:
        raise ValueError("training corpus contains no tokens")
    return bigrams, contexts, int(v)


def _term_e6(c12, c1, v: int, k_num: int, k_den: int):
    """round(1e6·ln P) for one bigram — integer ops up to ONE double
    division, ONE ln; mirrored textually in :func:`lm_score_sql`."""
    num = (c12 * k_den + k_num).cast("double")
    den = (c1 * k_den + k_num * v).cast("double")
    return F.round(F.log(num / den) * _E6).cast("bigint")


def lm_score_bigram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bigrams: DataFrame,
    contexts: DataFrame,
    v: int,
    *,
    k_num: int = 1,
    k_den: int = 10,
) -> DataFrame:
    """Per-document negative log likelihood under the bigram model, in
    integer micro-nats.

    Output: ``(<id_col>, n_bigrams, nll_e6, nll_per_gram_e6)`` for
    EVERY input document — docs with <2 tokens get ``n_bigrams = 0``
    and zero scores rather than vanishing (the filter downstream must
    see them to reject them deliberately). ``nll_per_gram_e6`` is exact
    integer floor division, the per-token surprisal a perplexity cutoff
    thresholds on (CCNet keeps the low tail)."""
    _check_k(k_num, k_den)
    pre = (
        df.select(F.col(id_col), _tokens_col(text_col).alias("__toks"))
        .select(id_col, F.explode_outer(F.expr(_GRAMS_EXPR)).alias("g"))
        .groupBy(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    scored = (
        pre.join(contexts, "w1", "left")
        .join(bigrams, ["w1", "w2"], "left")
        .select(
            id_col,
            "cnt",
            F.when(
                F.col("w1").isNotNull(),
                _term_e6(
                    F.coalesce(F.col("c12"), F.lit(0)),
                    F.coalesce(F.col("c1"), F.lit(0)),
                    v, k_num, k_den,
                ),
            ).alias("q_e6"),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.coalesce(
            F.sum(F.when(F.col("q_e6").isNotNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_bigrams"),
        (-F.coalesce(F.sum(F.col("q_e6") * F.col("cnt")), F.lit(0))).alias("nll_e6"),
    )
    return out.select(
        id_col,
        "n_bigrams",
        "nll_e6",
        F.expr("nll_e6 div greatest(n_bigrams, 1)").alias("nll_per_gram_e6"),
    )


def lm_score_sql(
    *,
    train_where: str,
    score_from: str,
    id_col: str,
    text_col: str,
    k_num: int = 1,
    k_den: int = 10,
) -> str:
    """DuckDB recompute of train + score, generated here so the two
    formulations cannot drift (the pagerank/bloom pattern). Yields
    ``(<id_col>, n_bigrams, nll_e6, nll_per_gram_e6)``."""
    _check_k(k_num, k_den)
    return f"""
        with tr_toks as (
          select {LOWER_TOKENS_SQL.format(c=text_col)} as s
          from {score_from} where {train_where}
        ),
        tr_grams as (
          select s[i] as w1, s[i + 1] as w2
          from tr_toks, unnest(range(1, len(s))) as g(i)
        ),
        model as (select w1, w2, count(*) as c12 from tr_grams group by 1, 2),
        ctx as (select w1, sum(c12) as c1 from model group by 1),
        vocab as (
          select count(distinct w) as v
          from tr_toks, unnest(s) as t(w)
        ),
        sc_toks as (
          select {id_col}, {LOWER_TOKENS_SQL.format(c=text_col)} as s
          from {score_from}
        ),
        sc_pre as (
          select {id_col}, s[i] as w1, s[i + 1] as w2, count(*) as cnt
          from sc_toks, unnest(range(1, len(s))) as g(i)
          group by 1, 2, 3
        ),
        terms as (
          select p.{id_col}, p.cnt,
                 cast(round(ln(
                   (coalesce(m.c12, 0) * {k_den} + {k_num})::DOUBLE
                   / ((coalesce(c.c1, 0) * {k_den} + {k_num} * vocab.v))::DOUBLE
                 ) * {_E6}) as bigint) as q_e6
          from sc_pre p
          left join ctx c on p.w1 = c.w1
          left join model m on p.w1 = m.w1 and p.w2 = m.w2
          cross join vocab
        ),
        per_doc as (
          select t.{id_col},
                 coalesce(sum(t.cnt), 0)::BIGINT as n_bigrams,
                 (-coalesce(sum(t.q_e6 * t.cnt), 0))::BIGINT as nll_e6
          from terms t group by 1
        ),
        all_docs as (select {id_col} from {score_from})
        select a.{id_col},
               coalesce(p.n_bigrams, 0)::BIGINT as n_bigrams,
               coalesce(p.nll_e6, 0)::BIGINT as nll_e6,
               (coalesce(p.nll_e6, 0) // greatest(coalesce(p.n_bigrams, 0), 1))::BIGINT
                 as nll_per_gram_e6
        from all_docs a left join per_doc p using ({id_col})
    """


# --- driver-side reference (differential tests) ------------------------

def _tokens_py(text: str) -> list[str]:
    return [w for w in re.split(TOKEN_SPLIT_RE, (text or "").lower()) if w]


def lm_train_py(texts: Iterable[str]) -> tuple[Counter, Counter, int]:
    bigrams: Counter = Counter()
    vocab: set[str] = set()
    for t in texts:
        toks = _tokens_py(t)
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    contexts: Counter = Counter()
    for (a, _), c in bigrams.items():
        contexts[a] += c
    if not vocab:
        raise ValueError("training corpus contains no tokens")
    return bigrams, contexts, len(vocab)


def lm_score_py(
    text: str,
    bigrams: Counter,
    contexts: Counter,
    v: int,
    *,
    k_num: int = 1,
    k_den: int = 10,
) -> tuple[int, int, int]:
    """(n_bigrams, nll_e6, nll_per_gram_e6) — mirrors the Spark shape,
    including Java HALF_UP rounding (round half away from zero)."""
    toks = _tokens_py(text)
    n = 0
    nll = 0
    for a, b in zip(toks, toks[1:]):
        num = bigrams.get((a, b), 0) * k_den + k_num
        den = contexts.get(a, 0) * k_den + k_num * v
        x = math.log(num / den) * _E6
        # Java HALF_UP == away from zero; x <= 0 always (num <= den)
        q = math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
        n += 1
        nll -= q
    # nll >= 0 always, so truncating and flooring division agree
    return n, nll, nll // max(n, 1)


# --- Stupid Backoff trigram scoring (Brants et al. 2007) -------------------
# "Large Language Models in Machine Translation" — THE web-scale LM
# recipe: no discounting, no normalization, just raw relative
# frequencies with a fixed backoff penalty α = 0.4, chosen by Brants
# precisely because it needs nothing but count lookups (their model
# trained on 2T tokens). α = 0.4 = 2/5 EXACTLY, so every backoff branch
# stays a ratio of exact integers and the per-term score is the same
# one-division-one-ln quantization as the add-k bigram model above:
#   S(w3 | w1 w2) = c3/c2(w1,w2)            if c3 > 0
#                 = 0.4 · c2(w2,w3)/c1(w2)  elif c2(w2,w3) > 0
#                 = 0.16 · max(c1(w3),1)/N  otherwise (count clamp —
#                   the fixed total-scoring convention for unknowns)
# term_e6 = round(1e6·ln(1/S)) — numerator ≥ denominator in every
# branch, so the argument is ≥ 1 and HALF_UP has no sign branch. Only
# trigram positions score (docs with < 3 tokens emit a zero row).

SB_GRAMS_EXPR = (
    "case when size(__toks) >= 1 then "
    "transform(sequence(0, size(__toks) - 1), "
    "i -> struct(__toks[i] as w1, "
    "case when i + 1 < size(__toks) then __toks[i + 1] end as w2, "
    "case when i + 2 < size(__toks) then __toks[i + 2] end as w3)) "
    "else array() end"
)
_SB_SCORE_EXPR = (
    "case when size(__toks) >= 3 then "
    "transform(sequence(0, size(__toks) - 3), "
    "i -> struct(__toks[i] as w1, __toks[i + 1] as w2, __toks[i + 2] as w3)) "
    "else array() end"
)


def sb_train_trigram(df: DataFrame, text_col: str) -> tuple[DataFrame, int]:
    """Train the count tables: ONE explode over the corpus — every
    position emits (w1, w2-or-NULL, w3-or-NULL), so the single
    partially-aggregable ``groupBy(w1, w2, w3)`` frame feeds trigram,
    bigram AND unigram counts plus N (four consumers → persisted
    MEMORY_AND_DISK; model size O(distinct trigrams), never O(corpus)).
    Returns ``(grams, n_tokens)`` where ``grams`` is the persisted
    (w1, w2, w3, c) frame."""
    grams = (
        df.select(_tokens_col(text_col).alias("__toks"))
        .select(F.explode(F.expr(SB_GRAMS_EXPR)).alias("g"))
        .groupBy(
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = grams.agg(F.sum("c").alias("n")).collect()[0]["n"]
    if not n:
        raise ValueError("training corpus contains no tokens")
    return grams, int(n)


def sb_score_trigram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    grams: DataFrame,
    n_tokens: int,
) -> DataFrame:
    """Per-document Stupid Backoff score in integer micro-nats.

    Output: ``(<id_col>, n_terms, sb_nll_e6, per_term_e6, n_tri, n_bi,
    n_uni)`` for EVERY input document — the three branch counts make
    each backoff level a load-bearing output column (an oracle hash
    breaks if ANY branch routes differently). Scoring pre-aggregates
    the doc trigram stream to (doc, w1, w2, w3, cnt) map-side, then
    meets the derived count tables in four ordinary equi-joins (AQE
    broadcasts them at test scale; they degrade to shuffled joins at
    100 TB, still keyed on the distinct-gram frame, never the raw
    stream)."""
    tri = grams.where(F.col("w3").isNotNull()).select("w1", "w2", "w3", F.col("c").alias("c3"))
    big = (
        grams.where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("c").alias("c2"))
    )
    uni = grams.groupBy("w1").agg(F.sum("c").alias("c1"))
    pre = (
        df.select(F.col(id_col), _tokens_col(text_col).alias("__toks"))
        .select(id_col, F.explode_outer(F.expr(_SB_SCORE_EXPR)).alias("g"))
        .groupBy(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"), F.col("g.w3").alias("w3"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    j = (
        pre.join(tri, ["w1", "w2", "w3"], "left")
        .join(big.select(F.col("w1").alias("w1"), F.col("w2").alias("w2"), F.col("c2").alias("c2p")), ["w1", "w2"], "left")
        .join(big.select(F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c2").alias("c2b")), ["w2", "w3"], "left")
        .join(uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c1m")), ["w2"], "left")
        .join(uni.select(F.col("w1").alias("w3"), F.col("c1").alias("c1l")), ["w3"], "left")
    )
    c3 = F.coalesce(F.col("c3"), F.lit(0))
    c2b = F.coalesce(F.col("c2b"), F.lit(0))
    branch = F.when(c3 > 0, F.lit(0)).when(c2b > 0, F.lit(1)).otherwise(F.lit(2))
    num = (
        F.when(c3 > 0, F.col("c2p"))
        .when(c2b > 0, F.lit(5) * F.col("c1m"))
        .otherwise(F.lit(25) * F.lit(n_tokens))
    )
    den = (
        F.when(c3 > 0, c3)
        .when(c2b > 0, F.lit(2) * c2b)
        .otherwise(F.lit(4) * F.greatest(F.coalesce(F.col("c1l"), F.lit(0)), F.lit(1)))
    )
    term = F.round(F.log(num.cast("double") / den.cast("double")) * _E6).cast("bigint")
    scored = j.select(
        id_col,
        "cnt",
        F.when(F.col("w1").isNotNull(), term).alias("q_e6"),
        F.when(F.col("w1").isNotNull(), branch).alias("b"),
    )
    out = scored.groupBy(id_col).agg(
        F.coalesce(F.sum(F.when(F.col("q_e6").isNotNull(), F.col("cnt"))), F.lit(0)).alias("n_terms"),
        F.coalesce(F.sum(F.col("q_e6") * F.col("cnt")), F.lit(0)).alias("sb_nll_e6"),
        F.coalesce(F.sum(F.when(F.col("b") == 0, F.col("cnt"))), F.lit(0)).alias("n_tri"),
        F.coalesce(F.sum(F.when(F.col("b") == 1, F.col("cnt"))), F.lit(0)).alias("n_bi"),
        F.coalesce(F.sum(F.when(F.col("b") == 2, F.col("cnt"))), F.lit(0)).alias("n_uni"),
    )
    return out.select(
        id_col,
        F.col("n_terms").cast("bigint").alias("n_terms"),
        F.col("sb_nll_e6").cast("bigint").alias("sb_nll_e6"),
        F.expr("sb_nll_e6 div greatest(n_terms, 1)").cast("bigint").alias("per_term_e6"),
        F.col("n_tri").cast("bigint").alias("n_tri"),
        F.col("n_bi").cast("bigint").alias("n_bi"),
        F.col("n_uni").cast("bigint").alias("n_uni"),
    )


def sb_score_sql(
    *,
    train_where: str,
    score_from: str,
    id_col: str,
    text_col: str,
) -> str:
    """DuckDB recompute of Stupid Backoff train + score, generated here
    so the two formulations cannot drift. Same branch routing, same
    exact-rational numerators/denominators, same one-division-one-ln
    micro-nat quantization."""
    toks = LOWER_TOKENS_SQL.format(c=text_col)
    return f"""
        with sb_tr as (
          select {toks} as s from {score_from} where {train_where}
        ),
        sb_grams as (
          select s[i] as w1, s[i + 1] as w2, s[i + 2] as w3, count(*) as c
          from sb_tr, unnest(range(1, len(s) + 1)) as g(i)
          group by 1, 2, 3
        ),
        sb_tri as (
          select w1, w2, w3, c as c3 from sb_grams where w3 is not null
        ),
        sb_big as (
          select w1, w2, sum(c) as c2 from sb_grams
          where w2 is not null group by 1, 2
        ),
        sb_uni as (select w1, sum(c) as c1 from sb_grams group by 1),
        sb_n as (select sum(c) as n from sb_grams),
        sb_sc as (
          select {id_col}, {toks} as s from {score_from}
        ),
        sb_pre as (
          select {id_col}, s[i] as w1, s[i + 1] as w2, s[i + 2] as w3,
                 count(*) as cnt
          from sb_sc, unnest(range(1, len(s) - 1)) as g(i)
          group by 1, 2, 3, 4
        ),
        sb_terms as (
          select p.{id_col}, p.cnt,
                 case when coalesce(t.c3, 0) > 0 then 0
                      when coalesce(b2.c2, 0) > 0 then 1
                      else 2 end as b,
                 cast(round(ln(
                   (case when coalesce(t.c3, 0) > 0 then bp.c2
                         when coalesce(b2.c2, 0) > 0 then 5 * u1.c1
                         else 25 * sb_n.n end)::DOUBLE
                   / (case when coalesce(t.c3, 0) > 0 then t.c3
                           when coalesce(b2.c2, 0) > 0 then 2 * b2.c2
                           else 4 * greatest(coalesce(u2.c1, 0), 1)
                      end)::DOUBLE
                 ) * {_E6}) as bigint) as q_e6
          from sb_pre p
          left join sb_tri t on t.w1 = p.w1 and t.w2 = p.w2 and t.w3 = p.w3
          left join sb_big bp on bp.w1 = p.w1 and bp.w2 = p.w2
          left join sb_big b2 on b2.w1 = p.w2 and b2.w2 = p.w3
          left join sb_uni u1 on u1.w1 = p.w2
          left join sb_uni u2 on u2.w1 = p.w3
          cross join sb_n
        ),
        sb_doc as (
          select {id_col},
                 coalesce(sum(cnt), 0)::BIGINT as n_terms,
                 coalesce(sum(q_e6 * cnt), 0)::BIGINT as sb_nll_e6,
                 coalesce(sum(case when b = 0 then cnt end), 0)::BIGINT as n_tri,
                 coalesce(sum(case when b = 1 then cnt end), 0)::BIGINT as n_bi,
                 coalesce(sum(case when b = 2 then cnt end), 0)::BIGINT as n_uni
          from sb_terms group by 1
        ),
        sb_all as (select {id_col} from {score_from})
        select a.{id_col},
               coalesce(d.n_terms, 0)::BIGINT as n_terms,
               coalesce(d.sb_nll_e6, 0)::BIGINT as sb_nll_e6,
               (coalesce(d.sb_nll_e6, 0)
                  // greatest(coalesce(d.n_terms, 0), 1))::BIGINT
                 as per_term_e6,
               coalesce(d.n_tri, 0)::BIGINT as n_tri,
               coalesce(d.n_bi, 0)::BIGINT as n_bi,
               coalesce(d.n_uni, 0)::BIGINT as n_uni
        from sb_all a left join sb_doc d using ({id_col})
    """


def sb_train_py(texts: Iterable[str]) -> tuple[Counter, Counter, Counter, int]:
    """Reference trainer → (trigrams, bigrams, unigrams, n_tokens)."""
    tri: Counter = Counter()
    big: Counter = Counter()
    uni: Counter = Counter()
    n = 0
    for t in texts:
        toks = _tokens_py(t)
        n += len(toks)
        for w in toks:
            uni[w] += 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] += 1
    if not n:
        raise ValueError("training corpus contains no tokens")
    return tri, big, uni, n


def sb_score_py(
    text: str, tri: Counter, big: Counter, uni: Counter, n_tokens: int
) -> tuple[int, int, int, int, int, int]:
    """(n_terms, sb_nll_e6, per_term_e6, n_tri, n_bi, n_uni)."""
    toks = _tokens_py(text)
    n = nll = b0 = b1 = b2 = 0
    for a, b, c in zip(toks, toks[1:], toks[2:]):
        if tri.get((a, b, c), 0) > 0:
            num, den = big[(a, b)], tri[(a, b, c)]
            b0 += 1
        elif big.get((b, c), 0) > 0:
            num, den = 5 * uni[b], 2 * big[(b, c)]
            b1 += 1
        else:
            num, den = 25 * n_tokens, 4 * max(uni.get(c, 0), 1)
            b2 += 1
        x = math.log(num / den) * _E6
        nll += math.floor(x + 0.5)  # HALF_UP, x >= 0 (num >= den)
        n += 1
    return n, nll, nll // max(n, 1), b0, b1, b2


# --- CCNet head/middle/tail perplexity buckets --------------------------

def ppl_buckets(
    scored: DataFrame, group_col: str, score_col: str
) -> DataFrame:
    """CCNet's per-language perplexity terciles (Wenzek et al. 2020
    §4.3): within each ``group_col`` (language), split documents into
    ``head`` (lowest-perplexity third — the cleanest text), ``middle``,
    and ``tail`` by their integer ``score_col``. CCNet publishes the
    corpus in exactly these three shards so downstream consumers can
    trade quality against volume (head-only, head+middle, all).

    Exact-integer law, no corpus sort: build the per-group SCORE
    HISTOGRAM (one partially-aggregable count — a million identical
    boilerplate scores pre-reduce map-side), run the cumulative sum
    over each group's distinct scores only, and bucket a score group
    wholesale by its cumulative count: ``head`` while ``cum*3 <= n``,
    ``middle`` while ``cum*3 <= 2n``, else ``tail``. Ties move as one
    block (never split a score across buckets — CCNet's cut is a
    perplexity VALUE, not a row index), so ``|head| <= n/3`` and
    ``|head|+|middle| <= 2n/3`` exactly, with the straddling tie group
    pushed to the next bucket. The window sorts only the per-group
    distinct-score frame, O(groups × distinct integer scores) — at
    100 TB that is bounded by score cardinality (micro-nat per-gram
    surprisal), never by corpus rows; the assignment join back to the
    corpus is a (group, score)-keyed equi-join against that small
    frame (AQE broadcasts it at test scale).

    Input rows must have a meaningful score (callers route
    ``n_bigrams == 0`` docs to a ``none`` bucket themselves — scoring
    emits 0 for them, which would poison the head). Output: the input
    columns plus ``bucket``."""
    from pyspark.sql.window import Window

    hist = scored.groupBy(group_col, score_col).agg(
        F.count(F.lit(1)).alias("_hc")
    )
    cum = Window.partitionBy(group_col).orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(group_col)
    buckets = hist.select(
        group_col,
        score_col,
        F.sum("_hc").over(cum).alias("_cum"),
        F.sum("_hc").over(tot).alias("_n"),
    ).select(
        group_col,
        score_col,
        F.when(F.col("_cum") * 3 <= F.col("_n"), F.lit("head"))
        .when(F.col("_cum") * 3 <= F.col("_n") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    return scored.join(buckets, [group_col, score_col])


def ppl_buckets_sql(
    *, rel: str, group_col: str, score_col: str, cols: str
) -> str:
    """DuckDB recompute of :func:`ppl_buckets` (same histogram-CDF
    law; ``cols`` is the projected column list). Generated here so the
    two spellings cannot drift."""
    return f"""
        with _ppb_hist as (
          select {group_col} as g, {score_col} as s, count(*) as hc
          from {rel} group by 1, 2
        ),
        _ppb_cdf as (
          select g, s,
                 sum(hc) over (partition by g order by s
                               rows between unbounded preceding
                               and current row) as cum,
                 sum(hc) over (partition by g) as n
          from _ppb_hist
        ),
        _ppb_buckets as (
          select g, s,
                 case when cum * 3 <= n then 'head'
                      when cum * 3 <= n * 2 then 'middle'
                      else 'tail' end as bucket
          from _ppb_cdf
        )
        select {cols}, b.bucket
        from {rel} r
        join _ppb_buckets b
          on b.g = r.{group_col} and b.s = r.{score_col}
    """
