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
