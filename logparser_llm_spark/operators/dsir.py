"""DSIR — data selection via importance resampling (Xie et al. 2023,
NeurIPS: select raw web documents whose hashed n-gram profile looks like
a trusted target corpus). The published recipe behind "sample the
Pile/CC down to something Wikipedia-shaped" and a standard stage in
LLM-training-data pipelines.

The reference engine has no selection surface; this sits in the repo's
beyond-reference training-data tier next to the CCNet LM filter
(operators/lm.py) and the quota mixer (operators/sampling.py).

Method (deterministic spelling of the paper):

1. **Hashed n-gram features** — unigrams + space-joined bigrams of the
   lowercased token stream, each hashed into one of ``buckets`` feature
   buckets via THE portable md5 bucket (functions/hashing.py), counted
   per document. Collisions are part of the method (the paper uses
   10k buckets for the open web; tests use fewer so collisions occur).
2. **Two bag-of-buckets models** — target p (the trusted subset) and
   raw q (the full pool being scored), each a bucket-count distribution
   with rational add-k smoothing, exactly the lm.py convention:
   ``P(b) = (c_b·kd + kn) / (T·kd + kn·B)`` is a ratio of exact
   integers, and Σ_{b∈[0,B)} P(b) = 1 exactly (tested as an integer
   identity).
3. **Importance weight** — per bucket the log ratio quantized to
   integer micro-nats BEFORE the per-doc sum:
   ``λ_e6(b) = round(1e6·ln p(b)) − round(1e6·ln q(b))``; per document
   ``weight_e6 = Σ_features cnt·λ_e6(bucket)`` — an order-free integer
   sum, so the DuckDB oracle (generated here, the pagerank/bloom/lm
   pattern) is hash-exact up to the ≤1-ulp libm-vs-JVM ``ln`` caveat
   documented in ranking.py.
4. **Selection** — the paper resamples ∝ weight with Gumbel noise; the
   deterministic engine spelling is a threshold keep (``weight_e6 ≥
   cutoff`` — a pure map, zero extra shuffle). At 100 TB the cutoff for
   a target budget comes from a quantile (operators/sketch.py
   loghist_*) or a distributed range sort; a global rank window would
   be a single-partition scale bug and is deliberately absent.

Scale shape (the part that must survive 100 TB):

- ONE token explode over the pool feeds EVERYTHING: the per-doc feature
  frame ``(id, bucket, cnt)`` is a partially-aggregable groupBy, and
  both models, both totals, and the scoring sum all derive from that
  frame (persisted MEMORY_AND_DISK across its four consumers —
  plan-gated; the raw text is scanned exactly once).
- Model frames are ≤ ``buckets`` rows — broadcast-sized by
  construction; the scoring join touches the distinct (doc, bucket)
  frame, never the raw gram stream.
- No UDF anywhere; gram construction is a JVM ``transform(sequence)``
  expression inside whole-stage codegen.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.hashing import md5_bucket, md5_bucket_col, md5_bucket_sql
from ..functions.text import LOWER_TOKENS_SQL, TOKEN_SPLIT_RE, lower_tokens

_E6 = 1_000_000
_MAX_BUCKETS = 10_000_000

# unigrams ++ space-joined bigrams, one array expression
_GRAMS_EXPR = (
    "concat(__toks, case when size(__toks) >= 2 then "
    "transform(sequence(0, size(__toks) - 2), "
    "i -> concat(__toks[i], ' ', __toks[i + 1])) "
    "else array() end)"
)


def _check_params(buckets: int, k_num: int, k_den: int) -> None:
    if not (isinstance(buckets, int) and 2 <= buckets <= _MAX_BUCKETS):
        raise ValueError(f"buckets must be an int in [2, {_MAX_BUCKETS}], got {buckets}")
    if not (isinstance(k_num, int) and isinstance(k_den, int)
            and k_num >= 1 and k_den >= 1):
        raise ValueError(
            f"smoothing k must be a positive rational k_num/k_den, "
            f"got {k_num}/{k_den}"
        )


def dsir_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Hashed n-gram feature counts: ``(<id_col>, *carry, bucket, cnt)``.

    ``carry`` columns ride through the groupBy key (they must be
    functionally dependent on the id — e.g. a target-membership flag).
    Documents with zero tokens emit no rows; callers re-attach them via
    a left join (the lm.py convention, and what :func:`dsir_sql` does).
    """
    _check_params(buckets, 1, 1)
    clash = {"bucket", "cnt"} & ({id_col} | set(carry))
    if clash:
        raise ValueError(f"reserved output column name(s) in id/carry: {sorted(clash)}")
    toks = lower_tokens(F.col(text_col))
    return (
        df.select(F.col(id_col), *[F.col(c) for c in carry], toks.alias("__toks"))
        .select(id_col, *carry, F.explode(F.expr(_GRAMS_EXPR)).alias("__gram"))
        .groupBy(id_col, *carry, md5_bucket_col(F.col("__gram"), buckets).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _logp_e6(c, t: int, buckets: int, k_num: int, k_den: int) -> Column:
    """round(1e6·ln P(b)) for one smoothed bucket probability — integer
    ops up to ONE double division + ONE ln; mirrored textually in
    :func:`dsir_sql` (`_logp_e6_sql`)."""
    num = (c * k_den + k_num).cast("double")
    den = float(t * k_den + k_num * buckets)
    return F.round(F.log(num / F.lit(den)) * _E6).cast("bigint")


def dsir_weights(
    feats: DataFrame,
    id_col: str,
    *,
    target: Column,
    buckets: int,
    k_num: int = 1,
    k_den: int = 2,
) -> DataFrame:
    """Per-document importance weight: ``(<id_col>, n_feats, weight_e6)``
    for every document that has ≥1 feature (zero-token docs are absent
    here; the query layer re-attaches them with zeros).

    ``target`` is a boolean Column over ``feats`` (typically a carried
    flag or a predicate on the id) naming the trusted subset; the raw
    model q is the WHOLE feature pool — scoring the pool against itself
    is the in-corpus spelling of the paper's raw distribution.
    """
    _check_params(buckets, k_num, k_den)
    # four consumers of the one text scan: tq/tp totals, cq, cp, scoring
    feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
    tot = feats.agg(
        F.sum("cnt").alias("tq"),
        F.sum(F.when(target, F.col("cnt"))).alias("tp"),
    ).collect()[0]
    tq, tp = tot["tq"], tot["tp"]
    if not tq:
        raise ValueError("feature pool is empty")
    if not tp:
        raise ValueError("target subset contains no features")
    cq = feats.groupBy("bucket").agg(F.sum("cnt").alias("cq"))
    cp = feats.where(target).groupBy("bucket").agg(F.sum("cnt").alias("cp"))
    lam = (
        cq.join(cp, "bucket", "left")
        .select(
            "bucket",
            (
                _logp_e6(F.coalesce(F.col("cp"), F.lit(0)), int(tp),
                         buckets, k_num, k_den)
                - _logp_e6(F.col("cq"), int(tq), buckets, k_num, k_den)
            ).alias("lam_e6"),
        )
    )
    # every feature bucket occurs in cq by construction → inner join
    return (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("lam_e6")).alias("weight_e6"),
        )
    )


# --- oracle ------------------------------------------------------------

def _logp_e6_sql(c_expr: str, t_expr: str, buckets: int, k_num: int, k_den: int) -> str:
    return (
        f"cast(round(ln(({c_expr} * {k_den} + {k_num})::DOUBLE"
        f" / ({t_expr} * {k_den} + {k_num} * {buckets})::DOUBLE) * {_E6})"
        " as bigint)"
    )


def dsir_sql(
    *,
    score_from: str,
    id_col: str,
    text_col: str,
    target_where: str,
    buckets: int,
    k_num: int = 1,
    k_den: int = 2,
) -> str:
    """DuckDB recompute of features + models + weights, generated here
    so the two formulations cannot drift (the lm/pagerank pattern).
    Yields ``(<id_col>, n_feats, weight_e6)`` for EVERY row of
    ``score_from`` (zero-token docs carry zeros)."""
    _check_params(buckets, k_num, k_den)
    bucket = md5_bucket_sql("w", buckets)
    return f"""
        with toks as (
          select {id_col}, ({target_where}) as is_t,
                 {LOWER_TOKENS_SQL.format(c=text_col)} as s
          from {score_from}
        ),
        grams as (
          select {id_col}, is_t, w from toks, unnest(s) as t(w)
          union all
          select {id_col}, is_t, s[i] || ' ' || s[i + 1] as w
          from toks, unnest(range(1, len(s))) as g(i)
        ),
        feats as (
          select {id_col}, is_t, {bucket} as bucket, count(*) as cnt
          from grams group by 1, 2, 3
        ),
        tot as (
          select sum(cnt) as tq,
                 coalesce(sum(cnt) filter (where is_t), 0) as tp
          from feats
        ),
        cq as (select bucket, sum(cnt) as cq from feats group by 1),
        cp as (select bucket, sum(cnt) as cp from feats where is_t group by 1),
        lam as (
          select cq.bucket,
                 {_logp_e6_sql('coalesce(cp.cp, 0)', 'tot.tp', buckets, k_num, k_den)}
               - {_logp_e6_sql('cq.cq', 'tot.tq', buckets, k_num, k_den)} as lam_e6
          from cq left join cp on cq.bucket = cp.bucket cross join tot
        ),
        per_doc as (
          select f.{id_col},
                 sum(f.cnt)::BIGINT as n_feats,
                 sum(f.cnt * l.lam_e6)::BIGINT as weight_e6
          from feats f join lam l on f.bucket = l.bucket
          group by 1
        )
        select a.{id_col},
               coalesce(p.n_feats, 0)::BIGINT as n_feats,
               coalesce(p.weight_e6, 0)::BIGINT as weight_e6
        from {score_from} a left join per_doc p using ({id_col})
    """


# --- driver-side reference (differential tests) ------------------------

def _grams_py(text: str) -> list[str]:
    toks = [w for w in re.split(TOKEN_SPLIT_RE, (text or "").lower()) if w]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _logp_e6_py(c: int, t: int, buckets: int, k_num: int, k_den: int) -> int:
    x = math.log((c * k_den + k_num) / (t * k_den + k_num * buckets)) * _E6
    # Java HALF_UP == away from zero
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def dsir_py(
    rows: Iterable[tuple[object, str, bool]],
    *,
    buckets: int,
    k_num: int = 1,
    k_den: int = 2,
) -> dict[object, tuple[int, int]]:
    """Reference recompute over ``(id, text, is_target)`` rows →
    ``{id: (n_feats, weight_e6)}`` (every id present, zeros included).
    Mirrors the Spark shape including HALF_UP quantization."""
    _check_params(buckets, k_num, k_den)
    cq: Counter = Counter()
    cp: Counter = Counter()
    per_doc: dict[object, Counter] = {}
    for i, text, is_t in rows:
        c = Counter(md5_bucket(g, buckets) for g in _grams_py(text))
        per_doc[i] = c
        cq.update(c)
        if is_t:
            cp.update(c)
    tq, tp = sum(cq.values()), sum(cp.values())
    if not tq:
        raise ValueError("feature pool is empty")
    if not tp:
        raise ValueError("target subset contains no features")
    lam = {
        b: _logp_e6_py(cp.get(b, 0), tp, buckets, k_num, k_den)
        - _logp_e6_py(cq[b], tq, buckets, k_num, k_den)
        for b in cq
    }
    return {
        i: (sum(c.values()), sum(n * lam[b] for b, n in c.items()))
        for i, c in per_doc.items()
    }
