"""Prefix-filtering set-similarity join (the All-Pairs / PPJoin
candidate rule — Bayardo, Ma & Srikant, WWW 2007; Xiao et al.,
WWW 2008): exact word-set Jaccard-threshold pairs where candidate
generation joins ONLY each document's rarest-token prefix instead of
every shared token.

This is the third — and at extreme corpus sizes the strongest —
candidate-generation algebra in the repo's near-dup family, next to
``ngram_jaccard_pairs`` (full shingle intersection with a hot-shingle
df cap) and ``minhash_lsh_pairs`` (probabilistic banding):

* order all tokens globally by (document frequency ASC, token ASC) —
  a deterministic total order with the rarest tokens first;
* per document of size ``a``, keep the first
  ``p = a - ceil(t*a) + 1`` tokens of that order as its *prefix*;
* candidates = pairs sharing ≥1 PREFIX token (plus the length filter
  ``t*max(a,b) <= min(a,b)``), verified exactly afterwards.

Completeness (why this loses NOTHING, unlike a df cap or LSH): if
J(x, y) >= t then o = |x∩y| >= t*max(|x|,|y|), so with
alpha = ceil(t*max(|x|,|y|)) the smallest common token c (global
order) must sit within the first |x| - alpha + 1 tokens of x — were
it deeper, the o >= alpha common tokens (all >= c) would have to fit
in the alpha - 1 slots behind it — and symmetrically within y's
first |y| - alpha + 1. Both windows are subsets of the kept
``a - ceil(t*a) + 1`` prefixes (alpha >= ceil(t*a) per side), so the
prefix join emits every qualifying pair; exact verification then
makes precision 1. The oracle therefore needs no slack: it is the
naive every-shared-token candidate rule with the same verify — an
independent algebra whose agreement checks the prefix lemma itself.

Scale shape: the prefix join's buckets are the corpus's RAREST
tokens by construction — the global frequency order is the skew
guard (a boilerplate token that floods ngram_jaccard's candidate
table never enters a prefix unless a document consists of almost
nothing else). Candidate volume scales with the number of
low-df-token collisions, not with corpus size squared; the verify
join touches only surviving candidate ids. Everything is
equi-join + groupBy — no window over the corpus except the per-doc
rank (partition-parallel), no Python, no cartesian.

Cross-engine exactness: the threshold test is the integer cross-
multiplication ``t_den*inter >= t_num*(size_a+size_b-inter)`` and the
reported score ``jaccard_e6`` is a floor division of non-negative
bigints — identical in Spark, DuckDB and Python (no float compare
anywhere). The tokenizer is the single-sourced lowercase alphanumeric
family (``functions.text.lower_tokens`` / ``LOWER_TOKENS_SQL``), so
this oracle cannot drift from the lm/bm25/dsir consumers.

Reference parity note: the reference's only similarity surface is
whole-template 0.7/0.3 scoring (logparser_llm/utils/similarity.py);
corpus-scale set-similarity join is part of the training-data
pipeline surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import LOWER_TOKENS_SQL, lower_tokens

E6 = 1_000_000


def _validate(t_num: int, t_den: int) -> None:
    if not (isinstance(t_num, int) and isinstance(t_den, int)):
        raise ValueError("threshold must be an exact rational t_num/t_den")
    if not 1 <= t_num <= t_den:
        raise ValueError(
            f"threshold t_num/t_den must satisfy 0 < t_num/t_den <= 1, "
            f"got {t_num}/{t_den}"
        )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """Exact word-set Jaccard >= t_num/t_den pairs via prefix filtering.

    Output: (id_a, id_b, inter, size_a, size_b, jaccard_e6) with
    id_a < id_b, sizes/intersection over DISTINCT lowercase
    alphanumeric tokens, and ``jaccard_e6 = (1e6*inter) div union``
    (exact bigint floor). Pairs are exact — the prefix join is a
    complete candidate rule (module docstring), and every candidate is
    re-verified against the full token sets.

    The token frame feeds four branches (df counts, sizes, prefix
    ranking, both verify sides); like ``ngram_jaccard_pairs`` it is
    persisted MEMORY_AND_DISK so Catalyst materializes the scan +
    explode + distinct once, not per branch (plan-gated in tests).
    Candidates are persisted too (length filter + verify both read
    them). Caches are left to LRU eviction — the result is lazy.
    """
    from pyspark import StorageLevel

    _validate(t_num, t_den)
    tok = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(lower_tokens(F.col(text_col))).alias("token"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("size"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))

    # per-doc global-order rank; prefix length p = a - ceil(t*a) + 1
    # with ceil(t*a) = (t_num*a + t_den - 1) div t_den (exact integers)
    w = Window.partitionBy("doc_id").orderBy("tdf", "token")
    ranked = (
        tok.join(dfreq, "token")
        .join(sizes, "doc_id")
        .select(
            "doc_id",
            "token",
            "size",
            F.row_number().over(w).alias("pos"),
        )
    )
    ceil_ta = F.expr(
        f"(cast({t_num} as bigint) * size + {t_den - 1}) div {t_den}"
    )
    prefix = ranked.where(
        F.col("pos") <= F.col("size") - ceil_ta + F.lit(1)
    ).select("doc_id", "token", "size")

    pa = prefix.select(
        F.col("doc_id").alias("id_a"),
        "token",
        F.col("size").alias("size_a"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("id_b"),
        "token",
        F.col("size").alias("size_b"),
    )
    cand = (
        pa.join(pb, "token")
        .where(F.col("id_a") < F.col("id_b"))
        # length filter: J <= min/max, so t*max(a,b) <= min(a,b) must hold
        .where(
            F.lit(t_den) * F.least("size_a", "size_b")
            >= F.lit(t_num) * F.greatest("size_a", "size_b")
        )
        .select("id_a", "id_b", "size_a", "size_b")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    fa = tok.select(F.col("doc_id").alias("id_a"), "token")
    fb = tok.select(F.col("doc_id").alias("id_b"), "token")
    inter = (
        cand.select("id_a", "id_b")
        .join(fa, "id_a")
        .join(fb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    return (
        cand.join(inter, ["id_a", "id_b"])
        .where(F.lit(t_den) * F.col("inter") >= F.lit(t_num) * union)
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            F.expr(
                f"cast({E6} * inter as bigint) div "
                "(size_a + size_b - inter)"
            ).alias("jaccard_e6"),
        )
    )


def prefix_filter_pairs_sql(
    docs: str,
    id_col: str,
    text_col: str,
    *,
    t_num: int,
    t_den: int,
) -> str:
    """DuckDB mirror of :func:`prefix_filter_pairs` via the NAIVE
    candidate rule (every shared token, no prefix, no length filter) +
    the same exact verify — a deliberately independent algebra, so
    agreement validates the prefix-completeness lemma rather than
    restating it. Same single-sourced tokenizer, same integer
    threshold cross-multiplication, same bigint floor score."""
    _validate(t_num, t_den)
    toks = LOWER_TOKENS_SQL.format(c=text_col)
    return f"""
    with tok as (
      select distinct {id_col} as doc_id, unnest({toks}) as token
      from {docs}
    ),
    sizes as (select doc_id, count(*) as size from tok group by doc_id),
    inter as (
      select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
      from tok a join tok b using (token)
      where a.doc_id < b.doc_id
      group by 1, 2
    )
    select id_a, id_b,
           cast(inter as bigint) as inter,
           cast(sa.size as bigint) as size_a,
           cast(sb.size as bigint) as size_b,
           cast(({E6} * inter) // (sa.size + sb.size - inter) as bigint)
             as jaccard_e6
    from inter
    join sizes sa on sa.doc_id = id_a
    join sizes sb on sb.doc_id = id_b
    where {t_den} * inter >= {t_num} * (sa.size + sb.size - inter)
    """


def prefix_filter_pairs_py(
    rows: list[tuple], *, t_num: int, t_den: int
) -> list[tuple]:
    """Single-threaded brute-force reference: (id, text) rows →
    sorted (id_a, id_b, inter, size_a, size_b, jaccard_e6)."""
    import re

    _validate(t_num, t_den)
    sets = {
        i: {t for t in re.split("[^a-z0-9]+", s.lower()) if t}
        for i, s in rows
    }
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            o = len(sa & sb)
            u = len(sa) + len(sb) - o
            if t_den * o >= t_num * u:
                out.append((a, b, o, len(sa), len(sb), E6 * o // u))
    return sorted(out)


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """Exact set-CONTAINMENT join: ordered pairs (id_a, id_b) with
    C(a→b) = |a∩b| / |a| >= t_num/t_den — "document a is (mostly)
    contained in document b". The asymmetric sibling of
    :func:`prefix_filter_pairs`: a short page quoted wholesale inside a
    long wrapper page has J ≈ |a|/|b| (arbitrarily small) but C = 1 —
    Jaccard-threshold dedup structurally cannot see it (Broder's
    resemblance-vs-containment distinction, SEQUENCES '97). The classic
    web cases: syndicated articles inside portal shells, quoted posts
    in forum threads, boilerplate-wrapped mirrors.

    Output: (id_a, id_b, inter, size_a, size_b, containment_e6) with
    id_a ≠ id_b (ordered: a is the contained side), sizes over DISTINCT
    lowercase alphanumeric tokens, ``containment_e6 = (1e6*inter) div
    size_a`` (exact bigint floor).

    Candidate rule — one-sided prefix filtering: order tokens globally
    by (df ASC, token ASC); with α = ceil(t·a), any qualifying pair has
    inter ≥ α, so a's smallest common token must sit within a's first
    ``a − α + 1`` tokens (were it deeper, the ≥ α common tokens would
    have to fit in the α − 1 slots behind it). The CONTAINED side
    therefore probes with its prefix only, while the container side is
    probed on ALL its tokens — containment gives no bound on where the
    common tokens fall in b's order (b may be arbitrarily large), so a
    symmetric prefix would lose recall. Plus the size filter
    ``t·a <= b`` (b must hold at least α ≥ t·a common tokens). Exact
    verification then makes precision 1; the oracle is the naive
    every-shared-token algebra, so agreement checks the one-sided
    lemma itself.

    Scale shape: a-side buckets are rare-token prefixes (the same skew
    guard as the Jaccard join); the b side is full token lists, so a
    corpus-wide stopword costs df_B(token) × (a-prefixes containing
    it) — and a stopword enters an a-prefix only when a consists of
    almost nothing else. Everything is equi-join + groupBy; tok and
    cand persist MEMORY_AND_DISK for their multi-branch reuse."""
    from pyspark import StorageLevel

    _validate(t_num, t_den)
    tok = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(lower_tokens(F.col(text_col))).alias("token"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("size"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))

    w = Window.partitionBy("doc_id").orderBy("tdf", "token")
    ranked = (
        tok.join(dfreq, "token")
        .join(sizes, "doc_id")
        .select(
            "doc_id", "token", "size", F.row_number().over(w).alias("pos")
        )
    )
    ceil_ta = F.expr(
        f"(cast({t_num} as bigint) * size + {t_den - 1}) div {t_den}"
    )
    prefix = ranked.where(
        F.col("pos") <= F.col("size") - ceil_ta + F.lit(1)
    ).select("doc_id", "token", "size")

    pa = prefix.select(
        F.col("doc_id").alias("id_a"), "token", F.col("size").alias("size_a")
    )
    fb_sized = tok.join(sizes, "doc_id").select(
        F.col("doc_id").alias("id_b"), "token", F.col("size").alias("size_b")
    )
    cand = (
        pa.join(fb_sized, "token")
        .where(F.col("id_a") != F.col("id_b"))
        # size filter: inter >= ceil(t*a) tokens must fit inside b
        .where(F.lit(t_den) * F.col("size_b") >= F.lit(t_num) * F.col("size_a"))
        .select("id_a", "id_b", "size_a", "size_b")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    fa = tok.select(F.col("doc_id").alias("id_a"), "token")
    fb = tok.select(F.col("doc_id").alias("id_b"), "token")
    inter = (
        cand.select("id_a", "id_b")
        .join(fa, "id_a")
        .join(fb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        cand.join(inter, ["id_a", "id_b"])
        .where(F.lit(t_den) * F.col("inter") >= F.lit(t_num) * F.col("size_a"))
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            F.expr(f"cast({E6} * inter as bigint) div size_a").alias(
                "containment_e6"
            ),
        )
    )


def containment_pairs_sql(
    docs: str,
    id_col: str,
    text_col: str,
    *,
    t_num: int,
    t_den: int,
) -> str:
    """DuckDB mirror of :func:`containment_pairs` via the NAIVE
    candidate rule (every shared token, both directions, no prefix, no
    size filter) + the same exact verify — a deliberately independent
    algebra validating the one-sided prefix lemma."""
    _validate(t_num, t_den)
    toks = LOWER_TOKENS_SQL.format(c=text_col)
    return f"""
    with tok as (
      select distinct {id_col} as doc_id, unnest({toks}) as token
      from {docs}
    ),
    sizes as (select doc_id, count(*) as size from tok group by doc_id),
    inter as (
      select a.doc_id as id_a, b.doc_id as id_b, count(*) as inter
      from tok a join tok b using (token)
      where a.doc_id <> b.doc_id
      group by 1, 2
    )
    select id_a, id_b,
           cast(inter as bigint) as inter,
           cast(sa.size as bigint) as size_a,
           cast(sb.size as bigint) as size_b,
           cast(({E6} * inter) // sa.size as bigint) as containment_e6
    from inter
    join sizes sa on sa.doc_id = id_a
    join sizes sb on sb.doc_id = id_b
    where {t_den} * inter >= {t_num} * sa.size
    """


def containment_pairs_py(
    rows: list[tuple], *, t_num: int, t_den: int
) -> list[tuple]:
    """Single-threaded brute-force reference: (id, text) rows →
    sorted (id_a, id_b, inter, size_a, size_b, containment_e6)."""
    import re

    _validate(t_num, t_den)
    sets = {
        i: {t for t in re.split("[^a-z0-9]+", s.lower()) if t}
        for i, s in rows
    }
    out = []
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa or not sb:
                continue
            o = len(sa & sb)
            if t_den * o >= t_num * len(sa):
                out.append((a, b, o, len(sa), len(sb), E6 * o // len(sa)))
    return sorted(out)
