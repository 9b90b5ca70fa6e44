"""Winnowing local fingerprints (Schleimer, Wilkerson & Aiken 2003 —
the MOSS algorithm): select, per document, the minimal k-gram hash in
every window of ``w`` consecutive k-grams. The selected (hash,
position) set is a *local* fingerprint with the paper's guarantee:
any substring match of length ≥ ``w + k - 1`` between two documents
shares at least one selected fingerprint, while the selected-set
density is ~2/(w+1) of all k-grams — the sub-sampling that makes
corpus-wide copy detection affordable where full-shingle indexes
(ngram_jaccard's candidate table) are not.

This complements the existing near-dup family (reference parity:
logparser_llm has only whole-template similarity,
utils/similarity.py): MinHash/SimHash estimate *global* set overlap;
winnowing finds *local* shared passages (quotes, boilerplate, partial
plagiarism) with positions.

Exactness across Spark/DuckDB/Python: the per-window argmin is a
single integer ``min`` over a packed key

    packed = h * POSCAP + (POSCAP - pos)        (all non-negative)

with ``h`` the first-8-hex-chars md5 slice (< 2^32, portable md5
family — never F.hash) and ``pos`` the 1-based k-gram start
(< POSCAP = 2^24, guarded). ``min(packed)`` picks the smallest hash
and, on hash ties, the RIGHTMOST position — the paper's robust-
winnowing tie rule — then decodes by floor division / modulo of
non-negative operands (identical in all three engines). No floats,
no engine-specific hash.

Scale shape: the k-gram explode is |corpus chars| rows (same class as
the minhash shingle explode); the sliding min is one window sort per
document — partition-parallel, no cross-document shuffle. Pair
finding joins fingerprints on the hash with a document-frequency cap
(``max_doc_freq``) exactly like ngram_jaccard's rare-shingle filter,
so bucket sizes are bounded and no hot boilerplate hash can produce a
quadratic bucket at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_slice_col, md5_slice_sql, md5_slice

HASH_HEX = 8  # h < 2^32
POSCAP = 1 << 24  # packed = h * POSCAP + (POSCAP - pos) stays < 2^56


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 12,
    w: int = 6,
    poscap: int = POSCAP,
) -> DataFrame:
    """Selected fingerprints ``(id, fp_h, fp_pos)`` per document.

    ``k`` is the character k-gram width, ``w`` the winnowing window in
    k-grams. Documents shorter than ``k + w - 1`` characters have no
    full window and yield no fingerprints (the paper's domain).
    Consecutive windows selecting the same (hash, position) collapse
    via ``distinct`` — that collapse IS the ~2/(w+1) density saving.
    A document with ≥ ``poscap`` k-grams (default ≈16.7M chars) raises
    loudly (``assert_true``) instead of silently corrupting the packed
    key; lowering ``poscap`` below the real bound is for guard tests
    only (the bigram_pmi ``nu_max`` precedent).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if not 2 <= poscap <= POSCAP:
        raise ValueError(f"poscap must be in 2..{POSCAP}")
    t = F.col(text_col)
    grams = F.expr(
        f"transform(sequence(1, greatest(char_length({text_col}) - {k - 1}, 0)),"
        f" i -> substring({text_col}, i, {k}))"
    )
    # ng is computed from char_length, NOT F.size(grams): the Generate
    # output row carries the pre-explode columns, and size(grams) after
    # posexplode re-evaluates the whole transform() array once per
    # generated row — O(n²) interpreted array construction per document
    # (measured 74s vs 0.9s on a 147k-gram corpus). The two spellings
    # are equal by construction under the char_length >= k filter.
    g = (
        df.where(F.char_length(t) >= k)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(grams).alias("pos0", "gram"),
            (F.char_length(t) - (k - 1)).cast("bigint").alias("ng"),
        )
        .select(
            "id",
            (F.col("pos0") + 1).alias("pos"),
            "ng",
            md5_slice_col(F.col("gram"), HASH_HEX).alias("h"),
        )
    )
    # guard woven into the kept packed key: assert_true yields NULL on
    # success (the bigram_pmi lesson — a dropped side column never runs)
    packed = F.when(
        F.expr(
            f"assert_true(ng < {poscap},"
            " 'winnow_fingerprints: document exceeds poscap k-grams')"
        ).isNull(),
        F.col("h") * poscap + (F.lit(poscap) - F.col("pos")),
    ).alias("p")
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    sel = (
        g.select("id", "pos", "ng", packed)
        .select("id", "pos", "ng", F.min("p").over(win).alias("mp"))
        # only full windows (window start fits w grams)
        .where(F.col("pos") <= F.col("ng") - w + 1)
    )
    return sel.select(
        "id",
        F.expr(f"mp div {poscap}").alias("fp_h"),
        (F.lit(poscap) - F.pmod(F.col("mp"), F.lit(poscap))).alias("fp_pos"),
    ).distinct()


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 12,
    w: int = 6,
    min_shared: int = 2,
    max_doc_freq: int = 8,
    topk: int = 100,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` selected fingerprint
    hashes — the MOSS report row ``(doc1, doc2, shared_fp)``.

    Fingerprint hashes appearing in more than ``max_doc_freq``
    documents (boilerplate) are dropped BEFORE the pair join, bounding
    every join bucket at ``max_doc_freq`` rows — the same rare-filter
    trade ngram_jaccard makes, and the reason this survives a 100 TB
    corpus where hot boilerplate would otherwise square.

    The fingerprint frame is consumed by three branches (doc-frequency
    count, the join's left side, the join's right side); without an
    explicit persist Catalyst re-evaluates the explode+window subtree
    in every branch (the ngram_jaccard lesson, dedup.py:100). ``fps``
    and ``kept`` are persisted MEMORY_AND_DISK; the cache is left to
    Spark's LRU eviction — the result is lazy, so there is no safe
    point to unpersist inside this function.
    """
    from pyspark import StorageLevel

    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    if max_doc_freq < 2:
        raise ValueError(f"max_doc_freq must be >= 2, got {max_doc_freq}")
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    fps = (
        winnow_fingerprints(df, id_col, text_col, k=k, w=w)
        .select("id", "fp_h")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rare = (
        fps.groupBy("fp_h")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .where(F.col("dfreq") <= max_doc_freq)
        .select("fp_h")
    )
    kept = fps.join(rare, "fp_h").persist(StorageLevel.MEMORY_AND_DISK)
    a = kept.select(F.col("fp_h"), F.col("id").alias("doc1"))
    b = kept.select(F.col("fp_h"), F.col("id").alias("doc2"))
    pairs = (
        a.join(b, "fp_h")
        .where(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
        .where(F.col("shared_fp") >= min_shared)
    )
    return pairs.orderBy(
        F.col("shared_fp").desc(), F.col("doc1"), F.col("doc2")
    ).limit(topk)


def winnow_fingerprints_sql(
    *, docs: str, id_col: str, text_col: str, k: int = 12, w: int = 6
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (generated here so
    the two spellings cannot drift)."""
    h = md5_slice_sql(f"substr(t, pos, {k})", HASH_HEX)
    return f"""
        with g as (
          select {id_col} as id, {text_col} as t,
                 unnest(generate_series(1, length({text_col}) - {k - 1}))
                   as pos,
                 (length({text_col}) - {k - 1})::BIGINT as ng
          from {docs}
          where length({text_col}) >= {k}
        ),
        hashed as (
          select id, pos, ng, ({h}) as h from g
        ),
        packed as (
          select id, pos, ng,
                 h * {POSCAP} + ({POSCAP} - pos) as p
          from hashed
        ),
        sel as (
          select id, pos, ng,
                 min(p) over (partition by id order by pos
                              rows between current row and {w - 1} following)
                   as mp
          from packed
        )
        select distinct id,
               (mp // {POSCAP})::BIGINT as fp_h,
               ({POSCAP} - (mp % {POSCAP}))::BIGINT as fp_pos
        from sel where pos <= ng - {w} + 1
    """


def winnow_pairs_sql(
    *,
    docs: str,
    id_col: str,
    text_col: str,
    k: int = 12,
    w: int = 6,
    min_shared: int = 2,
    max_doc_freq: int = 8,
    topk: int = 100,
) -> str:
    """DuckDB twin of :func:`winnow_pairs`."""
    fp = winnow_fingerprints_sql(
        docs=docs, id_col=id_col, text_col=text_col, k=k, w=w
    )
    return f"""
        with fp_full as ({fp}),
        fps as (select distinct id, fp_h from fp_full),
        rare as (
          select fp_h from fps group by fp_h
          having count(*) <= {max_doc_freq}
        ),
        kept as (select fps.id, fps.fp_h from fps join rare using (fp_h))
        select a.id as doc1, b.id as doc2,
               count(*)::BIGINT as shared_fp
        from kept a join kept b
          on a.fp_h = b.fp_h and a.id < b.id
        group by 1, 2
        having count(*) >= {min_shared}
        order by shared_fp desc, doc1, doc2
        limit {topk}
    """


def winnow_py(text: str, *, k: int = 12, w: int = 6) -> set[tuple[int, int]]:
    """Driver-side reference for :func:`winnow_fingerprints`
    (differential tests): same hashes, same packed-argmin tie rule."""
    n = len(text) - (k - 1)
    if n < w:
        return set()
    hs = [md5_slice(text[i : i + k], HASH_HEX) for i in range(n)]
    out: set[tuple[int, int]] = set()
    for start in range(n - w + 1):
        best = min(
            hs[start + j] * POSCAP + (POSCAP - (start + j + 1))
            for j in range(w)
        )
        out.add((best // POSCAP, POSCAP - best % POSCAP))
    return out
