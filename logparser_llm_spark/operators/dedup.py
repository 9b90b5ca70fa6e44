"""Deduplication operators for training-data pipelines at corpus scale.

Five families, each a composition of built-in DataFrame ops (no Python in
the hot path; hashes are md5-based so DuckDB oracles can replicate them):

- **exact**: hash-groupBy on md5(text) — one shuffle, map-side combinable.
- **n-gram Jaccard**: shingle → explode → self-join on shingle →
  per-pair intersection counts → Jaccard. The join is the classic
  inverted-index candidate generation; a document-frequency cap drops
  ubiquitous shingles (boilerplate) that would otherwise quadratically
  blow up the hot keys — the explicit skew handling at 100 TB.
- **MinHash + LSH**: per-shingle hash family h_i = int(md5(i:shingle)[:8],16),
  signature = min per i; band keys bucket-join candidates so the
  self-join is on tiny equality keys instead of all-pairs.
- **SimHash**: 32-bit sign-of-weighted-bit-sums over token hashes; near
  dups = equal simhash (or small hamming distance via band rotation).
- **embedding cosine**: see similarity.py (shared kernels).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql import functions as F

from ..functions.text import shingles, ws_tokens


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative (min id) per distinct text. Output:
    (text_hash, rep_id, dup_count)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs, distinct per doc."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard ≥ threshold.

    Output: (id_a, id_b, jaccard) with id_a < id_b.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before the self-join (skew guard: a boilerplate shingle in 10^6
    docs would alone generate 10^12 candidate pairs).
    """
    sh = _distinct_shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_df).select("shingle")
        )
        sh = sh.join(F.broadcast(rare), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sz_b = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


MINHASH_PRIME = 2_147_483_647  # 2^31 − 1 (Mersenne prime)


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-family coefficients (aᵢ, bᵢ), derived from md5
    so Spark / DuckDB / Python all reproduce them. hᵢ(x) = (aᵢ·x + bᵢ)
    mod P over the base hash x = int(md5(shingle)[:8], 16) < 2³². The
    product aᵢ·x < 2³¹·2³² < 2⁶³ never overflows a signed 64-bit int.
    One md5 per shingle instead of ``num_hashes`` md5s — the hash family
    is integer arithmetic, which matters at 10¹²×shingles scale."""
    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:8], 16) % (MINHASH_PRIME - 1) + 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:8], 16) % MINHASH_PRIME
        out.append((a, b))
    return out


def _base_hash(shingle_col: Column) -> Column:
    """x = int(md5(shingle)[:8], 16) — portable across engines."""
    return F.conv(F.substring(F.md5(shingle_col), 1, 8), 16, 10).cast("bigint")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, n: int = 3
) -> DataFrame:
    """MinHash signatures: (doc_id, sig array<bigint>). Docs with no
    shingles are dropped. One md5 + ``num_hashes`` affine maps per
    distinct shingle; one shuffle (groupBy doc, map-side combinable)."""
    sh = _distinct_shingles(df, id_col, text_col, n).withColumn(
        "_x", _base_hash(F.col("shingle"))
    )
    coeffs = minhash_coeffs(num_hashes)
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("_x") + F.lit(b), F.lit(MINHASH_PRIME))).alias(f"h{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 band of their MinHash
    signature. Output: (id_a, id_b, shared_bands). The band bucket-join
    replaces the all-pairs comparison — candidates meet only inside
    equal (band_idx, band_key) buckets."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, n)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.md5(F.array_join(F.transform(F.slice("sig", bi * rows + 1, rows), lambda h: h.cast("string")), ",")).alias("band_key"),
        )
        for bi in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )


def simhash_col(text_col: Column, bits: int = 32) -> Column:
    """32-bit SimHash over whitespace tokens, all JVM-side:

    token → h = int(md5(token)[:8],16); bit b of the result is set iff
    Σ_tokens (±1 by bit b of h) ≥ 0. Empty docs → 0.
    """
    hashes = F.transform(
        ws_tokens(text_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
    )
    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda s, h: s
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        acc = acc + F.when(vote >= 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0))
    return F.when(F.size(ws_tokens(text_col)) > 0, acc).otherwise(F.lit(0))


def make_simhash_udf(bits: int = 32):
    """Arrow-batched numpy SimHash — identical semantics to
    :func:`simhash_col` (same md5-derived token hashes, same vote rule)
    but one vectorized pass per batch with a token-hash memo. The JVM
    version's 32 interpreted higher-order aggregates cost ~2ms/row; this
    is ~20-40× faster on wide corpora and is the scale path. Equality of
    the two is asserted in tests."""
    @pandas_udf("bigint")
    def _simhash(text: pd.Series) -> pd.Series:
        # local imports: the closure ships by value (cloudpickle), so
        # executors need no package on their PYTHONPATH
        import hashlib as _hl

        import numpy as np

        memo: dict[str, "np.ndarray"] = {}

        def token_bits(tok: str) -> "np.ndarray":
            v = memo.get(tok)
            if v is None:
                h = int(_hl.md5(tok.encode()).hexdigest()[:8], 16)
                v = np.array([1 if (h >> b) & 1 else -1 for b in range(bits)], dtype=np.int32)
                memo[tok] = v
            return v

        out = np.zeros(len(text), dtype=np.int64)
        weights = np.array([1 << b for b in range(bits)], dtype=np.int64)
        for i, t in enumerate(text):
            toks = [x for x in (t or "").strip().split(" ") if x]
            if not toks:
                continue
            votes = np.zeros(bits, dtype=np.int64)
            for tok in toks:
                votes += token_bits(tok)
            out[i] = int(weights[votes >= 0].sum())
        return pd.Series(out)

    return _simhash


def simhash_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group docs by identical SimHash: (simhash, rep_id, dup_count)."""
    return (
        df.select(simhash_col(F.col(text_col)).alias("simhash"), F.col(id_col))
        .groupBy("simhash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (brute-force
    self-join; see similarity.py for the LSH-bucketed scale path).
    Output: (id_a, id_b, cosine)."""
    from .similarity import cosine_expr

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
