"""Tests for the dedup family: exact, n-gram Jaccard, MinHash LSH,
SimHash, embedding cosine."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_col,
    simhash_dedup,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat near the river bank"),  # near dup of 0
    (3, "completely different content about database query optimization plans"),
    (4, "another unrelated text mentioning spark partitions and shuffle behavior"),
    (5, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup of 0
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string").cache()


def test_dedup_exact(spark, docs):
    out = dedup_exact(docs, "doc_id", "text").collect()
    assert len(out) == 5  # 6 docs, one exact pair
    by_rep = {r["rep_id"]: r["dup_count"] for r in out}
    assert by_rep[0] == 2  # doc 0 represents {0,1}
    assert by_rep[2] == 1


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 5) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_ngram_jaccard_df_cap_drops_common_shingles(spark, docs):
    # cap=1 keeps only shingles unique to a single doc → no pairs at all
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1, max_shingle_df=1
    ).collect()
    assert pairs == []


def test_minhash_signatures_shape_and_determinism(spark, docs):
    sig1 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, "doc_id", "text", 16, 3).collect()}
    sig2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs.repartition(5), "doc_id", "text", 16, 3).collect()}
    assert sig1 == sig2  # partitioning-invariant
    assert all(len(s) == 16 for s in sig1.values())
    assert sig1[0] == sig1[1]  # exact dups → identical signatures


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_bands"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, bands=8).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 8  # identical docs share all bands
    assert (0, 2) in pairs or (0, 5) in pairs  # near dups collide on ≥1 band
    assert (3, 4) not in pairs


def test_simhash(spark, docs):
    rows = docs.select("doc_id", simhash_col(F.col("text")).alias("sh")).collect()
    sh = {r["doc_id"]: r["sh"] for r in rows}
    assert sh[0] == sh[1]  # identical text → identical simhash
    assert sh[0] != sh[3]
    # near dup differs in few bits
    assert bin(sh[0] ^ sh[2]).count("1") <= 8
    grouped = simhash_dedup(docs, "doc_id", "text").collect()
    assert sum(r["dup_count"] for r in grouped) == 6
    # empty text → 0
    empty = spark.createDataFrame([("",)], "text string")
    assert empty.select(simhash_col(F.col("text"))).collect()[0][0] == 0


def test_simhash_udf_equals_jvm(spark, docs):
    from logparser_llm_spark.operators.dedup import make_simhash_udf

    jvm = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash_col(F.col("text")).alias("sh")).collect()}
    fast = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", make_simhash_udf()(F.col("text")).alias("sh")).collect()}
    assert jvm == fast
    # real corpus too
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    jvm = {r["doc_id"]: r["sh"] for r in real.select("doc_id", simhash_col(F.col("text")).alias("sh")).collect()}
    fast = {r["doc_id"]: r["sh"] for r in real.select("doc_id", make_simhash_udf()(F.col("text")).alias("sh")).collect()}
    assert jvm == fast


def test_embedding_near_dups(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "doc_id bigint, embedding array<float>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(df, "doc_id", "embedding", 0.95).collect()
    }
    assert list(pairs) == [(0, 1)]
    assert pairs[(0, 1)] > 0.99


def test_ngram_jaccard_capped_scores_are_true_jaccard(spark):
    """The DF cap only gates candidate generation; survivors must carry
    the TRUE Jaccard (sizes + intersections over FULL shingle sets), and
    any qualifying pair sharing ≥1 rare shingle must survive (ADVICE r1:
    conditional-Jaccard under the cap is not acceptable)."""
    # boilerplate prefix shared by ALL docs (hot shingles under cap=3)
    # + per-pair distinctive tails (rare shingles)
    boiler = "standard header issued by the logging framework for every record"
    docs = [
        (0, boiler + " alpha beta gamma delta epsilon zeta"),
        (1, boiler + " alpha beta gamma delta epsilon eta"),   # near dup of 0
        (2, boiler + " one two three four five six"),
        (3, boiler + " one two three four five seven"),        # near dup of 2
        (4, boiler + " totally unrelated trailing words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=3
        ).collect()
    }
    # every qualifying pair shares rare (tail) shingles → identical result,
    # scores exact to the uncapped truth
    assert capped == uncapped
    assert (0, 1) in capped and (2, 3) in capped


def test_registered_ngram_cap_is_inert_at_test_scale(spark):
    """NGRAM_MAX_SHINGLE_DF must not change the sf0.01 result (the DuckDB
    oracle is uncapped); guard: max shingle DF at sf0.01/0.1 ≪ cap."""
    from logparser_llm_spark.operators.dedup import _distinct_shingles
    from logparser_llm_spark.plans.queries import NGRAM_MAX_SHINGLE_DF

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    max_df = (
        _distinct_shingles(d, "doc_id", "text", 3)
        .groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_df < NGRAM_MAX_SHINGLE_DF


def test_lsh_band_udf_matches_jvm_signature_expr(spark):
    """make_lsh_band_udf (numpy GEMM) must pack the same per-table keys
    as similarity.lsh_signature_expr over the same md5 hyperplanes."""
    from logparser_llm_spark.operators.dedup import make_lsh_band_udf
    from logparser_llm_spark.operators.similarity import _hyperplanes, lsh_signature_expr

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    dim = len(emb.select("embedding").first()[0])
    bits, tables, seed = 8, 4, 7
    fast = {
        r["vec_id"]: list(r["keys"])
        for r in emb.select(
            "vec_id", make_lsh_band_udf(dim, bits, tables, seed)(F.col("embedding")).alias("keys")
        ).collect()
    }
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        jvm = {
            r["vec_id"]: r["k"]
            for r in emb.select(
                "vec_id", lsh_signature_expr(F.col("embedding"), planes).alias("k")
            ).collect()
        }
        assert all(fast[v][t] == jvm[v] for v in jvm)


def test_embedding_lsh_matches_brute_force_on_planted_dups(spark):
    """The LSH scale path must reproduce the brute-force ground truth on
    the planted-dup corpus (100% recall at the 0.9 threshold with 8 bits
    × 4 tables; precision is exact by construction)."""
    from logparser_llm_spark.operators.dedup import embedding_near_dup_lsh
    from logparser_llm_spark.plans.queries import embeddings_with_planted_dups

    allv = embeddings_with_planted_dups(spark, "/root/testdata/sf0.01").cache()
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(allv, "vec_id", "embedding", 0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_lsh(allv, "vec_id", "embedding", dim=64, threshold=0.9).collect()
    }
    assert lsh == brute
    assert len(brute) == 50  # every 10th of 500 vectors planted
    allv.unpersist()


def test_simhash_hamming_band_pairs_are_exact(spark, docs):
    """Pigeonhole banding is exact: band-join + verify must equal the
    brute-force Hamming-≤k pair set (no false negatives, unlike LSH)."""
    from logparser_llm_spark.operators.dedup import make_simhash_udf, simhash_near_dup_pairs

    sh = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", make_simhash_udf()(F.col("text")).alias("sh")).collect()
    }
    for k in (1, 3):
        want = {
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for a in sh for b in sh
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= k
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=k).collect()
        }
        assert got == want
        assert any(p[0] == 0 and p[1] == 1 for p in got)  # exact dups at distance 0


def test_simhash_udf_whitespace_parity_with_jvm(spark):
    """Python strip must mirror F.trim (spaces only): tabs/newlines in
    tokens must hash identically on both paths."""
    from logparser_llm_spark.operators.dedup import make_simhash_udf

    docs = spark.createDataFrame(
        [(1, "\tfoo bar"), (2, " foo bar "), (3, "foo\nbar baz")],
        "doc_id bigint, text string",
    )
    jvm = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash_col(F.col("text")).alias("sh")).collect()}
    fast = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", make_simhash_udf()(F.col("text")).alias("sh")).collect()}
    assert jvm == fast


def test_embedding_lsh_empty_input(spark):
    from logparser_llm_spark.operators.dedup import embedding_near_dup_lsh

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = embedding_near_dup_lsh(empty, "vec_id", "embedding", dim=4)
    assert out.collect() == []
    assert out.columns == ["id_a", "id_b", "cosine"]


def test_dedup_corpus_keep_ids(spark):
    """Composition: exact dup non-reps AND near-dup family non-reps are
    dropped; unique docs survive."""
    from logparser_llm_spark.operators.dedup import dedup_corpus_keep_ids

    docs = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup → drop
        (2, "the quick brown fox jumps over the lazy cat near the river bank"),  # near dup of 0 → drop
        (3, "completely different content about database query optimization plans"),
        (4, "another unrelated text mentioning spark partitions and shuffle behavior"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    # doc 2's simhash sits within hamming 8 of doc 0 (one word changed);
    # widen the near-dup threshold accordingly (bands > max_hamming)
    kept = {
        r["doc_id"]
        for r in dedup_corpus_keep_ids(df, "doc_id", "text", max_hamming=8, bands=16).collect()
    }
    assert 0 in kept            # representative of the family
    assert 1 not in kept        # exact dup
    assert 2 not in kept        # near dup (hamming-close simhash)
    assert {3, 4} <= kept       # unique docs survive


def test_dedup_corpus_keep_best_keeps_highest_score(spark):
    """Quality-priority keep rule: within a dup family the LONGEST
    (highest-score) member survives, not the min id — and score ties
    break to the min id. Families span exact AND near edges."""
    from logparser_llm_spark.operators.dedup import dedup_corpus_keep_best

    long_a = "the quick brown fox jumps over the lazy dog near the river bank"
    long_b = "the quick brown fox jumps over the lazy cat near the river bank"
    docs = [
        (0, long_a),                 # exact dup of 1, near dup of 2
        (1, long_a),                 # exact dup of 0
        (2, long_b + " today"),      # near dup, LONGER → the family's keeper
        (3, "unique text about database query optimization and plans"),
        (4, "tie one equal length aa"),
        (5, "tie one equal length aa"),  # exact dup, equal score → min id (4) kept
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    scored = df.withColumn("n", F.length("text"))
    kept = {
        r["doc_id"]
        for r in dedup_corpus_keep_best(
            scored, "doc_id", "text", "n", max_hamming=8, bands=16
        ).collect()
    }
    assert kept == {2, 3, 4}


def test_band_config_raises_value_error(spark):
    """Invalid band configs must raise even under python -O (ADVICE r2:
    a stripped assert would silently void the pigeonhole guarantee)."""
    import pytest

    from logparser_llm_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_dup_pairs,
    )

    df = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=2, bands=5)
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=5)


def test_ngram_cap_recall_contract_boilerplate_only_pair(spark):
    """Quantifies the documented recall caveat of the DF cap
    (operators/dedup.py ngram_jaccard_pairs docstring): a qualifying pair
    sharing ONLY hot shingles is never generated by the capped query —
    and is caught by exact dedup instead (the stated trade). This turns
    the docstring caveat into a tested contract (VERDICT r2 item 6)."""
    from logparser_llm_spark.operators.dedup import dedup_exact, ngram_jaccard_pairs

    boiler = "terms of service apply all rights reserved contact support team"
    docs = [
        # 6 docs embed the boilerplate + unique tails → every boilerplate
        # shingle has df ≥ 8 > cap, the tails keep these docs distinct
        (i, f"{boiler} page variant {i} unique marker token{i}") for i in range(6)
    ] + [
        # the planted pair: IDENTICAL boilerplate-only docs — their every
        # shingle is hot, so the capped candidate gen can never meet them
        (100, boiler),
        (101, boiler),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.8).collect()
    }
    assert (100, 101) in uncapped  # jaccard 1.0 — a true qualifying pair

    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.8, max_shingle_df=3
        ).collect()
    }
    assert (100, 101) not in capped  # the documented recall loss

    # ...and the stated mitigation holds: exact dedup groups the pair
    reps = {r["rep_id"]: r["dup_count"] for r in dedup_exact(df, "doc_id", "text").collect()}
    assert reps.get(100) == 2  # doc 101 collapsed onto representative 100


def test_dedup_paragraphs_keeps_first_occurrence_order(spark):
    """Within-doc repetition removal (r4): repeated paragraphs drop,
    first-occurrence order is preserved, counts are exact."""
    from logparser_llm_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\na"),
            (2, "x\nx\nx"),
            (3, "only"),
            (4, "z\ny\nx"),  # no dups: text unchanged
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs, "doc_id", "text").collect()}
    assert out[1]["text_dedup"] == "a\nb\nc"
    assert (out[1]["n_paras"], out[1]["n_distinct"]) == (6, 3)
    assert out[2]["text_dedup"] == "x"
    assert (out[2]["n_paras"], out[2]["n_distinct"]) == (3, 1)
    assert out[3]["text_dedup"] == "only"
    assert out[4]["text_dedup"] == "z\ny\nx"


def test_dedup_paragraphs_null_text_survives(spark):
    """ADVICE r4: a NULL-text document must not vanish from the output
    (posexplode over split(NULL) yields no rows) — it surfaces as an
    empty single-paragraph row so downstream joins keep the id."""
    from logparser_llm_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [(1, "a\nb\na"), (2, None), (3, "")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert (out[2]["n_paras"], out[2]["n_distinct"], out[2]["text_dedup"]) == (1, 1, "")
    assert (out[3]["n_paras"], out[3]["n_distinct"], out[3]["text_dedup"]) == (1, 1, "")
    assert out[1]["text_dedup"] == "a\nb"


def test_dedup_paragraphs_custom_separator(spark):
    """sep is a LITERAL string — regex metacharacters must not leak
    into the split (review r4: '|' as a regex splits on every position)."""
    import pytest as _pytest

    from logparser_llm_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame([(1, "a|b|a|c")], "doc_id bigint, text string")
    out = dedup_paragraphs(docs, "doc_id", "text", sep="|").collect()[0]
    assert out["n_paras"] == 4 and out["n_distinct"] == 3
    assert out["text_dedup"] == "a|b|c"
    dotted = spark.createDataFrame([(1, "x.y.x")], "doc_id bigint, text string")
    outd = dedup_paragraphs(dotted, "doc_id", "text", sep=".").collect()[0]
    assert outd["text_dedup"] == "x.y" and outd["n_paras"] == 3
    with _pytest.raises(ValueError, match="quoting terminator"):
        dedup_paragraphs(docs, "doc_id", "text", sep="\\E")


# ---------------------------------------------------------------------------
# exact-substring dedup (ExactSubstr, Lee et al. 2022) — round 5
# ---------------------------------------------------------------------------


def _ess(spark, rows, **kw):
    from logparser_llm_spark.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = exact_substring_dedup(df, "doc_id", "text", **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_exact_substring_keep_first_removes_later_occurrence_only(spark):
    shared = "a b c d e"  # one exact 5-gram
    rows = [(0, shared + " x y"), (1, "p q " + shared)]
    got = _ess(spark, rows, k=5)
    # doc 0 holds the globally-first occurrence (min (id, pos)) — untouched
    assert got[0]["n_dup_tokens"] == 0
    assert got[0]["text_dedup"] == "a b c d e x y"
    # doc 1 loses the span, keeps its own prefix
    assert got[1]["n_dup_tokens"] == 5
    assert got[1]["text_dedup"] == "p q"


def test_exact_substring_keep_first_false_removes_every_occurrence(spark):
    shared = "a b c d e"
    rows = [(0, shared + " x y"), (1, "p q " + shared)]
    got = _ess(spark, rows, k=5, keep_first=False)
    assert got[0]["text_dedup"] == "x y"
    assert got[1]["text_dedup"] == "p q"
    assert got[0]["n_dup_tokens"] == got[1]["n_dup_tokens"] == 5


def test_exact_substring_overlapping_windows_merge_into_one_span(spark):
    # a 6-token shared run = two overlapping 5-gram windows -> ONE merged
    # interval of 6 covered tokens, not 10
    shared = "a b c d e f"
    rows = [(0, shared), (1, "z " + shared + " w")]
    got = _ess(spark, rows, k=5)
    assert got[0]["n_dup_tokens"] == 0
    assert got[1]["n_dup_tokens"] == 6
    assert got[1]["text_dedup"] == "z w"


def test_exact_substring_within_doc_repetition_counts(spark):
    # the duplicated run occurs twice INSIDE one document
    rows = [(7, "a b c d e q q a b c d e")]
    got = _ess(spark, rows, k=5)
    assert got[7]["n_tokens"] == 12
    assert got[7]["n_dup_tokens"] == 5
    assert got[7]["text_dedup"] == "a b c d e q q"


def test_exact_substring_fully_covered_doc_survives_with_empty_text(spark):
    shared = "a b c d e"
    rows = [(0, shared + " tail"), (1, shared)]
    got = _ess(spark, rows, k=5)
    assert set(got) == {0, 1}
    assert got[1]["n_dup_tokens"] == 5
    assert got[1]["text_dedup"] == ""


def test_exact_substring_short_and_null_docs_pass_through(spark):
    rows = [(0, "a b c"), (1, None), (2, "")]
    got = _ess(spark, rows, k=5)
    assert got[0]["n_dup_tokens"] == 0 and got[0]["text_dedup"] == "a b c"
    # NULL coalesces to '' -> split gives [''] -> 1 token, no k-gram
    for i in (1, 2):
        assert got[i]["n_tokens"] == 1
        assert got[i]["n_dup_tokens"] == 0
        assert got[i]["text_dedup"] == ""


def test_exact_substring_k_below_two_raises(spark):
    from logparser_llm_spark.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="k must be >= 2"):
        exact_substring_dedup(df, "doc_id", "text", k=1)


def test_dedup_against_snapshot_differential(spark):
    """Brute-force differential: the banded snapshot filter must keep
    exactly the batch rows with no exact-md5 AND no Hamming<=3 match in
    the snapshot (reference computed in Python from the same simhash
    UDF outputs — independent of banding luck)."""
    from logparser_llm_spark.operators.dedup import (
        dedup_against_snapshot,
        make_simhash_udf,
    )

    snap_rows = [(i, f"snapshot document number {i} about topic {i % 7}")
                 for i in range(30)]
    batch_rows = (
        [(100 + i, f"fresh document {i} with novel words {i * 13}") for i in range(10)]
        + [(200 + i, t) for i, (_, t) in enumerate(snap_rows[:5])]          # exact dups
        + [(300 + i, t + " extra") for i, (_, t) in enumerate(snap_rows[5:10])]  # near-ish
    )
    snap = spark.createDataFrame(snap_rows, "doc_id bigint, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    kept = {r["doc_id"] for r in
            dedup_against_snapshot(batch, snap, "doc_id", "text").collect()}

    sig = make_simhash_udf(32)
    sh = {
        r["doc_id"]: r["s"]
        for r in snap.unionByName(batch).select("doc_id", sig(F.col("text")).alias("s")).collect()
    }
    snap_texts = {t for _, t in snap_rows}
    snap_sh = [sh[i] for i, _ in snap_rows]
    expect = set()
    for i, t in batch_rows:
        if t in snap_texts:
            continue
        if any(bin(sh[i] ^ s).count("1") <= 3 for s in snap_sh):
            continue
        expect.add(i)
    assert kept == expect
    assert not any(200 <= k < 300 for k in kept)   # exact dups always die
    assert {100 + i for i in range(10)} <= kept | {
        i for i in range(100, 110) if i not in expect
    }  # fresh rows die only if genuinely near a snapshot row


def test_dedup_against_snapshot_validation(spark):
    from logparser_llm_spark.operators.dedup import dedup_against_snapshot

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        dedup_against_snapshot(df, df, "doc_id", "text", max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="divide"):
        dedup_against_snapshot(df, df, "doc_id", "text", bands=5)


# --- corpus-level paragraph dedup (CCNet) --------------------------------

def _para_corpus(spark):
    rows = [
        (0, "unique zero\nshared banner\nalso unique"),
        (1, "shared banner\nunique one"),
        (2, "unique two\nshared banner"),
        (3, "totally unique page"),
        (4, None),                        # NULL -> '' -> one empty para
        (5, "shared banner"),             # nothing else: may empty out
        (6, ""),                          # empty: dups with doc 4's ''
    ]
    return rows, spark.createDataFrame(rows, "doc_id bigint, t string")


def test_corpus_para_dedup_keep_first(spark):
    from logparser_llm_spark.operators.dedup import dedup_paragraphs_corpus

    rows, df = _para_corpus(spark)
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_dedup"])
        for r in dedup_paragraphs_corpus(df, "doc_id", "t", keep="first").collect()
    }
    assert set(got) == {r[0] for r in rows}          # every doc survives
    # doc 0 is the global first occurrence of the banner -> keeps it
    assert got[0] == (3, 3, "unique zero\nshared banner\nalso unique")
    assert got[1] == (2, 1, "unique one")
    assert got[2] == (2, 1, "unique two")
    assert got[3] == (1, 1, "totally unique page")
    # doc 4's '' is the first of the two empty paragraphs
    assert got[4] == (1, 1, "")
    assert got[5] == (1, 0, "")                      # everything removed
    assert got[6] == (1, 0, "")                      # '' already seen at doc 4


def test_corpus_para_dedup_keep_none(spark):
    from logparser_llm_spark.operators.dedup import dedup_paragraphs_corpus

    _, df = _para_corpus(spark)
    got = {
        r["doc_id"]: (r["n_kept"], r["text_dedup"])
        for r in dedup_paragraphs_corpus(df, "doc_id", "t", keep="none").collect()
    }
    assert got[0] == (2, "unique zero\nalso unique")  # banner dies everywhere
    assert got[4] == (0, "") and got[6] == (0, "")


def test_corpus_para_dedup_matches_duckdb_both_modes(spark):
    import duckdb

    from logparser_llm_spark.operators.dedup import (
        dedup_paragraphs_corpus,
        dedup_paragraphs_corpus_sql,
    )

    rows, df = _para_corpus(spark)
    con = duckdb.connect()
    con.execute("create table src (doc_id bigint, t varchar)")
    con.executemany("insert into src values (?, ?)", rows)
    for keep in ("first", "none"):
        srows = sorted(map(tuple, dedup_paragraphs_corpus(
            df, "doc_id", "t", keep=keep).collect()))
        orows = sorted(map(tuple, con.execute(dedup_paragraphs_corpus_sql(
            src="src", id_col="doc_id", text_col="t", keep=keep)).fetchall()))
        assert srows == orows, keep


def test_corpus_para_dedup_partition_invariance_and_validation(spark):
    from logparser_llm_spark.operators.dedup import (
        dedup_paragraphs_corpus,
        dedup_paragraphs_corpus_sql,
    )

    _, df = _para_corpus(spark)
    one = sorted(map(tuple, dedup_paragraphs_corpus(
        df.repartition(1), "doc_id", "t").collect()))
    eight = sorted(map(tuple, dedup_paragraphs_corpus(
        df.repartition(8), "doc_id", "t").collect()))
    assert one == eight
    with pytest.raises(ValueError, match="keep must"):
        dedup_paragraphs_corpus(df, "doc_id", "t", keep="last")
    with pytest.raises(ValueError, match="quoting terminator"):
        dedup_paragraphs_corpus(df, "doc_id", "t", sep="\\E")
    with pytest.raises(ValueError, match="non-empty"):
        dedup_paragraphs_corpus(df, "doc_id", "t", sep="")
    with pytest.raises(ValueError, match="non-empty"):
        dedup_paragraphs_corpus_sql(src="s", id_col="i", text_col="t", sep="")


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_ccnet_query_removes_and_keeps_at_scale(spark, sf):
    """The seeded corpus must show: banner removed from every doc but
    one, per-doc unique text always kept, and exactly one keeper of
    each boilerplate paragraph."""
    from pyspark.sql import functions as F

    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["ccnet_para_dedup"][0](spark, sf).collect()
    removed = sum(1 for r in out if r["n_kept"] < r["n_paras"])
    intact = sum(1 for r in out if r["n_kept"] == r["n_paras"])
    assert removed > 0 and intact > 0
    # total removals = (banner copies - 1) + (footer copies - 1) +
    # non-first copies of exact-duplicate document TEXTS (the synthetic
    # corpus plants those for dedup_exact — at sf0.1 some docs lose
    # their text paragraph too, legitimately)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_texts = docs.count()
    n_distinct_texts = docs.select("text").distinct().count()
    n_banner = sum(1 for r in out if r["doc_id"] % 2 == 0)
    n_footer = sum(1 for r in out if r["doc_id"] % 3 == 0)
    total_removed = sum(r["n_paras"] - r["n_kept"] for r in out)
    assert total_removed == (
        (n_banner - 1) + (n_footer - 1) + (n_texts - n_distinct_texts)
    )


# --- leakage_safe_split (r5 sixteenth arc) ----------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_leakage_split_no_family_straddles(spark, sf):
    """The whole point: every duplicate family lands in ONE split; the
    seeded exact copies (id, id+10^7) must share their original's split;
    all three splits are populated."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["leakage_split"][0](spark, sf).collect()
    by_fam = {}
    split_of = {}
    for r in rows:
        by_fam.setdefault(r["family_rep"], set()).add(r["split"])
        split_of[r["doc_id"]] = r["split"]
    assert all(len(s) == 1 for s in by_fam.values()), sf
    copies = [i for i in split_of if i >= 10_000_000 and i < 20_000_000]
    assert copies, sf
    for i in copies:
        assert split_of[i] == split_of[i - 10_000_000], sf
    assert {s for s in split_of.values()} == {"train", "val", "test"}, sf
    # multi-member families exist (the seeding guarantees them)
    assert any(
        sum(1 for r in rows if r["family_rep"] == f) > 1 for f in by_fam
    ), sf


def test_leakage_split_degrades_to_dataset_split_when_dup_free(spark):
    from logparser_llm_spark.operators.dedup import leakage_safe_split
    from logparser_llm_spark.operators.sampling import dataset_split

    import hashlib

    def _junk(i: int) -> str:
        # genuinely dissimilar texts: 12 unique hash words per doc, no
        # shared vocabulary — simhash must NOT link any pair
        return " ".join(
            hashlib.md5(f"{i}:{k}".encode()).hexdigest() for k in range(12)
        )

    rows = [(i, _junk(i)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        (r["doc_id"], r["split"])
        for r in leakage_safe_split(df, "doc_id", "text", fr).collect()
    }
    want = {
        (r["doc_id"], r["split"])
        for r in dataset_split(df, "doc_id", fr).collect()
    }
    assert got == want


def test_leakage_split_family_key_moves_members_together(spark):
    """Three exact copies of one text land in one family whose rep is
    the min id, and all carry the rep's split — even when the copies'
    own ids would hash into different splits."""
    from logparser_llm_spark.operators.dedup import leakage_safe_split
    from logparser_llm_spark.operators.sampling import dataset_split

    fam = "the shared duplicated text body that forms one family"
    rows = [(1, fam), (500, fam), (9000, fam)] + [
        (i, f"unique filler document {i} {i*13%7} {i*29%11}") for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    out = {r["doc_id"]: (r["family_rep"], r["split"])
           for r in leakage_safe_split(df, "doc_id", "text", fr).collect()}
    assert out[1][0] == out[500][0] == out[9000][0] == 1
    assert out[1][1] == out[500][1] == out[9000][1]
    ref = {r["doc_id"]: r["split"]
           for r in dataset_split(
               df.select("doc_id"), "doc_id", fr).collect()}
    assert out[1][1] == ref[1]  # family split == rep's own-key split


# --- remove_host_boilerplate (RefinedWeb line-wise correction, r5) ----------


def _hb(spark, rows, **kw):
    from logparser_llm_spark.operators.dedup import remove_host_boilerplate

    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    out = remove_host_boilerplate(df, "doc_id", "host", "text", **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_host_boilerplate_removes_everywhere_within_host_only(spark):
    """The nav line drops from EVERY page of the templating host —
    including the first copy (contrast with keep-first corpus dedup) —
    but the byte-identical line on an unrelated host is content."""
    rows = [
        (1, "a", "NAV\ncontent one"),
        (2, "a", "NAV\ncontent two"),
        (3, "a", "NAV\ncontent three"),
        (4, "b", "NAV\nsolo page"),  # df=1 on host b: under min_docs
    ]
    out = _hb(spark, rows)
    for i, body in [(1, "content one"), (2, "content two"), (3, "content three")]:
        assert out[i]["text_clean"] == body
        assert (out[i]["n_lines"], out[i]["n_kept"]) == (2, 1)
    assert out[4]["text_clean"] == "NAV\nsolo page"
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (2, 2)


def test_host_boilerplate_integer_permille_bar_is_inclusive(spark):
    """3 of 10 docs at ratio_permille=300 sits EXACTLY on the bar
    (3*1000 == 300*10) and is removed; 2 of 10 survives; nudging the
    bar to 301 flips the 3-of-10 line to kept — integers decide, no
    float epsilon."""
    rows = [
        (i, "h", ("BAR\n" if i < 3 else "") + ("UNDER\n" if i < 2 else "") + f"body {i}")
        for i in range(10)
    ]
    at_bar = _hb(spark, rows, min_docs=2, ratio_permille=300)
    assert all("BAR" not in at_bar[i]["text_clean"] for i in range(3))
    assert all("UNDER" in at_bar[i]["text_clean"] for i in range(2))
    over_bar = _hb(spark, rows, min_docs=2, ratio_permille=301)
    assert all("BAR" in over_bar[i]["text_clean"] for i in range(3))


def test_host_boilerplate_null_and_repeated_lines(spark):
    """NULL text still emits a row (the r4 silent-drop lesson); a line
    repeated WITHIN one doc counts that doc once toward the distinct-doc
    frequency but every copy is removed; kept-line order is preserved."""
    rows = [
        (1, "h", "a\nBP\nb\nBP\nc"),
        (2, "h", "BP\nother"),
        (3, "h", None),
        (4, "h", "x\ny\nz"),
    ]
    out = _hb(spark, rows)
    assert out[1]["text_clean"] == "a\nb\nc"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (5, 3)
    assert out[2]["text_clean"] == "other"
    assert (out[3]["n_lines"], out[3]["n_kept"], out[3]["text_clean"]) == (1, 1, "")
    assert out[4]["text_clean"] == "x\ny\nz"


def test_host_boilerplate_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.dedup import (
        remove_host_boilerplate,
        remove_host_boilerplate_sql,
    )

    rows = [
        (1, "a", "NAV\nalpha\nNAV"),
        (2, "a", "NAV\nbeta"),
        (3, "a", "gamma\nshared"),
        (4, "a", "shared\ndelta"),
        (5, "b", "NAV\nepsilon"),
        (6, "b", None),
        (7, "b", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    srows = sorted(map(tuple, remove_host_boilerplate(
        df, "doc_id", "host", "text", min_docs=2, ratio_permille=500).collect()))
    con = duckdb.connect()
    con.execute("create table src (doc_id bigint, host varchar, text varchar)")
    con.executemany("insert into src values (?, ?, ?)", rows)
    orows = sorted(map(tuple, con.execute(remove_host_boilerplate_sql(
        src="src", id_col="doc_id", host_col="host", text_col="text",
        min_docs=2, ratio_permille=500)).fetchall()))
    assert srows == orows


def test_host_boilerplate_partition_invariance_and_validation(spark):
    from logparser_llm_spark.operators.dedup import (
        remove_host_boilerplate,
        remove_host_boilerplate_sql,
    )

    rows = [(i, f"h{i % 3}", f"NAV\nline {i}\n" + ("even" if i % 2 == 0 else "odd"))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, host string, text string")
    one = sorted(map(tuple, remove_host_boilerplate(
        df.repartition(1), "doc_id", "host", "text").collect()))
    thirteen = sorted(map(tuple, remove_host_boilerplate(
        df.repartition(13), "doc_id", "host", "text").collect()))
    assert one == thirteen
    with pytest.raises(ValueError, match="non-empty"):
        remove_host_boilerplate(df, "doc_id", "host", "text", sep="")
    with pytest.raises(ValueError, match="quoting terminator"):
        remove_host_boilerplate(df, "doc_id", "host", "text", sep="\\E")
    with pytest.raises(ValueError, match="min_docs"):
        remove_host_boilerplate(df, "doc_id", "host", "text", min_docs=0)
    with pytest.raises(ValueError, match="ratio_permille"):
        remove_host_boilerplate(df, "doc_id", "host", "text", ratio_permille=0)
    with pytest.raises(ValueError, match="ratio_permille"):
        remove_host_boilerplate_sql(
            src="s", id_col="i", host_col="h", text_col="t",
            ratio_permille=1001)


def test_host_boilerplate_plan_has_no_python_no_cartesian(spark):
    from logparser_llm_spark.plans.inspect import physical_plan, plan_facts
    from logparser_llm_spark.plans.queries import QUERIES

    df = QUERIES["host_boilerplate"][0](spark, "/root/testdata/sf0.001")
    facts = plan_facts(df)
    assert not facts["python_udf"] and not facts["map_in_pandas"]
    assert "CartesianProduct" not in physical_plan(df)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_host_boilerplate_registered_classes(spark, sf):
    """Recompute each seeded class's removal verdict per host from the
    EXACT integer law (dfc >= 2 and dfc*1000 >= 300*host_docs) and
    assert every page obeys it: nav (100% of host) always removed,
    trending removed on src0 but kept on hosts where it rides below
    the bar, promo (%97) under min_docs/ratio and always kept,
    copyright decided host-by-host by the integers."""
    from collections import defaultdict

    from logparser_llm_spark.operators.dedup import remove_host_boilerplate
    from logparser_llm_spark.plans.queries import _host_boilerplate_seed_col

    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("source"),
        _host_boilerplate_seed_col().alias("page"),
    )
    ids = [r["doc_id"] for r in d.select("doc_id").collect()]
    host_ids = defaultdict(list)
    for i in ids:
        host_ids[i % 20].append(i)

    def removed(host, dfc):
        return dfc >= 2 and dfc * 1000 >= 300 * len(host_ids[host])

    exp_copy = {h: removed(h, sum(1 for i in v if i % 3 == 0))
                for h, v in host_ids.items()}
    exp_trend = {h: removed(h, len(v) if h == 0 else sum(1 for i in v if i % 13 == 0))
                 for h, v in host_ids.items()}
    assert exp_trend[0] and not all(exp_trend.values()), sf  # host-scoping non-vacuous

    out = remove_host_boilerplate(
        d, "doc_id", "source", "page", min_docs=2, ratio_permille=300)
    rows = out.collect()
    assert len(rows) == len(ids), sf
    for r in rows:
        i, h, t = r["doc_id"], r["doc_id"] % 20, r["text_clean"]
        assert "nav home about contact" not in t, i
        if i % 97 == 0:
            assert "limited promo today" in t, i
        if h == 0 or i % 13 == 0:
            assert ("trending widget sidebar" in t) != exp_trend[h], i
        if i % 3 == 0:
            assert ("copyright" in t) != exp_copy[h], i


# --- minhash_calibration -----------------------------------------------------


def test_minhash_calibration_identical_family_and_bounds(spark):
    """A planted family of identical docs must land in bin 9 with
    est == true == 10^6 and zero error; every bin stays within
    [0, 10^6] and bin ids within [0, 9]."""
    from logparser_llm_spark.operators.dedup import minhash_calibration

    blob = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, blob) for i in range(4)] + [
        (10 + i,
         f"doc {i} unique words number {i * 7} content tail {i * 13} end "
         f"filler {i % 3} mark {i % 5} zz")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["bin"]: r for r in
           minhash_calibration(df, "doc_id", "text").collect()}
    nine = got[9]
    # the 4 identical docs give C(4,2)=6 exact pairs (others may join)
    assert nine["n_pairs"] >= 6
    assert nine["mean_est_e6"] == 1_000_000 == nine["mean_true_e6"]
    assert nine["mean_abs_err_e6"] == 0
    for b, r in got.items():
        assert 0 <= b <= 9
        assert 0 <= r["mean_est_e6"] <= 1_000_000
        assert 0 <= r["mean_true_e6"] <= 1_000_000


def test_minhash_calibration_validation_and_partition_invariance(spark):
    import pytest as _pytest

    from logparser_llm_spark.operators.dedup import minhash_calibration

    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} shared common tail words here ok")
         for i in range(30)],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="divide"):
        minhash_calibration(df, "doc_id", "text", num_hashes=16, bands=5)
    a = sorted(map(tuple,
                   minhash_calibration(df.repartition(1), "doc_id", "text")
                   .collect()))
    b = sorted(map(tuple,
                   minhash_calibration(df.repartition(11), "doc_id", "text")
                   .collect()))
    assert a == b


def test_minhash_calibration_reuses_persisted_frames(spark):
    """Shingles and signatures are each built once and persisted for
    their two consumers — the plan must carry InMemoryTableScans, no
    Python, and partial aggregation for the decile rollup."""
    from logparser_llm_spark.operators.dedup import minhash_calibration
    from logparser_llm_spark.plans.inspect import physical_plan, plan_facts

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = minhash_calibration(df, "doc_id", "text")
    out.collect()
    plan = physical_plan(out)
    assert plan.count("InMemoryTableScan") >= 4, plan.count("InMemoryTableScan")
    facts = plan_facts(out)
    assert not facts["python_udf"] and not facts["map_in_pandas"]
    assert facts["partial_aggregate"]


# --- simhash_threshold_sweep -------------------------------------------------


def test_simhash_sweep_truth_accounting_and_monotonicity(spark):
    """tp + fn == total true pairs at EVERY threshold (band-missed
    pairs stay in fn — the honesty property); recall monotone
    non-decreasing, n_pred monotone; zero-prediction rows carry NULL
    precision; exact-copy families land at hamming 0."""
    import hashlib

    from logparser_llm_spark.operators.dedup import simhash_threshold_sweep

    def w(seed, i):
        return hashlib.md5(f"{seed}-{i}".encode()).hexdigest()[:6]

    rows = []
    for fam in range(6):
        for m in range(5):
            did = fam * 5 + m
            keep = 16 if m <= 1 else 16 - 3 * (m - 1)
            toks = [w(f"f{fam}", i) if i < keep else w(f"d{did}", i)
                    for i in range(16)]
            rows.append((did, " ".join(toks),
                         f"f{fam}" if m <= 2 else None))
    df = spark.createDataFrame(rows, "id long, text string, fam string")
    out = sorted(map(tuple,
                     simhash_threshold_sweep(df, "id", "text",
                                             "fam").collect()))
    total_true = 6 * 3  # 6 families x C(3,2)
    prev_pred, prev_rec = -1, -1
    for t, n_pred, tp, fp, fn, prec, rec in out:
        assert tp + fn == total_true, (t, tp, fn)
        assert n_pred == tp + fp
        assert n_pred >= prev_pred and rec >= prev_rec
        prev_pred, prev_rec = n_pred, rec
        if n_pred == 0:
            assert prec is None
    # the two exact copies per family meet at t=0
    assert out[0][2] >= 6


def test_simhash_sweep_validation(spark):
    import pytest as _pytest

    from logparser_llm_spark.operators.dedup import simhash_threshold_sweep

    df = spark.createDataFrame([(1, "a", None)],
                               "id long, text string, fam string")
    with _pytest.raises(ValueError, match="max_hamming"):
        simhash_threshold_sweep(df, "id", "text", "fam", max_hamming=32)
