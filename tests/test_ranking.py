"""BM25 ranked-retrieval tests: Spark vs pure-Python scoring parity,
ranking-semantics sanity (idf dominance, length normalization, tie
breaks), edge cases, and the cross-engine contract at both driver
scales (the registered query is additionally covered by the
registry-wide oracle test at sf0.01)."""

import duckdb
import pytest

from logparser_llm_spark.operators.ranking import (
    bm25_score_py,
    bm25_topk,
    bm25_topk_sql,
    query_terms,
)


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id bigint, text string"
    )


CORPUS = {
    1: "hash join is the fast join for big tables",
    2: "sort merge join handles skew with spill",
    3: "spark uses hash partitioning for the shuffle",
    4: "broadcast the small side and keep the hash map in memory",
    5: "window functions rank rows per partition",
    6: "hash hash hash join join spark spark spark spark",
}


def test_spark_matches_python_scores(spark):
    out = {
        r["doc_id"]: (r["score_e6"], r["n_terms_hit"])
        for r in bm25_topk(
            _df(spark, CORPUS), "doc_id", "text", "hash join spark", top_k=10
        ).collect()
    }
    py = bm25_score_py(CORPUS, "hash join spark")
    assert set(out) == set(py)
    for i, s in py.items():
        assert out[i][0] == s, i
    assert 5 not in out  # no query term → absent


def test_rank_order_and_tie_break(spark):
    rows = bm25_topk(
        _df(spark, CORPUS), "doc_id", "text", "hash join spark", top_k=10
    ).collect()
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r["score_e6"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    # the stuffed doc wins
    assert rows[0]["doc_id"] == 6


def test_rare_term_idf_dominates():
    docs = {i: "common filler words here" for i in range(1, 10)}
    docs[1] = "common rare"
    docs[2] = "common common"  # tf=2 of the common term
    scores = bm25_score_py(docs, "rare common")
    assert scores[1] > scores[2]


def test_length_normalization():
    docs = {
        1: "target " + "pad " * 40,
        2: "target pad",
    }
    scores = bm25_score_py(docs, "target")
    assert scores[2] > scores[1]


def test_empty_query_rejected():
    with pytest.raises(ValueError, match="no indexable terms"):
        query_terms("  ;; ")


def test_null_and_empty_text_excluded(spark):
    docs = dict(CORPUS)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()] + [(98, None), (99, "")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["score_e6"]
        for r in bm25_topk(df, "doc_id", "text", "hash join spark", top_k=20).collect()
    }
    assert 98 not in out and 99 not in out
    # and they don't perturb N/avgdl: scores equal the corpus-only run
    py = bm25_score_py(docs, "hash join spark")
    assert out == py


def test_top_k_truncates(spark):
    out = bm25_topk(
        _df(spark, CORPUS), "doc_id", "text", "hash join spark", top_k=2
    ).collect()
    assert len(out) == 2 and out[0]["rnk"] == 1 and out[1]["rnk"] == 2


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_oracle_parity_at_scale(spark, sf):
    """Cross-engine hash contract at BOTH driver scales — guards the
    ≤1-ulp ln wiggle the module docstring documents (more docs = more
    chances for a quantization-boundary flip)."""
    from logparser_llm_spark.plans.queries import QUERIES

    sdf = QUERIES["bm25_topk"][0](spark, sf)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from parquet_scan('{sf}/documents.parquet')"
    )
    orows = sorted(tuple(r) for r in con.execute(QUERIES["bm25_topk"][1](sf)).fetchall())
    assert srows == orows


# --- hybrid RRF fusion ----------------------------------------------------


def test_rrf_fusion_semantics(spark):
    """Hand-checked fusion: both-list docs beat single-list docs at
    comparable ranks; absent ranks report 0; contributions are the
    exact floor(1e9/(60+r)) integers."""
    from logparser_llm_spark.operators.ranking import hybrid_rrf_topk

    lex = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id bigint, rnk int")
    dense = spark.createDataFrame([(11, 1), (13, 2)], "doc_id bigint, rnk int")
    out = {r["doc_id"]: r for r in hybrid_rrf_topk(lex, dense, "doc_id").collect()}
    c = lambda r: 1_000_000_000 // (60 + r)
    assert out[11]["rrf_e9"] == c(2) + c(1)  # in both lists
    assert out[10]["rrf_e9"] == c(1) and out[10]["dense_rnk"] == 0
    assert out[13]["rrf_e9"] == c(2) and out[13]["lex_rnk"] == 0
    assert out[11]["rnk"] == 1  # fusion promotes the both-list doc
    # full ordering: 11, then lex#1 (10), then dense#2 (13) beats lex#3 (12)
    order = sorted(out.values(), key=lambda r: r["rnk"])
    assert [r["doc_id"] for r in order] == [11, 10, 13, 12]


def test_rrf_validation_and_topk(spark):
    from logparser_llm_spark.operators.ranking import hybrid_rrf_topk

    lex = spark.createDataFrame([(1, 1), (2, 2)], "doc_id bigint, rnk int")
    dense = spark.createDataFrame([(3, 1)], "doc_id bigint, rnk int")
    assert hybrid_rrf_topk(lex, dense, "doc_id", top_k=2).count() == 2
    with pytest.raises(ValueError, match="top_k"):
        hybrid_rrf_topk(lex, dense, "doc_id", top_k=0)


# --- inverted index ---------------------------------------------------------


def test_inverted_index_postings_are_exact(spark):
    """Hand-computed postings on a tiny corpus: df/cf and the md5 of the
    doc-ordered doc:tf rendering must match hashlib exactly."""
    import hashlib

    from logparser_llm_spark.operators.ranking import build_inverted_index

    docs = [
        (1, "spark spark table"),
        (2, "table scan"),
        (3, "spark Scan scan"),   # tokenizer lowercases
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["term"],): (r["df"], r["cf"], r["postings_md5"])
        for r in build_inverted_index(df, "doc_id", "text").collect()
    }
    expect = {
        "spark": [(1, 2), (3, 1)],
        "table": [(1, 1), (2, 1)],
        "scan": [(2, 1), (3, 2)],
    }
    for term, posts in expect.items():
        rendering = ",".join(f"{d}:{t}" for d, t in posts)
        md5 = hashlib.md5(rendering.encode()).hexdigest()
        assert got[(term,)] == (
            len(posts),
            sum(t for _, t in posts),
            md5,
        ), term


def test_inverted_index_shards_partition_the_postings(spark):
    """Sharded per-(term, shard) df/cf must sum to the unsharded global
    values, every doc landing in exactly one shard."""
    from logparser_llm_spark.operators.ranking import build_inverted_index

    rows = [(i, f"common term{i % 5} filler") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    flat = {
        r["term"]: (r["df"], r["cf"])
        for r in build_inverted_index(df, "doc_id", "text").collect()
    }
    sharded = build_inverted_index(df, "doc_id", "text", doc_shards=4).collect()
    agg = {}
    for r in sharded:
        d, c = agg.get(r["term"], (0, 0))
        agg[r["term"]] = (d + r["df"], c + r["cf"])
    assert agg == flat
    assert {r["shard"] for r in sharded} == {0, 1, 2, 3}
    # a doc's shard is a function of its id: 'common' (in every doc)
    # must have exactly as many shard rows as distinct shards
    assert sum(1 for r in sharded if r["term"] == "common") == 4


def test_inverted_index_partition_invariance_and_validation(spark):
    from logparser_llm_spark.operators.ranking import build_inverted_index

    rows = [(i, f"alpha beta{i % 3}") for i in range(40)]
    a = spark.createDataFrame(rows, "doc_id bigint, text string")
    one = {tuple(r) for r in build_inverted_index(a.coalesce(1), "doc_id", "text").collect()}
    many = {tuple(r) for r in build_inverted_index(a.repartition(13), "doc_id", "text").collect()}
    assert one == many
    with pytest.raises(ValueError, match="doc_shards"):
        build_inverted_index(a, "doc_id", "text", doc_shards=0)
    with pytest.raises(ValueError, match="min_df"):
        build_inverted_index(a, "doc_id", "text", min_df=0)
    # min_df drops the long tail: beta0/1/2 have df<=14, alpha df=40
    kept = {r["term"] for r in build_inverted_index(a, "doc_id", "text", min_df=20).collect()}
    assert kept == {"alpha"}


def test_passage_retrieval_composition(spark):
    """Composition gate for chunker→BM25: composite passage ids stay
    collision-free (chunk counts < 1000 — the id law), the returned
    passages contain query terms, and passage-grain ranking is NOT the
    document-grain ranking re-labelled (chunk length normalization must
    matter)."""
    from pyspark.sql import functions as F

    from logparser_llm_spark.operators.chunking import token_window_chunks
    from logparser_llm_spark.plans.queries import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        PASSAGE_ID_BASE,
        PASSAGE_QUERY,
        QUERIES,
    )

    sf = "/root/testdata/sf0.01"
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    chunks = token_window_chunks(
        d, "doc_id", "text", chunk_tokens=CHUNK_TOKENS, stride_tokens=CHUNK_STRIDE
    )
    assert chunks.agg(F.max("chunk_idx")).collect()[0][0] < PASSAGE_ID_BASE // 1000

    out = QUERIES["passage_retrieval"][0](spark, sf).collect()
    assert len(out) == 10 and all(r["n_terms_hit"] >= 1 for r in out)
    # decompose and verify the top passage really contains a query term
    top = out[0]
    doc_id, chunk_idx = divmod(top["passage_id"], PASSAGE_ID_BASE)
    text = d.where(F.col("doc_id") == doc_id).first()["text"]
    toks = [t for t in text.split(" ") if t]
    passage = toks[chunk_idx * CHUNK_STRIDE:
                   chunk_idx * CHUNK_STRIDE + CHUNK_TOKENS]
    assert any(t in passage for t in PASSAGE_QUERY.split())
    # passage ranking is its own grain: >1 distinct source doc in the
    # top-10, and at least one doc contributes a non-zeroth chunk
    srcs = {r["passage_id"] // PASSAGE_ID_BASE for r in out}
    assert len(srcs) > 1
    assert any(r["passage_id"] % PASSAGE_ID_BASE > 0 for r in out)


def test_doc_keywords_semantics_and_plan(spark):
    """TF-IDF keyword extraction: a corpus-wide common word must never
    outrank a doc-specific rare word; ties break on term; zero-token
    docs emit nothing; validation + persisted-frame/window plan shape."""
    import duckdb

    from logparser_llm_spark.operators.ranking import doc_keywords, doc_keywords_sql

    rows = [
        (0, "common common common aardvark"),
        (1, "common zebra zebra"),
        (2, "common quartz"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = doc_keywords(df, "doc_id", "text", top_k=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["rnk"], r["term"], r["tf"]))
    # 'common' appears in all 3 docs -> idf = ln(4/4) = 0 -> score 0;
    # the doc-unique words (df=1 -> idf > 0) must rank first
    assert got[0][0] == (1, "aardvark", 1) and got[0][1][1] == "common"
    assert got[1][0] == (1, "zebra", 2)
    assert got[2][0] == (1, "quartz", 1)
    assert 3 not in got and 4 not in got
    # DuckDB twin agrees exactly
    con = duckdb.connect()
    con.execute("create table src (doc_id bigint, text varchar)")
    con.executemany("insert into src values (?, ?)", rows)
    orows = sorted(map(tuple, con.execute(
        doc_keywords_sql("src", "doc_id", "text", top_k=2)).fetchall()))
    assert sorted(map(tuple, out)) == orows
    with pytest.raises(ValueError, match="top_k"):
        doc_keywords(df, "doc_id", "text", top_k=0)
    with pytest.raises(ValueError, match="top_k"):
        doc_keywords_sql("src", "doc_id", "text", top_k=-1)
    plan = doc_keywords(df, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "InMemoryTableScan" in plan          # (doc, term, tf) reused
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- retrieval_metrics -------------------------------------------------------


def test_retrieval_metrics_hand_values_and_edges(spark):
    """First-rel-at-2 gives RR exactly 500000 and the two-hit NDCG
    closed form; a query with no relevant docs anywhere emits 0/0/NULL
    (undefined, not perfect); relevance outside the top-k zeroes
    P@k/NDCG but not RR."""
    from logparser_llm_spark.operators.ranking import (
        ndcg_weights_e6,
        retrieval_metrics,
    )

    rows = (
        [("q1", r, r in (2, 5)) for r in range(1, 21)]
        + [("q2", r, False) for r in range(1, 21)]
        + [("q3", r, r == 15) for r in range(1, 21)]
    )
    df = spark.createDataFrame(rows, "q string, rank long, rel boolean")
    got = {r["q"]: tuple(r)
           for r in retrieval_metrics(df, "q", "rank", "rel",
                                      k=10).collect()}
    w = ndcg_weights_e6(10)
    assert got["q1"][1:] == (2, 2, 500_000, 200_000,
                             (w[1] + w[4]) * 1_000_000 // (w[0] + w[1]))
    assert got["q2"][1:] == (0, None, 0, 0, None)
    assert got["q3"][1:] == (1, 15, 66_666, 0, 0)


def test_retrieval_metrics_validation_and_duckdb(spark):
    import duckdb
    import pytest as _pytest

    from logparser_llm_spark.operators.ranking import (
        retrieval_metrics,
        retrieval_metrics_sql,
    )

    df = spark.createDataFrame([("q", 1, True)],
                               "q string, rank long, rel boolean")
    with _pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(df, "q", "rank", "rel", k=0)
    with _pytest.raises(ValueError, match="k must be"):
        retrieval_metrics_sql(rel="t", query_col="q", rank_col="rank",
                              rel_col="rel", k=-1)
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bad = spark.createDataFrame([("q", 0, True)],
                                "q string, rank long, rel boolean")
    with _pytest.raises(SparkRuntimeException, match="ranks >= 1"):
        retrieval_metrics(bad, "q", "rank", "rel").collect()

    rows = [(f"q{i % 7}", (i // 7) + 1, (i * 11) % 3 == 0)
            for i in range(210)]
    d2 = spark.createDataFrame(rows, "q string, rank long, rel boolean")
    got = sorted(map(tuple,
                     retrieval_metrics(d2, "q", "rank", "rel",
                                       k=10).collect()))
    con = duckdb.connect()
    con.execute("create table t (q varchar, rank bigint, rel boolean)")
    con.executemany("insert into t values (?,?,?)", rows)
    want = sorted(map(tuple, con.execute(retrieval_metrics_sql(
        rel="t", query_col="q", rank_col="rank", rel_col="rel",
        k=10)).fetchall()))
    assert got == want
