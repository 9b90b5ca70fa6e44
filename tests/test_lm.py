"""Bigram-LM perplexity scoring: Spark vs driver-side Python reference,
DuckDB-regenerated oracle parity at unit scale, the exact normalization
identity, validation contracts, partition invariance, and the
registered query's both-classes invariant at sf0.01 and sf0.1."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.lm import (
    lm_score_bigram,
    lm_score_py,
    lm_score_sql,
    lm_train_bigram,
    lm_train_py,
)

# OOV words, unseen contexts, repeated bigrams, <2-token docs, empty and
# NULL text, punctuation-only, case folding
CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox sat on the mat"),
    (2, "The QUICK brown dog jumps over the quick fox"),
    (3, "a completely different sentence about spark shuffles"),
    (4, "the the the the the"),
    (5, "zzz unseen words qqq everywhere xxx"),   # OOV-heavy
    (6, "singleton"),                              # 1 token -> 0 bigrams
    (7, ""),                                       # empty
    (8, None),                                     # NULL
    (9, "!!! ... ???"),                            # punctuation-only
    (10, "fox the"),                               # seen words, unseen bigram
]
TRAIN_IDS = {0, 1, 2, 3, 4}


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    train = df.where(F.col("doc_id").isin(*TRAIN_IDS))
    bigrams, contexts, v = lm_train_bigram(train, "text")
    return df, bigrams, contexts, v


def test_train_matches_python(model):
    df, bigrams, contexts, v = model
    pb, pc, pv = lm_train_py([t for i, t in CORPUS if i in TRAIN_IDS])
    got_b = {(r["w1"], r["w2"]): r["c12"] for r in bigrams.collect()}
    got_c = {r["w1"]: r["c1"] for r in contexts.collect()}
    assert got_b == dict(pb)
    assert got_c == dict(pc)
    assert v == pv


def test_normalization_identity_exact_integers(model):
    """Σ_{w2∈V} (c12·kd + kn) == c1·kd + kn·V per context, in exact
    integers — the property that makes c1 = Σ_w2 c12 (bigram-context
    counts, not raw unigram counts) the right denominator."""
    _, bigrams, contexts, v = model
    kd, kn = 10, 1
    sums = {r["w1"]: r["s"] for r in (
        bigrams.groupBy("w1").agg(F.sum(F.col("c12") * kd).alias("s")).collect()
    )}
    for r in contexts.collect():
        present = sums[r["w1"]]
        n_present = bigrams.where(F.col("w1") == r["w1"]).count()
        total = present + kn * n_present + kn * (v - n_present)
        assert total == r["c1"] * kd + kn * v


def test_score_matches_python(model):
    df, bigrams, contexts, v = model
    pb, pc, pv = lm_train_py([t for i, t in CORPUS if i in TRAIN_IDS])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_e6"], r["nll_per_gram_e6"])
        for r in lm_score_bigram(df, "doc_id", "text", bigrams, contexts, v).collect()
    }
    assert set(got) == {i for i, _ in CORPUS}, "every doc must survive scoring"
    for i, t in CORPUS:
        assert got[i] == lm_score_py(t or "", pb, pc, pv), f"doc {i}"


def test_score_matches_duckdb_unit_scale(model, spark):
    df, bigrams, contexts, v = model
    sdf = lm_score_bigram(df, "doc_id", "text", bigrams, contexts, v)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "create table documents(doc_id bigint, text varchar)"
    )
    con.executemany("insert into documents values (?, ?)", CORPUS)
    sql = lm_score_sql(
        train_where="doc_id in (0, 1, 2, 3, 4)", score_from="documents",
        id_col="doc_id", text_col="text",
    )
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == drows


def test_partition_invariance(model, spark):
    df, bigrams, contexts, v = model
    one = lm_score_bigram(
        df.repartition(1), "doc_id", "text", bigrams, contexts, v
    ).collect()
    eight = lm_score_bigram(
        df.repartition(8), "doc_id", "text", bigrams, contexts, v
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, eight))


def test_validation_contracts(model, spark):
    df, bigrams, contexts, v = model
    with pytest.raises(ValueError, match="positive rational"):
        lm_score_bigram(df, "doc_id", "text", bigrams, contexts, v, k_num=0)
    with pytest.raises(ValueError, match="positive rational"):
        lm_score_sql(train_where="1=1", score_from="documents",
                     id_col="doc_id", text_col="text", k_den=-1)
    empty = spark.createDataFrame([(0, "!!!")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm_train_bigram(empty, "text")


def test_scoring_stays_jvm(model):
    """No Python UDF anywhere in the scoring plan."""
    df, bigrams, contexts, v = model
    plan = lm_score_bigram(
        df, "doc_id", "text", bigrams, contexts, v
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_keeps_both_classes(spark, sf):
    """The keep cutoff must actually split the corpus at BOTH driver
    scales, or the registered query degenerates to a constant column."""
    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["lm_quality"][0](spark, sf)
    classes = {r["keep"] for r in out.select("keep").distinct().collect()}
    assert classes == {True, False}
