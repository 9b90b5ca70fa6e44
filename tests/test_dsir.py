"""DSIR importance resampling: Spark vs driver-side Python reference,
DuckDB-regenerated oracle parity at unit scale, the exact smoothing
normalization identity, validation contracts, partition invariance, a
persist/no-Python plan gate, and the registered query's both-classes
invariant at sf0.01 and sf0.1."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.dsir import (
    _logp_e6_py,
    dsir_features,
    dsir_py,
    dsir_sql,
    dsir_weights,
)

BUCKETS = 32  # small on purpose: collisions must occur

# target-shaped docs, off-target docs, OOV, repeats, <1-token docs,
# empty/NULL text, punctuation-only, case folding
CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog", True),
    (1, "the quick brown fox sat on the mat", True),
    (2, "The QUICK brown dog jumps over the quick fox", True),
    (3, "spark shuffle partitions exchange broadcast join", False),
    (4, "the the the the the", False),
    (5, "zzz unseen words qqq everywhere xxx", False),
    (6, "singleton", False),      # 1 token -> unigram only, no bigrams
    (7, "", False),               # empty -> zero features
    (8, None, False),             # NULL -> zero features
    (9, "!!! ... ???", False),    # punctuation-only -> zero features
    (10, "fox the quick quick", False),  # target-ish vocabulary
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string, is_t boolean")
    feats = dsir_features(df, "doc_id", "text", buckets=BUCKETS, carry=("is_t",))
    w = dsir_weights(feats, "doc_id", target=F.col("is_t"), buckets=BUCKETS)
    return df, feats, w


def test_weights_match_python(scored):
    _, _, w = scored
    ref = dsir_py(CORPUS, buckets=BUCKETS)
    got = {r["doc_id"]: (r["n_feats"], r["weight_e6"]) for r in w.collect()}
    # zero-feature docs are absent from the operator frame by contract
    expect = {i: v for i, v in ref.items() if v[0] > 0}
    assert got == expect
    assert set(ref) - set(got) == {7, 8, 9}


def test_weights_match_duckdb_unit_scale(scored, spark):
    df, _, _ = scored
    con = duckdb.connect()
    con.execute(
        "create table docs (doc_id bigint, text varchar, is_t boolean)"
    )
    con.executemany("insert into docs values (?, ?, ?)", CORPUS)
    rows = con.execute(
        dsir_sql(score_from="docs", id_col="doc_id", text_col="text",
                 target_where="is_t", buckets=BUCKETS)
    ).fetchall()
    ref = dsir_py(CORPUS, buckets=BUCKETS)
    assert {r[0]: (r[1], r[2]) for r in rows} == ref


def test_smoothing_normalization_identity_exact_integers():
    """Σ_{b∈[0,B)} (c_b·kd + kn) == T·kd + kn·B in exact integers — the
    smoothed bucket model is a true distribution. (The per-bucket log
    terms are the only place a double appears; the identity is what
    makes the rational smoothing well-posed.)"""
    from collections import Counter

    from logparser_llm_spark.functions.hashing import md5_bucket
    from logparser_llm_spark.operators.dsir import _grams_py

    kd, kn = 2, 1
    c = Counter()
    for _, text, is_t in CORPUS:
        if is_t:
            c.update(md5_bucket(g, BUCKETS) for g in _grams_py(text))
    t = sum(c.values())
    lhs = sum(c.get(b, 0) * kd + kn for b in range(BUCKETS))
    assert lhs == t * kd + kn * BUCKETS


def test_quantization_is_half_up():
    # the Python mirror must round half away from zero like F.round
    assert _logp_e6_py(0, 1, 2, 1, 1) == -1_098_612  # ln(1/3)
    x = _logp_e6_py(4, 1, 2, 1, 1)                   # ln(5/3) > 0
    assert x == 510_826


def test_partition_invariance(scored, spark):
    df, _, _ = scored
    outs = []
    for n in (1, 8):
        feats = dsir_features(
            df.repartition(n), "doc_id", "text", buckets=BUCKETS, carry=("is_t",)
        )
        w = dsir_weights(feats, "doc_id", target=F.col("is_t"), buckets=BUCKETS)
        outs.append(sorted(map(tuple, w.collect())))
    assert outs[0] == outs[1]


def test_validation_contracts(scored, spark):
    df, feats, _ = scored
    with pytest.raises(ValueError, match="buckets"):
        dsir_features(df, "doc_id", "text", buckets=1)
    with pytest.raises(ValueError, match="positive rational"):
        dsir_weights(feats, "doc_id", target=F.col("is_t"),
                     buckets=BUCKETS, k_num=0)
    with pytest.raises(ValueError, match="buckets"):
        dsir_sql(score_from="docs", id_col="doc_id", text_col="text",
                 target_where="is_t", buckets=1)
    with pytest.raises(ValueError, match="target subset"):
        dsir_weights(feats, "doc_id", target=F.lit(False), buckets=BUCKETS)
    empty = spark.createDataFrame([(0, "!!!", True)],
                                  "doc_id bigint, text string, is_t boolean")
    with pytest.raises(ValueError, match="empty"):
        dsir_weights(
            dsir_features(empty, "doc_id", "text", buckets=BUCKETS, carry=("is_t",)),
            "doc_id", target=F.col("is_t"), buckets=BUCKETS,
        )


def test_plan_persists_features_and_stays_jvm(scored):
    """The feature frame must be reused (persisted) by the scoring sum,
    and nothing in the plan may drop to Python."""
    _, _, w = scored
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_keeps_both_classes(spark, sf):
    """The keep cutoff must actually split the corpus at BOTH driver
    scales, and zero-feature docs must surface with keep = false."""
    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["dsir_select"][0](spark, sf)
    classes = {r["keep"] for r in out.select("keep").distinct().collect()}
    assert classes == {True, False}


def test_reserved_carry_names_rejected(spark):
    df = spark.createDataFrame([(1, "a b", 3)], "doc_id bigint, text string, cnt bigint")
    with pytest.raises(ValueError, match="reserved"):
        dsir_features(df, "doc_id", "text", buckets=8, carry=("cnt",))
