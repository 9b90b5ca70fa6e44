"""Naive Bayes classifier: Spark (OOV-baseline rearrangement) vs the
driver-side naive-algebra reference, DuckDB-regenerated oracle parity at
unit scale, the exact smoothing normalization identity, deterministic
tie-break, validation contracts, partition invariance, a persist/
no-Python plan gate, and the registered query's better-than-chance
accuracy at sf0.01 and sf0.1."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.classifier import (
    _q_e6_py,
    nb_predict,
    nb_predict_py,
    nb_sql,
    nb_train,
    nb_train_py,
)

# two separable classes + one all-empty class; OOV words, repeats,
# case folding, empty/NULL text, punctuation-only, shared vocabulary
TRAIN = [
    (0, "spark", "the quick brown fox jumps over the lazy dog"),
    (1, "spark", "the quick brown fox sat on the mat"),
    (2, "spark", "The QUICK brown dog naps by the quick fox"),
    (3, "duck", "shuffle partitions exchange broadcast join"),
    (4, "duck", "broadcast exchange shuffle shuffle the join"),
    (5, "empty", ""),
    (6, "empty", None),
]
SCORE = TRAIN + [
    # fully in-vocabulary (an OOV word would let the all-empty class's
    # uniform 1/V likelihood win — correct NB behavior, pinned via the
    # reference match; doc 9 covers the OOV path)
    (7, "spark", "the quick brown fox naps by the lazy dog"),
    (8, "duck", "shuffle broadcast exchange join"),  # duck-shaped
    (9, "spark", "zzz unseen words qqq"),            # pure OOV
    (10, "spark", ""),                               # empty -> priors only
    (11, "spark", "!!! ... ???"),                    # punct-only
]


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(TRAIN, "doc_id bigint, lang string, text string")
    return nb_train(df, "text", "lang")


@pytest.fixture(scope="module")
def predicted(spark, model):
    words, classes, v = model
    sc = spark.createDataFrame(SCORE, "doc_id bigint, lang string, text string")
    return nb_predict(sc, "doc_id", "text", words, classes, v)


def test_predictions_match_python(predicted):
    wc, n_c, docs, v = nb_train_py([(l, t) for _, l, t in TRAIN])
    expect = {
        i: nb_predict_py(t, wc, n_c, docs, v) for i, _, t in SCORE
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["pred_label"], r["score_e6"], r["margin_e6"])
        for r in predicted.collect()
    }
    assert got == expect
    # the shaped docs actually classify to their shape
    assert got[7][1] == "spark" and got[8][1] == "duck"


def test_matches_duckdb_unit_scale(predicted):
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, lang varchar, text varchar)")
    con.executemany("insert into docs values (?, ?, ?)", SCORE)
    rows = con.execute(
        nb_sql(train_where="doc_id <= 6", score_from="docs",
               id_col="doc_id", text_col="text", label_col="lang")
    ).fetchall()
    got = {
        r["doc_id"]: (r["n_tokens"], r["pred_label"], r["score_e6"], r["margin_e6"])
        for r in predicted.collect()
    }
    assert {r[0]: (r[1], r[2], r[3], r[4]) for r in rows} == got


def test_empty_doc_scores_on_priors_alone(predicted):
    """Zero-token docs get pred = max-prior class ('spark' has 3 of 7
    training docs — the strict prior argmax) with n_tokens = 0."""
    got = {r["doc_id"]: r for r in predicted.collect()}
    for i in (10, 11):
        assert got[i]["n_tokens"] == 0
        assert got[i]["pred_label"] == "spark"


def test_tiebreak_is_smallest_label(spark):
    """Two classes trained on identical text produce identical scores
    for every document — the argmax must break to the smaller label
    with margin exactly 0 (both engines order by score desc, label asc)."""
    tr = [(0, "bbb", "alpha beta gamma"), (1, "aaa", "alpha beta gamma")]
    df = spark.createDataFrame(tr, "doc_id bigint, lang string, text string")
    words, classes, v = nb_train(df, "text", "lang")
    out = nb_predict(df, "doc_id", "text", words, classes, v).collect()
    assert all(r["pred_label"] == "aaa" and r["margin_e6"] == 0 for r in out)


def test_smoothing_normalization_identity_exact_integers():
    """Σ_{w∈V} (c_wc·kd + kn) == n_c·kd + kn·V per class in exact
    integers — the smoothed likelihood is a true distribution (holds
    because n_c is the class token total over the same vocabulary)."""
    wc, n_c, docs, v = nb_train_py([(l, t) for _, l, t in TRAIN])
    vocab = {w for (_, w) in wc}
    assert len(vocab) == v
    kd, kn = 10, 1
    for label in docs:
        lhs = sum(wc.get((label, w), 0) * kd + kn for w in vocab)
        assert lhs == n_c[label] * kd + kn * v


def test_quantization_is_half_up():
    assert _q_e6_py(1, 3) == -1_098_612
    assert _q_e6_py(5, 3) == 510_826


def test_partition_invariance(spark, model):
    words, classes, v = model
    outs = []
    for n in (1, 8):
        sc = spark.createDataFrame(
            SCORE, "doc_id bigint, lang string, text string"
        ).repartition(n)
        out = nb_predict(sc, "doc_id", "text", words, classes, v)
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1]


def test_validation_contracts(spark, model):
    words, classes, v = model
    sc = spark.createDataFrame(SCORE, "doc_id bigint, lang string, text string")
    with pytest.raises(ValueError, match="NULL label"):
        nb_train(
            spark.createDataFrame(
                [(0, None, "a b")], "doc_id bigint, lang string, text string"
            ),
            "text", "lang",
        )
    with pytest.raises(ValueError, match="empty"):
        nb_train(
            spark.createDataFrame([], "doc_id bigint, lang string, text string"),
            "text", "lang",
        )
    with pytest.raises(ValueError, match="no tokens"):
        nb_train(
            spark.createDataFrame(
                [(0, "x", "!!!")], "doc_id bigint, lang string, text string"
            ),
            "text", "lang",
        )
    with pytest.raises(ValueError, match="positive rational"):
        nb_predict(sc, "doc_id", "text", words, classes, v, k_num=0)
    with pytest.raises(ValueError, match="vocabulary size"):
        nb_predict(sc, "doc_id", "text", words, classes, 0)
    with pytest.raises(ValueError, match="NULL label"):
        nb_train_py([("x", "a"), (None, "b")])


def test_plan_persists_words_and_stays_jvm(predicted):
    """The word-count frame must be reused (persisted) by the scoring
    join, and nothing in the plan may drop to Python."""
    plan = predicted._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_beats_chance(spark, sf):
    """The trained language head must beat 5-class chance on the
    held-out 20% — the prediction is learned signal, not a constant —
    and both correct branches must occur."""
    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["nb_classify"][0](spark, sf)
    rows = out.where(~F.col("is_train")).select("correct").collect()
    acc = sum(r["correct"] for r in rows) / len(rows)
    assert acc > 0.28, acc
    assert {r["correct"] for r in rows} == {True, False}
