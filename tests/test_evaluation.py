"""Binary-classifier evaluation (operators/evaluation.py): differential
vs the module Python reference, hand-computed AUC pins (perfect /
inverted / interleaved-with-ties), DuckDB twin parity, validation and
execution-time guard contracts, plan gates, and the registered
quality_eval / quality_auc queries' class-completeness at sf0.01 AND
sf0.1."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.evaluation import (
    calibration_bins,
    calibration_py,
    calibration_sql,
    eval_auc,
    eval_auc_py,
    eval_auc_sql,
    eval_curve,
    eval_curve_sql,
    eval_py,
)

# ties at 5 (1 pos, 1 neg) and at -2 (2 neg), a negative-score positive:
# exercises the midrank tie term and the below-zero ordering
ROWS = [
    (9, True), (7, True), (5, True), (5, False), (3, False),
    (1, True), (0, False), (-2, False), (-2, False), (-4, True),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "score bigint, y boolean")


def test_curve_and_auc_match_python_reference(spark):
    curve_ref, (p, n, auc_ref) = eval_py(ROWS)
    got_curve = [
        tuple(r)
        for r in eval_curve(_df(spark, ROWS), "score", "y")
        .orderBy(F.desc("score"))
        .collect()
    ]
    assert got_curve == curve_ref
    got_auc = eval_auc(_df(spark, ROWS), "score", "y").collect()[0]
    assert (got_auc["n_pos"], got_auc["n_neg"], got_auc["auc_e6"]) == (
        p, n, auc_ref
    )
    # exact hand check of the tie algebra: P=5, N=5, pairs won:
    # pos 9,7 beat all 5 negs (10); pos 5 beats 4 negs + ties 1 (4.5·2=9);
    # pos 1 beats 3 negs (6); pos -4 beats none (0) → num2 = 35
    assert auc_ref == 35 * 1_000_000 // (2 * 5 * 5)


def test_auc_extremes_and_monotone_curve(spark):
    perfect = [(10, True), (9, True), (1, False), (0, False)]
    inverted = [(s, not y) for s, y in perfect]
    assert eval_auc(_df(spark, perfect), "score", "y").collect()[0][
        "auc_e6"
    ] == 1_000_000
    assert eval_auc(_df(spark, inverted), "score", "y").collect()[0][
        "auc_e6"
    ] == 0
    rows = eval_curve(_df(spark, ROWS), "score", "y").orderBy(
        "score", ascending=False
    ).collect()
    # tp/fp cumulative, recall monotone non-decreasing, final recall = 1
    tps = [r["tp"] for r in rows]
    recs = [r["recall_e6"] for r in rows]
    assert tps == sorted(tps) and recs == sorted(recs)
    assert recs[-1] == 1_000_000
    assert all(r["tp"] + r["fn"] == 5 for r in rows)


def test_matches_duckdb_twin_unit_scale(spark):
    con = duckdb.connect()
    con.register("ev", pd.DataFrame(ROWS, columns=["score", "y"]))
    curve_oracle = sorted(
        tuple(r)
        for r in con.sql(
            eval_curve_sql(rel="ev", score_col="score", label_col="y")
        ).fetchall()
    )
    got = sorted(
        tuple(r) for r in eval_curve(_df(spark, ROWS), "score", "y").collect()
    )
    assert got == curve_oracle
    auc_oracle = con.sql(
        eval_auc_sql(rel="ev", score_col="score", label_col="y")
    ).fetchall()
    got_auc = [
        tuple(r) for r in eval_auc(_df(spark, ROWS), "score", "y").collect()
    ]
    assert got_auc == auc_oracle
    assert eval_auc_py(ROWS) == auc_oracle[0][2]


def test_validation_contracts(spark):
    df = _df(spark, ROWS)
    with pytest.raises(ValueError, match="unknown score column"):
        eval_curve(df, "zz", "y")
    with pytest.raises(ValueError, match="unknown label column"):
        eval_auc(df, "score", "zz")
    dbl = spark.createDataFrame([(1.5, True)], "score double, y boolean")
    with pytest.raises(ValueError, match="must be integral"):
        eval_curve(dbl, "score", "y")
    intlab = spark.createDataFrame([(1, 1)], "score bigint, y bigint")
    with pytest.raises(ValueError, match="must be boolean"):
        eval_auc(intlab, "score", "y")


def test_single_class_raises_at_execution(spark):
    """The class-presence guards are woven into the KEPT expressions
    (the bigram_pmi lesson) — they must actually fire."""
    all_neg = [(s, False) for s, _ in ROWS]
    with pytest.raises(Exception, match="no positive labels"):
        eval_curve(_df(spark, all_neg), "score", "y").collect()
    with pytest.raises(Exception, match="both classes"):
        eval_auc(_df(spark, all_neg), "score", "y").collect()
    all_pos = [(s, True) for s, _ in ROWS]
    with pytest.raises(Exception, match="both classes"):
        eval_auc(_df(spark, all_pos), "score", "y").collect()
    # zero negatives is legal for the curve (precision still defined)
    rows = eval_curve(_df(spark, all_pos), "score", "y").collect()
    assert all(r["precision_e6"] == 1_000_000 for r in rows)


def test_plan_partial_agg_and_no_python(spark):
    from logparser_llm_spark.plans.inspect import physical_plan

    plan = physical_plan(eval_auc(_df(spark, ROWS), "score", "y"))
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    plan_c = physical_plan(eval_curve(_df(spark, ROWS), "score", "y"))
    assert "BatchEvalPython" not in plan_c and "ArrowEvalPython" not in plan_c


def test_calibration_three_way_parity_with_negative_scores(spark):
    """Negative scores pin the floor-division binning (a truncating
    spelling puts score -1 in bin 0 with width 5 and the three
    spellings diverge — the cohort/burst review lesson applied here
    from birth)."""
    rows = [(-7, False), (-1, False), (0, True), (4, True), (5, True),
            (9, False), (12, True), (-1, True)]
    got = sorted(
        tuple(r)
        for r in calibration_bins(
            _df(spark, rows), "score", "y", bin_width=5
        ).collect()
    )
    ref = calibration_py(rows, bin_width=5)
    assert got == ref
    # floor semantics: -7 and -1 land in bins -2 and -1, never bin 0
    assert [r[0] for r in got] == [-2, -1, 0, 1, 2]
    # the -1 tie bin: mean of (-1, -1) floors to -1 (not trunc-to-0)
    by_bin = {r[0]: r for r in got}
    assert by_bin[-1][6] == -1
    con = duckdb.connect()
    con.register("cal", pd.DataFrame(rows, columns=["score", "y"]))
    oracle = sorted(
        tuple(r)
        for r in con.sql(
            calibration_sql(
                rel="cal", score_col="score", label_col="y", bin_width=5
            )
        ).fetchall()
    )
    assert oracle == ref
    with pytest.raises(ValueError, match="bin_width"):
        calibration_bins(_df(spark, rows), "score", "y", bin_width=0)


SCALES = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf", SCALES)
def test_quality_queries_class_complete(spark, sf):
    from logparser_llm_spark.plans.queries import q_quality_auc, q_quality_eval

    auc = q_quality_auc(spark, sf).collect()[0]
    assert auc["n_pos"] > 0 and auc["n_neg"] > 0
    # the length baseline beats chance but trip-line rule failures on
    # long docs keep it strictly imperfect
    assert 550_000 < auc["auc_e6"] < 999_999
    rows = q_quality_eval(spark, sf).orderBy(
        "score", ascending=False
    ).collect()
    assert len(rows) >= 20  # real tie structure: many distinct counts
    assert rows[-1]["recall_e6"] == 1_000_000
    # both label classes really appear among the score rows
    assert any(r["n_pos"] > 0 for r in rows)
    assert any(r["n_neg"] > 0 for r in rows)


@pytest.mark.parametrize("sf", SCALES)
def test_quality_calibration_monotone_tendency(spark, sf):
    from logparser_llm_spark.plans.queries import q_quality_calibration

    rows = sorted(
        (r["bin"], r["n"], r["pos_permille"])
        for r in q_quality_calibration(spark, sf).collect()
    )
    assert len(rows) >= 4  # several populated 20-word bins
    assert all(n >= 1 for _, n, _ in rows)
    # the length score is informative: the keep rate in the best bin
    # beats the worst bin by a wide margin (calibration has signal)
    rates = [p for _, _, p in rows]
    assert max(rates) - min(rates) >= 300


# --- cohens_kappa ------------------------------------------------------------


def test_cohens_kappa_textbook_values_and_edges(spark):
    """The classic 2x2 example lands exactly on kappa = 0.4; perfect
    balanced disagreement = −1.0 (sign-peeled quantization, floor ==
    truncate divergence covered); both-raters-constant emits NULL (den
    0 — undefined, not perfect); NULL labels count as a real label."""
    from logparser_llm_spark.operators.evaluation import cohens_kappa

    rows = (
        [("g1", "y", "y")] * 20 + [("g1", "y", "n")] * 5
        + [("g1", "n", "y")] * 10 + [("g1", "n", "n")] * 15
        + [("g2", "x", "x")] * 7
        + [("g3", "y", "n")] * 5 + [("g3", "n", "y")] * 5
        + [("g4", None, "y")] * 3 + [("g4", "y", "y")] * 3
    )
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {r["g"]: r for r in cohens_kappa(df, "g", "a", "b").collect()}
    assert (got["g1"]["n"], got["g1"]["agree"], got["g1"]["kappa_e6"]) \
        == (50, 35, 400_000)
    assert got["g2"]["kappa_e6"] is None
    assert got["g3"]["kappa_e6"] == -1_000_000
    # g4: b constant, a split ∅/y → pe_num = n·agree → kappa exactly 0
    assert got["g4"]["kappa_e6"] == 0 and got["g4"]["n"] == 6


def test_cohens_kappa_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.evaluation import (
        cohens_kappa,
        cohens_kappa_sql,
    )

    labels = ["a", "b", "c"]
    rows = [
        (f"g{i % 4}", labels[(i * 7) % 3],
         labels[(i * 7 + (1 if i % 5 == 0 else 0)) % 3])
        for i in range(240)
    ] + [(f"g0", None, "a")] * 4
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = sorted(map(tuple, cohens_kappa(df, "g", "a", "b").collect()))
    con = duckdb.connect()
    con.execute("create table t (g varchar, a varchar, b varchar)")
    con.executemany("insert into t values (?,?,?)", rows)
    want = sorted(map(tuple, con.execute(cohens_kappa_sql(
        rel="t", group_col="g", rater_a="a", rater_b="b")).fetchall()))
    assert got == want


def test_cohens_kappa_partition_invariance_and_plan(spark):
    from logparser_llm_spark.operators.evaluation import cohens_kappa
    from logparser_llm_spark.plans.inspect import plan_facts

    rows = [(f"g{i % 3}", f"l{(i * 11) % 4}", f"l{(i * 5) % 4}")
            for i in range(300)]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    x = sorted(map(tuple,
                   cohens_kappa(df.repartition(1), "g", "a", "b").collect()))
    y = sorted(map(tuple,
                   cohens_kappa(df.repartition(13), "g", "a", "b").collect()))
    assert x == y
    facts = plan_facts(cohens_kappa(df, "g", "a", "b"))
    assert facts["partial_aggregate"]
    assert not facts["python_udf"] and not facts["map_in_pandas"]


# --- confusion_scorecard -----------------------------------------------------


def test_confusion_scorecard_matrix_laws_and_duckdb(spark):
    """tp, supports and predicted counts follow the matrix exactly;
    F1 is the exact 2tp/(n_true+n_pred) rational; predicted-only
    classes carry NULL recall, never-predicted classes NULL
    precision; NULL labels are the '∅' class; DuckDB parity."""
    import duckdb

    from logparser_llm_spark.operators.evaluation import (
        confusion_scorecard,
        confusion_scorecard_sql,
    )

    rows = ([("en", "en")] * 40 + [("en", "de")] * 10
            + [("de", "de")] * 20 + [("de", "en")] * 5
            + [("zh", "zh")] * 3 + [(None, "en")] * 2
            + [("fr", "ghost")] * 4)
    df = spark.createDataFrame(rows, "t string, p string")
    got = sorted(map(tuple, confusion_scorecard(df, "t", "p").collect()))
    con = duckdb.connect()
    con.execute("create table t (t varchar, p varchar)")
    con.executemany("insert into t values (?,?)", rows)
    want = sorted(map(tuple, con.execute(confusion_scorecard_sql(
        rel="t", truth_col="t", pred_col="p")).fetchall()))
    assert got == want
    d = {r[0]: r for r in got}
    assert d["en"][1:4] == (50, 47, 40)
    assert d["en"][6] == 2 * 40 * 1_000_000 // 97
    assert d["ghost"][1:4] == (0, 4, 0) and d["ghost"][5] is None
    assert d["fr"][2] == 0 and d["fr"][4] is None
    assert d["∅"][1] == 2
