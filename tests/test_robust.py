"""operators/robust.py — median/MAD outliers and shuffle-key skew audit."""

import pytest
from pyspark.sql import functions as F


# --- group_lower_median ------------------------------------------------------


def test_lower_median_odd_even_and_ties(spark):
    """Odd n picks the exact middle; even n picks the LOWER of the two
    middles (no averaging — integer law); ties collapse into one
    histogram bucket without shifting the rank."""
    from logparser_llm_spark.operators.robust import group_lower_median

    rows = (
        [("odd", v) for v in (10, 30, 20)]            # med 20
        + [("even", v) for v in (1, 2, 3, 4)]          # lower med 2
        + [("tied", v) for v in (5, 5, 5, 9, 9)]       # med 5
        + [("one", 7)]                                 # med 7
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r["med"] for r in group_lower_median(df, "g", "v").collect()}
    assert got == {"odd": 20, "even": 2, "tied": 5, "one": 7}


# --- mad_outliers ------------------------------------------------------------


def test_mad_outliers_flag_law_and_mad_zero(spark):
    """|x − med| > 3·MAD exactly (boundary value NOT flagged); a group
    that is >half constant has MAD 0, so ANY deviation flags."""
    from logparser_llm_spark.operators.robust import mad_outliers

    # g1: values 10,12,14,16,100 → med 14, absdevs 4,2,0,2,86 → MAD 2;
    # fence 6: only 100 flags (16 has absdev 2 ≤ 6; planted boundary
    # value 20 has absdev 6 == 3·2 → NOT flagged, strict >)
    g1 = [(i, "g1", v) for i, v in enumerate((10, 12, 14, 16, 100, 20))]
    # recompute: with 20 added n=6 → sorted 10,12,14,16,20,100, lower
    # med 14; absdevs 4,2,0,2,6,86 sorted 0,2,2,4,6,86 → lower MAD 2
    g2 = [(10 + i, "g2", v) for i, v in enumerate((7, 7, 7, 9))]  # MAD 0
    df = spark.createDataFrame(g1 + g2, "id long, g string, v long")
    got = {r["id"]: r for r in mad_outliers(df, "g", "v").collect()}
    assert got[0]["med"] == 14 and got[0]["mad"] == 2
    flags = {i: got[i]["is_outlier"] for i in range(6)}
    assert flags == {0: False, 1: False, 2: False, 3: False,
                     4: True, 5: False}, flags  # 20: absdev 6 == 3·MAD
    assert got[10]["mad"] == 0
    assert {i: got[i]["is_outlier"] for i in (10, 11, 12, 13)} == {
        10: False, 11: False, 12: False, 13: True}


def test_mad_outliers_validation(spark):
    from logparser_llm_spark.operators.robust import (
        mad_outliers,
        mad_outliers_sql,
    )

    df = spark.createDataFrame([(1, "g", 1)], "id long, g string, v long")
    with pytest.raises(ValueError, match="k must be"):
        mad_outliers(df, "g", "v", k=-1)
    with pytest.raises(ValueError, match="k must be"):
        mad_outliers_sql(rel="t", group_col="g", val_col="v",
                         cols="r.id", k=-2)


def test_mad_outliers_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.robust import (
        mad_outliers,
        mad_outliers_sql,
    )

    rows = [(i, f"g{i % 3}", ((i * 37) % 50) + (1000 if i % 17 == 0 else 0))
            for i in range(120)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = sorted(map(tuple, mad_outliers(df, "g", "v")
                     .select("id", "g", "v", "med", "mad", "is_outlier")
                     .collect()))
    con = duckdb.connect()
    con.execute("create table t (id bigint, g varchar, v bigint)")
    con.executemany("insert into t values (?, ?, ?)", rows)
    sql = mad_outliers_sql(rel="t", group_col="g", val_col="v",
                           cols="r.id, r.g, r.v")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


def test_mad_outliers_partition_invariance(spark):
    from logparser_llm_spark.operators.robust import mad_outliers

    rows = [(i, f"g{i % 4}", (i * 13) % 97) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    a = sorted(map(tuple, mad_outliers(df.repartition(1), "g", "v").collect()))
    b = sorted(map(tuple, mad_outliers(df.repartition(13), "g", "v").collect()))
    assert a == b


# --- key_skew_audit ----------------------------------------------------------


def test_skew_audit_closed_form_hand_check(spark):
    """Counts (1, 3) → Gini = (2·(1·1+2·3) − 3·4)/(2·4) = 2/8 → 250000;
    uniform counts → Gini 0; single key → Gini 0 but top1 = 100%."""
    from logparser_llm_spark.operators.robust import key_skew_audit

    rows = [(i, "a" if i == 0 else "b", i % 2) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, k string, u long")
    got = {r["candidate"]: r for r in key_skew_audit(df, {
        "skewed": F.col("k"),
        "uniform": F.col("u"),
        "single": F.lit(1),
    }).collect()}
    s = got["skewed"]
    assert (s["n_keys"], s["top1_cnt"], s["top1_share_e6"], s["gini_e6"]) \
        == (2, 3, 750_000, 250_000)
    assert got["uniform"]["gini_e6"] == 0
    assert got["single"]["gini_e6"] == 0
    assert got["single"]["top1_share_e6"] == 1_000_000


def test_skew_audit_tie_rank_invariance_and_validation(spark):
    """Rank-weighted sum over a tie block is order-invariant: many keys
    with equal counts give Gini 0 regardless of partitioning."""
    from logparser_llm_spark.operators.robust import (
        key_skew_audit,
        key_skew_audit_sql,
    )

    rows = [(i, i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, k long")
    for parts in (1, 7):
        r = key_skew_audit(df.repartition(parts), {"k": F.col("k")}).collect()
        assert r[0]["gini_e6"] == 0 and r[0]["n_keys"] == 10
    with pytest.raises(ValueError, match="at least one"):
        key_skew_audit(df, {})
    with pytest.raises(ValueError, match="at least one"):
        key_skew_audit_sql(rel="t", candidates={})


# --- registered queries ------------------------------------------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_mad_outliers_registered_classes(spark, sf):
    """Planted %397 spikes (+1000.00, above the natural max) MUST
    flag; every flag is recomputable from the row's own (value, med,
    mad); both classes are populated per type."""
    from collections import defaultdict

    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["mad_outliers"][0](spark, sf).collect()
    by_type = defaultdict(set)
    for r in rows:
        assert r["is_outlier"] == (
            abs(r["value_e2"] - r["med_e2"]) > 3 * r["mad_e2"]
        ), r
        if r["event_id"] % 397 == 0:
            assert r["is_outlier"], r
        by_type[r["event_type"]].add(r["is_outlier"])
    assert len(by_type) == 5, sf
    for t, classes in by_type.items():
        assert classes == {True, False}, (sf, t)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_skew_audit_registered_classes(spark, sf):
    """The four candidates rank as designed: the degenerate single key
    is 100% top-share with Gini 0, event_type's parallelism ceiling is
    5, user_id is the only safe key (top1 share < 2%)."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = {r["candidate"]: r for r in
            QUERIES["skew_audit"][0](spark, sf).collect()}
    assert set(rows) == {"user_id", "event_type", "hour_of_day", "single"}, sf
    n = rows["user_id"]["n_rows"]
    assert all(r["n_rows"] == n for r in rows.values()), sf
    assert rows["single"]["top1_share_e6"] == 1_000_000
    assert rows["single"]["gini_e6"] == 0
    assert rows["event_type"]["n_keys"] == 5
    assert rows["hour_of_day"]["n_keys"] == 24
    assert rows["user_id"]["n_keys"] > 100, sf
    assert rows["user_id"]["top1_share_e6"] < 20_000, sf
    assert rows["event_type"]["top1_cnt"] > rows["hour_of_day"]["top1_cnt"]


# --- quantile_normalize ------------------------------------------------------


def test_quantile_normalize_rank_law_and_ties(spark):
    """min → 0, unique max → exactly 1e6, interior ranks are exact
    strictly-below fractions, ties share one value, single-row group
    → 0 (guarded denominator)."""
    from logparser_llm_spark.operators.robust import quantile_normalize

    rows = [(0, "g", 10), (1, "g", 20), (2, "g", 20), (3, "g", 30),
            (4, "g", 40), (5, "solo", 7)]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    got = {r["id"]: r["pct_e6"]
           for r in quantile_normalize(df, "g", "s").collect()}
    assert got[0] == 0
    assert got[1] == got[2] == 250_000   # 1 strictly below, n-1 = 4
    assert got[3] == 750_000
    assert got[4] == 1_000_000
    assert got[5] == 0


def test_quantile_normalize_cross_group_comparability(spark):
    """The same raw score maps to different percentiles per group —
    the whole point: a score that is 'good' in one language can be
    'bad' in another."""
    from logparser_llm_spark.operators.robust import quantile_normalize

    rows = [(i, "lo", s) for i, s in enumerate((1, 2, 3, 4, 100))] + \
           [(10 + i, "hi", s) for i, s in enumerate((100, 200, 300, 400, 500))]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    got = {r["id"]: r["pct_e6"]
           for r in quantile_normalize(df, "g", "s").collect()}
    assert got[4] == 1_000_000   # 100 is lo's max
    assert got[10] == 0          # 100 is hi's min


def test_quantile_normalize_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.robust import (
        quantile_normalize,
        quantile_normalize_sql,
    )

    rows = [(i, f"g{i % 3}", (i * 11) % 13) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    got = sorted(map(tuple, quantile_normalize(df, "g", "s")
                     .select("id", "g", "s", "pct_e6").collect()))
    con = duckdb.connect()
    con.execute("create table t (id bigint, g varchar, s bigint)")
    con.executemany("insert into t values (?, ?, ?)", rows)
    sql = quantile_normalize_sql(rel="t", group_col="g", score_col="s",
                                 cols="r.id, r.g, r.s")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_quantile_norm_registered_classes(spark, sf):
    """Every language spans the full [0, 1e6] band (min 0, some doc at
    1e6); within a language pct is monotone in the raw score; every
    value is recomputable from the language's own score multiset."""
    from collections import defaultdict

    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["quantile_norm"][0](spark, sf).collect()
    by = defaultdict(list)
    for r in rows:
        by[r["lang"]].append((r["entropy_e6"], r["pct_e6"]))
    assert len(by) == 5, sf
    for lang, pairs in by.items():
        ps = [p for _, p in pairs]
        assert min(ps) == 0, (sf, lang)
        assert max(ps) == 1_000_000, (sf, lang)
        pairs.sort()
        for (s1, p1), (s2, p2) in zip(pairs, pairs[1:]):
            assert (s1 == s2 and p1 == p2) or (s1 < s2 and p1 < p2), (lang, s1, s2)
        n = len(pairs)
        scores = [s for s, _ in pairs]
        for s, p in pairs[:50]:
            below = sum(1 for x in scores if x < s)
            assert p == round(1e6 * below / max(n - 1, 1)), (lang, s, p)


# --- trimmed_mean ------------------------------------------------------------


def test_trimmed_mean_exact_laws_and_sign(spark):
    """k = n·permille DIV 1000 from each end by rank; k = 0 degrades to
    the plain mean; a huge outlier vanishes once k >= 1; negative sums
    divide with the peeled sign (truncate-vs-floor trap); heavy trim
    on 3 values keeps exactly the median."""
    from logparser_llm_spark.operators.robust import trimmed_mean

    rows = (
        [("g", v) for v in (1, 2, 3, 4, 100)]
        + [("h", v) for v in range(1, 21)] + [("h", 10**6)]
        + [("neg", v) for v in (-7, -5, -3)]
        + [("tiny", 5)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r[0]: tuple(r) for r in trimmed_mean(df, "g", "v").collect()}
    assert got["g"] == ("g", 5, 5, 22_000_000)        # k=0: plain mean
    assert got["h"][1:] == (21, 17, 187 * 1_000_000 // 17)
    assert got["neg"][3] == -5_000_000
    assert got["tiny"][1:] == (1, 1, 5_000_000)
    m = {r[0]: tuple(r) for r in trimmed_mean(
        spark.createDataFrame([("x", 1), ("x", 50), ("x", 9)],
                              "g string, v long"),
        "g", "v", trim_permille=400).collect()}
    assert m["x"][1:] == (3, 1, 9_000_000)


def test_trimmed_mean_validation_and_duckdb(spark):
    import duckdb
    import pytest as _pytest

    from logparser_llm_spark.operators.robust import (
        trimmed_mean,
        trimmed_mean_sql,
    )

    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with _pytest.raises(ValueError, match="trim_permille"):
        trimmed_mean(df, "g", "v", trim_permille=500)
    with _pytest.raises(ValueError, match="trim_permille"):
        trimmed_mean_sql(rel="t", group_col="g", val_col="v",
                         trim_permille=-1)
    rows = [(f"g{i % 4}", ((i * 37) % 100) - 50
             + (10_000 if i % 23 == 0 else 0)) for i in range(200)]
    d2 = spark.createDataFrame(rows, "g string, v long")
    got = sorted(map(tuple,
                     trimmed_mean(d2, "g", "v",
                                  trim_permille=150).collect()))
    con = duckdb.connect()
    con.execute("create table t (g varchar, v bigint)")
    con.executemany("insert into t values (?,?)", rows)
    want = sorted(map(tuple, con.execute(trimmed_mean_sql(
        rel="t", group_col="g", val_col="v",
        trim_permille=150)).fetchall()))
    assert got == want


def test_trimmed_mean_resists_staged_spam_in_query(spark):
    """In the registered staging the ×100 spam class must drag the RAW
    mean far above the trimmed mean on every source."""
    from pyspark.sql import functions as F2

    from logparser_llm_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    trimmed = {r["source"]: r["mean_e6"]
               for r in QUERIES["trimmed_quality"][0](spark, sf).collect()}
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "source",
        F2.when(F2.expr("(doc_id div 20) % 17 = 0"),
                F2.col("n_chars") * 100)
        .otherwise(F2.col("n_chars")).alias("len"),
    )
    raw = {r["source"]: r["m"] for r in
           d.groupBy("source").agg(F2.avg("len").alias("m")).collect()}
    for src, tm in trimmed.items():
        assert raw[src] * 1_000_000 > 2 * tm, src  # raw mean at least 2x


# --- weighted_lower_median ---------------------------------------------------


def test_weighted_lower_median_laws(spark):
    """Mass concentrates where the weight says; unit weights degrade
    exactly to the lower median; all-zero-weight groups emit no row;
    negative weights raise via the woven assert; the registered query
    shows the doc-vs-byte median divergence on the spam tail."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    import pytest as _pytest

    from logparser_llm_spark.operators.robust import (
        group_lower_median,
        weighted_lower_median,
    )

    rows = [("g", 10, 1), ("g", 20, 5), ("g", 30, 1),
            ("h", 1, 0), ("h", 9, 0), ("z", 5, 2)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = sorted(map(tuple,
                     weighted_lower_median(df, "g", "v", "w").collect()))
    assert got == [("g", 20), ("z", 5)]
    u = spark.createDataFrame(
        [("a", v, 1) for v in (1, 2, 3, 4)], "g string, v long, w long")
    assert weighted_lower_median(u, "g", "v", "w").collect()[0]["wmed"] \
        == group_lower_median(u, "g", "v").collect()[0]["med"] == 2
    neg = spark.createDataFrame([("a", 1, -1)], "g string, v long, w long")
    with _pytest.raises(SparkRuntimeException, match="weights"):
        weighted_lower_median(neg, "g", "v", "w").collect()

    from logparser_llm_spark.plans.queries import QUERIES

    rows2 = QUERIES["weighted_len_median"][0](
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows2) == 20
    for r in rows2:
        assert r["byte_median"] >= r["doc_median"]
    # the spam tail must drag the byte median far above on most hosts
    assert sum(1 for r in rows2
               if r["byte_median"] > 5 * r["doc_median"]) >= 10
