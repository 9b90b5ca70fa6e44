"""Deterministic sampling operators (training-data rebalancing)."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.sampling import (
    hash_sample,
    reservoir_per_key,
    stratified_sample,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


def test_hash_sample_fraction_and_determinism(spark, docs):
    n = docs.count()
    kept = hash_sample(docs, "doc_id", 0.3)
    k1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # md5 buckets are uniform: 30% ± a generous binomial margin
    assert 0.2 * n <= len(k1) <= 0.4 * n, (len(k1), n)
    # identical set on re-run and at any partitioning
    k2 = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    }
    assert k1 == k2
    # monotone: a smaller fraction's sample is a subset of a larger one's
    k_small = {
        r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).select("doc_id").collect()
    }
    assert k_small <= k1


def test_stratified_sample_rates_per_stratum(spark, docs):
    rates = {"en": 0.1, "de": 0.9}
    kept = stratified_sample(docs, "doc_id", "lang", rates, default_rate=0.5)
    got = {r["lang"]: r["kept"] for r in kept.groupBy("lang").agg(F.count("*").alias("kept")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, total in totals.items():
        rate = rates.get(lang, 0.5)
        observed = got.get(lang, 0) / total
        assert abs(observed - rate) < 0.15, (lang, observed, rate)
    # rate 0 strata vanish entirely
    none = stratified_sample(docs, "doc_id", "lang", {"en": 0.0}, default_rate=0.0)
    assert none.count() == 0


def test_stratified_sample_is_pure_predicate(spark, docs):
    """The scale claim: one Filter over the scan — no join, no shuffle,
    no Python workers in the plan."""
    plan = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.05}, 0.2
    )._jdf.queryExecution().executedPlan().toString()
    for op in ("Join", "Exchange", "Python"):
        assert op not in plan, f"{op} in plan:\n{plan[:800]}"


def test_reservoir_per_key_exact_k_and_invariance(spark, docs):
    k = 7
    out = reservoir_per_key(docs, "lang", "doc_id", k)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, total in totals.items():
        assert sizes[lang] == min(k, total)
    # deterministic: same chosen ids at any partitioning
    a = sorted((r["lang"], r["doc_id"]) for r in out.select("lang", "doc_id").collect())
    b = sorted(
        (r["lang"], r["doc_id"])
        for r in reservoir_per_key(docs.repartition(17), "lang", "doc_id", k)
        .select("lang", "doc_id")
        .collect()
    )
    assert a == b
    # the reservoir is id-set-dependent only: dropping unchosen rows and
    # re-running reproduces the same choice (reservoir property)
    chosen = out.select("lang", "doc_id")
    again = reservoir_per_key(
        docs.join(chosen.select("doc_id"), "doc_id", "left_semi"), "lang", "doc_id", k
    )
    c = sorted((r["lang"], r["doc_id"]) for r in again.select("lang", "doc_id").collect())
    assert a == c


def test_sampling_rejects_nonportable_key_types(spark):
    """ADVICE r3: double/timestamp keys render differently in Spark's
    cast('string') vs DuckDB's varchar cast — rejected up front instead
    of silently desynchronizing the cross-engine sample."""
    import pytest

    from logparser_llm_spark.operators.sampling import hash_sample, stratified_sample

    df = spark.createDataFrame(
        [(1, 1.5, "en"), (2, 2.5e20, "de")], "id bigint, score double, lang string"
    )
    with pytest.raises(ValueError, match="score"):
        hash_sample(df, "score", 0.5)
    with pytest.raises(ValueError, match="score"):
        stratified_sample(df, "score", "lang", {"en": 0.5})
    with pytest.raises(ValueError, match="not in"):
        hash_sample(df, "missing", 0.5)
    # string and integer keys stay accepted
    assert hash_sample(df, "id", 1.0).count() == 2
    assert hash_sample(df, "lang", 1.0).count() == 2


def test_quota_mix_semantics(spark):
    """Quota arithmetic, short-stratum keep-all, exclusion of unlisted
    keys, and md5-rank determinism (set independent of row order)."""
    from logparser_llm_spark.operators.sampling import quota_mix

    rows = [(i, "en") for i in range(50)] + [(i, "de") for i in range(50, 58)] + [
        (i, "xx") for i in range(58, 70)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = quota_mix(df, "lang", "doc_id", {"en": 0.5, "de": 0.4}, 40)
    got = [(r["doc_id"], r["lang"]) for r in out.collect()]
    by_lang = {}
    for i, lang in got:
        by_lang.setdefault(lang, set()).add(i)
    assert len(by_lang.get("en", ())) == 20   # floor(0.5 * 40)
    assert len(by_lang.get("de", ())) == 8    # quota 16 > available 8
    assert "xx" not in by_lang                # unlisted -> default 0
    # determinism: shuffled input chooses the same set
    df2 = spark.createDataFrame(list(reversed(rows)), "doc_id bigint, lang string")
    got2 = {(r["doc_id"], r["lang"]) for r in
            quota_mix(df2, "lang", "doc_id", {"en": 0.5, "de": 0.4}, 40).collect()}
    assert got2 == set(got)


def test_quota_mix_validation(spark):
    from logparser_llm_spark.operators.sampling import quota_mix, quota_mix_sql

    df = spark.createDataFrame([(1, "en")], "doc_id bigint, lang string")
    with pytest.raises(ValueError, match="total"):
        quota_mix(df, "lang", "doc_id", {"en": 0.5}, -1)
    with pytest.raises(ValueError, match="fractions"):
        quota_mix(df, "lang", "doc_id", {"en": 1.5}, 10)
    with pytest.raises(ValueError, match="quotes"):
        quota_mix(df, "lang", "doc_id", {"e'n": 0.5}, 10)
    with pytest.raises(ValueError, match="quotes"):
        quota_mix_sql("t", "lang", "doc_id", {"e'n": 0.5}, 10)


def test_quota_mix_int_keys_and_collision_guard(spark):
    from logparser_llm_spark.operators.sampling import quota_mix

    df = spark.createDataFrame(
        [(i, i % 2) for i in range(20)], "doc_id bigint, bucket int"
    )
    out = quota_mix(df, "bucket", "doc_id", {}, 10, default_frac=0.5)
    got = out.groupBy("bucket").count().collect()
    assert {r["bucket"]: r["count"] for r in got} == {0: 5, 1: 5}
    bad = df.withColumnRenamed("bucket", "__rk")
    with pytest.raises(ValueError, match="__rk"):
        quota_mix(bad.withColumn("bucket", bad["__rk"]), "bucket", "doc_id", {}, 10)


# --- deterministic dataset split -----------------------------------------

def test_dataset_split_partition_disjoint_exhaustive(spark):
    from logparser_llm_spark.operators.sampling import dataset_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = dataset_split(df, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    rows = out.collect()
    assert len(rows) == 2000                      # exhaustive
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert sum(len(v) for v in by.values()) == 2000   # disjoint
    # proportions near the targets (md5-uniform)
    assert 0.85 < len(by["train"]) / 2000 < 0.95
    # stability: re-running over a SUBSET never moves a doc's split
    sub = dataset_split(
        df.where("doc_id % 3 = 0"), "doc_id",
        {"train": 0.9, "val": 0.05, "test": 0.05},
    ).collect()
    full = {r["doc_id"]: r["split"] for r in rows}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)


def test_dataset_split_matches_duckdb_and_validates(spark):
    import duckdb
    import pytest as _pytest

    from logparser_llm_spark.operators.sampling import (
        dataset_split,
        dataset_split_sql,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    srows = sorted(
        (r["doc_id"], r["split"])
        for r in dataset_split(df, "doc_id", {"a": 0.5, "b": 0.5}).collect()
    )
    con = duckdb.connect()
    case = dataset_split_sql("doc_id", {"a": 0.5, "b": 0.5})
    orows = sorted(map(tuple, con.execute(
        f"select doc_id, {case} from range(0, 500) t(doc_id)").fetchall()))
    assert srows == orows
    with _pytest.raises(ValueError, match="sum to 1"):
        dataset_split(df, "doc_id", {"train": 0.5, "val": 0.1})
    with _pytest.raises(ValueError, match=">= 1/"):
        dataset_split(df, "doc_id", {"train": 1.0, "val": 0.00001})
    with _pytest.raises(ValueError, match="at least one"):
        dataset_split_sql("doc_id", {})
    has_split = df.withColumn("split", df.doc_id.cast("string"))
    with _pytest.raises(ValueError, match="'split' column"):
        dataset_split(has_split, "doc_id", {"a": 1.0})


# --- weighted sampling (Efraimidis-Spirakis) ----------------------------

def test_weighted_sample_matches_python_and_duckdb(spark):
    import duckdb

    from logparser_llm_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_py,
        weighted_sample_sql,
    )

    rows = [(i, (i % 7) + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    got = [
        (r["id"], r["es_key_e12"])
        for r in weighted_sample(df, "id", "w", 12, seed="t").collect()
    ]
    ref = weighted_sample_py(rows, 12, seed="t")
    assert sorted(got) == sorted(ref)
    con = duckdb.connect()
    con.execute("create table t (id bigint, w bigint)")
    con.executemany("insert into t values (?, ?)", rows)
    duck = con.execute(
        weighted_sample_sql(from_rel="t", key_expr="id", weight_expr="w",
                            k=12, seed="t", select="id")
    ).fetchall()
    assert sorted(duck) == sorted(ref)


def test_weighted_sample_is_without_replacement_and_seeded():
    from logparser_llm_spark.operators.sampling import weighted_sample_py

    rows = [(i, 1) for i in range(20)]
    out = weighted_sample_py(rows, 30, seed="a")  # k > n -> everything
    assert len(out) == 20 and len({k for k, _ in out}) == 20
    a = weighted_sample_py(rows, 5, seed="a")
    b = weighted_sample_py(rows, 5, seed="b")
    assert a == weighted_sample_py(rows, 5, seed="a")  # reproducible
    assert a != b  # seed actually enters the hash


def test_weighted_sample_frequency_tracks_weights():
    """k=1 E-S is exact: P(pick a) = w_a / (w_a + w_b). Over 200 fixed
    seeds with weights 9:1 the empirical frequency must sit within 4
    sigma of 0.9 — a real distribution check, fully deterministic."""
    from logparser_llm_spark.operators.sampling import weighted_sample_py

    rows = [("a", 9), ("b", 1)]
    wins = sum(
        weighted_sample_py(rows, 1, seed=f"s{i}")[0][0] == "a"
        for i in range(200)
    )
    assert 0.82 <= wins / 200 <= 0.97, wins


def test_weighted_sample_heavy_weight_dominates(spark):
    from logparser_llm_spark.operators.sampling import weighted_sample

    rows = [(i, 1) for i in range(99)] + [(999, 1000)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    got = {r["id"] for r in weighted_sample(df, "id", "w", 10, seed="r5").collect()}
    assert 999 in got and len(got) == 10


def test_weighted_sample_plan_is_take_ordered_no_shuffle(spark):
    from logparser_llm_spark.operators.sampling import weighted_sample
    from logparser_llm_spark.plans.inspect import physical_plan, plan_facts

    df = spark.createDataFrame([(i, 1) for i in range(50)], "id bigint, w bigint")
    out = weighted_sample(df, "id", "w", 5)
    plan = physical_plan(out)
    assert "TakeOrderedAndProject" in plan
    facts = plan_facts(out)
    assert facts["exchanges"] == 0 and not facts["python_udf"]


def test_weighted_sample_validation(spark):
    from logparser_llm_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_py,
    )

    df = spark.createDataFrame([(1, 2)], "id bigint, w bigint")
    with pytest.raises(ValueError, match="positive int"):
        weighted_sample(df, "id", "w", 0)
    with pytest.raises(ValueError, match="integer-typed"):
        weighted_sample(
            spark.createDataFrame([(1, 0.5)], "id bigint, w double"),
            "id", "w", 1,
        )
    with pytest.raises(ValueError, match="sampling key"):
        weighted_sample(
            spark.createDataFrame([(0.5, 1)], "id double, w bigint"),
            "id", "w", 1,
        )
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_sample(
            spark.createDataFrame([(1, 0)], "id bigint, w bigint"),
            "id", "w", 1,
        ).collect()
    with pytest.raises(ValueError, match="non-positive weight"):
        weighted_sample_py([(1, 0)], 1)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_weighted_sample_registered_query_prefers_long_docs(spark, sf):
    """Selection ∝ length: the sampled mean document length must exceed
    the corpus mean (loose but deterministic — the gap is wide)."""
    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["weighted_sample"][0](spark, sf)
    rows = out.collect()
    assert len(rows) == 50
    corpus_mean = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .agg(F.avg("n_chars")).collect()[0][0]
    )
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_weighted_sample_reserved_columns_rejected(spark):
    from logparser_llm_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 2, 3)], "id bigint, w bigint, es_key_e12 bigint")
    with pytest.raises(ValueError, match="reserved"):
        weighted_sample(df, "id", "w", 1)


# --- apportion (largest remainder) -------------------------------------------


def test_apportion_hand_case_total_law_and_bounds(spark):
    """The classic Hamilton hand case allocates the three largest
    remainders; Σ quota == total EXACTLY (the defining property);
    every quota is floor-or-ceil of the exact share; exact
    divisibility leaves no top-ups; validation."""
    import duckdb
    import pytest as _pytest

    from logparser_llm_spark.operators.sampling import (
        apportion,
        apportion_sql,
    )

    rows = [("a", 7), ("a", 3), ("b", 3), ("c", 3), ("d", 1)]
    df = spark.createDataFrame(rows, "k string, s long")
    got = sorted(map(tuple, apportion(df, "k", "s", total=10).collect()))
    con = duckdb.connect()
    con.execute("create table t (k varchar, s bigint)")
    con.executemany("insert into t values (?,?)", rows)
    want = sorted(map(tuple, con.execute(apportion_sql(
        rel="t", key_col="k", size_col="s", total=10)).fetchall()))
    assert got == want
    d = {r[0]: r for r in got}
    assert (d["a"][4], d["b"][4], d["c"][4], d["d"][4]) == (6, 2, 2, 0)
    assert sum(r[4] for r in got) == 10
    for key, size, base, rem, quota in got:
        assert quota in (base, base + 1)
    even = spark.createDataFrame([("x", 2), ("y", 2)], "k string, s long")
    q = {r["key"]: r["quota"]
         for r in apportion(even, "k", "s", total=8).collect()}
    assert q == {"x": 4, "y": 4}
    with _pytest.raises(ValueError, match="total"):
        apportion(df, "k", "s", total=-1)
    with _pytest.raises(ValueError, match="total"):
        apportion_sql(rel="t", key_col="k", size_col="s",
                      total=10**9 + 1)


def test_apportion_registered_query_total_exact(spark):
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["apportion_mix"][0](
        spark, "/root/testdata/sf0.001").collect()
    assert sum(r["quota"] for r in rows) == 10_000
    assert len(rows) == 20
    # geometric mass skew ⇒ quotas must actually differ
    assert len({r["quota"] for r in rows}) > 3
