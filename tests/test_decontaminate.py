"""Benchmark decontamination: verdict semantics on a constructed
corpus (partial overlap, exact copy, sub-n floor, NULL text), the
zero-shuffle corpus-side plan contract, and registered-query sanity
(every benchmark-source doc must be flagged). DuckDB parity for the
registered ``decontaminate`` query runs via test_queries_oracle."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.decontaminate import (
    benchmark_gram_row,
    decontaminate,
)

SF = "/root/testdata/sf0.01"

BENCH_LINE = "the quick brown fox jumps over the lazy dog"


@pytest.fixture(scope="module")
def verdicts(spark):
    corpus = spark.createDataFrame(
        [
            # shares exactly one 5-gram window ("quick brown fox jumps over")
            (1, "we saw a quick brown fox jumps over and kept walking home"),
            (2, BENCH_LINE),  # exact copy: every gram hits
            (3, "completely unrelated prose about spark shuffle boundaries"),
            (4, "quick brown fox jumps"),  # 4 tokens < n=5: no grams
            (5, None),  # NULL text: no grams, never contaminated
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(BENCH_LINE,)], "bench_text string")
    out = decontaminate(corpus, "doc_id", "text", bench, "bench_text")
    return {r["doc_id"]: r for r in out.collect()}


def test_partial_overlap_flags(verdicts):
    r = verdicts[1]
    assert r["contaminated"] and r["n_hit"] == 1
    assert r["n_grams"] == 8  # 12 tokens -> 8 windows, all distinct


def test_exact_copy_all_grams_hit(verdicts):
    r = verdicts[2]
    assert r["contaminated"] and r["n_hit"] == r["n_grams"] == 5


def test_clean_doc_and_floor_and_null(verdicts):
    assert not verdicts[3]["contaminated"] and verdicts[3]["n_hit"] == 0
    assert verdicts[4]["n_grams"] == 0 and not verdicts[4]["contaminated"]
    assert verdicts[5]["n_grams"] == 0 and not verdicts[5]["contaminated"]
    assert verdicts[5]["text"] is None  # input columns pass through


def test_corpus_side_never_shuffles(spark):
    """The 100 TB contract: the verdict plan's only join is the one-row
    broadcast nested loop; no Exchange touches the corpus scan side.
    (The single Exchange in the plan feeds the benchmark-side global
    collect_set aggregate — the tiny side.)"""
    corpus = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("id").cast("string")).alias("text"),
    )
    bench = spark.createDataFrame([(BENCH_LINE,)], "bench_text string")
    out = decontaminate(corpus, "doc_id", "text", bench, "bench_text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # exactly the benchmark-side aggregate exchange, nothing on the
    # corpus lineage (a shuffle there would scale with the 100 TB side)
    assert plan.count("Exchange") <= 2  # partial+final agg of the 1-row side


def test_validation(spark):
    bench = spark.createDataFrame([(BENCH_LINE,)], "bench_text string")
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="id_col"):
        decontaminate(df, "missing", "text", bench, "bench_text")


def test_benchmark_gram_row_is_one_sorted_row(spark):
    bench = spark.createDataFrame(
        [(BENCH_LINE,), ("too short",), (BENCH_LINE,)], "bench_text string"
    )
    rows = benchmark_gram_row(bench, "bench_text").collect()
    assert len(rows) == 1
    grams = rows[0]["bench_grams"]
    assert grams == sorted(set(grams)) and len(grams) == 5


def test_registered_query_flags_every_bench_source_doc(spark):
    """Every doc_id % 37 == 0 document seeded the benchmark with its own
    token window, so per-source contaminated counts must be >= the
    per-source count of such docs (docs sharing grams add more)."""
    from logparser_llm_spark.plans.queries import DECON_BENCH_MOD, QUERIES

    out = {r["source"]: r for r in QUERIES["decontaminate"][0](spark, SF).collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet")
    seeded = {
        r["source"]: r["n"]
        for r in d.where(F.col("doc_id") % DECON_BENCH_MOD == 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(seeded.values()) > 0
    for src, n in seeded.items():
        assert out[src]["n_contaminated"] >= n, src
