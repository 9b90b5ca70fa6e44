"""Sink abstraction fallback, pool-cap behavior, parity-mode pipeline,
and skewed-corpus aggregation."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.config import PipelineConfig, ScaleConfig
from logparser_llm_spark.operators.cluster import (
    assign_templates,
    discover_templates,
)
from logparser_llm_spark.plans.pipeline import salted_counts
from logparser_llm_spark.sources.sinks import (
    iceberg_catalog,
    read_sink_table,
    write_sink_table,
)
from logparser_llm_spark.sources.synth import generate_log_lines


def test_sink_fallback_to_parquet(spark, tmp_path):
    assert not iceberg_catalog(spark)  # no runtime jars in this container
    df = spark.range(100).withColumn("sink_id", F.pmod("id", F.lit(4)))
    target = str(tmp_path / "sinks")
    fmt = write_sink_table(df, target, mode="overwrite")
    assert fmt == "parquet"
    back = read_sink_table(spark, target)
    assert back.count() == 100
    assert back.select("sink_id").distinct().count() == 4


def test_pool_cap_routes_tail_to_unknown(spark):
    lines = generate_log_lines(spark, 200, seed=23).cache()
    full_pool = discover_templates(lines, "text")
    cap = max(2, len(full_pool) // 4)
    cfg = PipelineConfig(scale=ScaleConfig(broadcast_pool_max_templates=cap))
    capped_pool = discover_templates(lines, "text", cfg)
    assert len(capped_pool) <= cap
    assigned = assign_templates(lines, "text", capped_pool, cfg)
    counts = {r["template_id"]: r["count"] for r in assigned.groupBy("template_id").count().collect()}
    assert "unknown" in counts  # the capped tail routes to the fallback sink
    assert sum(counts.values()) == lines.count()
    # the kept templates are the highest-frequency ones → they should cover
    # the majority of rows
    assert counts["unknown"] < lines.count() / 2


def test_parity_mode_pipeline_equals_default(spark):
    """arrow_parity_mode (Python-re UDF path) must produce identical
    assignments to the default JVM path on the synthetic corpus."""
    lines = generate_log_lines(spark, 150, seed=29).cache()
    default_cfg = PipelineConfig()
    parity_cfg = PipelineConfig(scale=ScaleConfig(arrow_parity_mode=True))
    pool_d = discover_templates(lines, "text", default_cfg)
    pool_p = discover_templates(lines, "text", parity_cfg)
    assert [(t["template_id"], t["pattern"]) for t in pool_d] == [
        (t["template_id"], t["pattern"]) for t in pool_p
    ]
    a_d = {
        (r["url"], r["line_no"]): r["template_id"]
        for r in assign_templates(lines, "text", pool_d, default_cfg).collect()
    }
    a_p = {
        (r["url"], r["line_no"]): r["template_id"]
        for r in assign_templates(lines, "text", pool_p, parity_cfg).collect()
    }
    assert a_d == a_p


def test_salted_counts_on_skewed_corpus(spark):
    """80% of rows share one key (web-boilerplate skew); the salted
    two-phase aggregate must still be exact."""
    skewed = spark.range(50_000).select(
        F.when(F.col("id") % 5 != 0, F.lit("tmpl_boilerplate"))
        .otherwise(F.concat(F.lit("tmpl_"), (F.col("id") % 97).cast("string")))
        .alias("template_id"),
        F.pmod(F.col("id"), F.lit(4)).alias("sink_id"),
    )
    got = {
        (r["sink_id"], r["template_id"]): r["doc_count"]
        for r in salted_counts(skewed, ["sink_id", "template_id"], 16).collect()
    }
    want = {
        (r["sink_id"], r["template_id"]): r["count"]
        for r in skewed.groupBy("sink_id", "template_id").count().collect()
    }
    assert got == want
    assert sum(got.values()) == 50_000
