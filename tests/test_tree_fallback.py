"""The fallback="tree" assignment path: rows whose extract-pattern is
absent from the broadcast map run the fuzzy tree walk (incremental-corpus
scenario — new data against an old pool)."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.cluster import (
    assign_templates,
    discover_templates,
)

OLD_CORPUS = [
    "Failed to connect to database db-01 on port 5432",
    "Failed to connect to database db-02 on port 5433",
    "Failed to connect to database db-03 on port 5434",
    "User alice logged in from 10.0.0.1 successfully",
    "User bobby logged in from 10.0.0.2 successfully",
]

# new lines whose extract pattern is NOT in the old pool, but whose tokens
# fuzzy-match an old template's path (levenshtein ≥ 0.8 at some level)
NEW_LINES = [
    # 'databasa' ~ 'database' similarity 7/8 = 0.875 ≥ 0.8 → fuzzy hit
    "Failed to connect to databasa db-09 on port 9999",
    # totally new shape → no match at all
    "Scheduler fired cron job cleanup without incident",
]


@pytest.fixture(scope="module")
def pool(spark):
    df = spark.createDataFrame([(t,) for t in OLD_CORPUS], "text string")
    return discover_templates(df, "text")


def test_unknown_fallback_without_tree(spark, pool):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(NEW_LINES)], "i int, text string")
    out = {r["i"]: r["template_id"] for r in assign_templates(df, "text", pool).collect()}
    assert out[0] == "unknown"  # exact-map miss, no tree
    assert out[1] == "unknown"


def test_tree_fallback_fuzzy_matches(spark, pool):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(NEW_LINES)], "i int, text string")
    out = {
        r["i"]: r["template_id"]
        for r in assign_templates(df, "text", pool, fallback="tree").collect()
    }
    failed_tid = next(
        t["template_id"] for t in pool if t["pattern"].startswith("Failed to connect")
    )
    assert out[0] == failed_tid  # fuzzy walk recovered the old template
    assert out[1] == "unknown"  # genuinely new shape still falls through


def test_tree_fallback_does_not_change_exact_hits(spark, pool):
    """Rows covered by the broadcast map get identical ids in both modes
    (the masked UDF must be a no-op for them)."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(OLD_CORPUS)], "i int, text string")
    plain = {r["i"]: r["template_id"] for r in assign_templates(df, "text", pool).collect()}
    tree = {
        r["i"]: r["template_id"]
        for r in assign_templates(df, "text", pool, fallback="tree").collect()
    }
    assert plain == tree
    assert "unknown" not in plain.values()