"""functions/json.py + operators/profile.py:json_schema_profile —
typed JSON extraction with tolerant malformed semantics, cross-engine
guard parity, path-grammar validation, schema-drift profile."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.functions.json import (
    json_field,
    json_field_bigint,
    json_field_sql,
    json_valid,
    json_valid_sql,
)


def test_json_field_tolerant_semantics_and_duckdb_parity(spark):
    """Valid nested/array paths extract; missing paths, malformed
    docs, NULL docs and non-numeric casts all yield NULL — and the
    DuckDB twin (try_cast-to-JSON guarded) agrees row-for-row,
    INCLUDING on garbage."""
    rows = [
        ('{"meta": {"k": 87}, "tags": ["a","b"]}',),
        ('{"meta": {"k": "bad"}}',),
        ("junk",), (None,), ("5",), ("[1,2]",),
    ]
    df = spark.createDataFrame(rows, "j string")
    got = sorted(map(tuple, df.select(
        json_field_bigint(F.col("j"), "$.meta.k").alias("k"),
        json_field(F.col("j"), "$.tags[1]").alias("t"),
        json_field(F.col("j"), "$.meta.absent").alias("a"),
        json_valid(F.col("j")).alias("v"),
    ).collect()), key=str)
    con = duckdb.connect()
    con.execute("create table j (j varchar)")
    con.executemany("insert into j values (?)", rows)
    want = sorted(map(tuple, con.execute(f"""
        select {json_field_sql('j', '$.meta.k', as_bigint=True)} as k,
               {json_field_sql('j', '$.tags[1]')} as t,
               {json_field_sql('j', '$.meta.absent')} as a,
               {json_valid_sql('j')} as v
        from j""").fetchall()), key=str)
    assert got == want
    # the valid row extracts; garbage rows are all-NULL not errors
    assert ((87, "b", None, True) in got)
    assert ((None, None, None, False) in got)


def test_json_path_grammar_validation(spark):
    for bad in ("$..k", "$", "$.a[*]", "$.a['q']", "meta.k", "$.a[-1]"):
        with pytest.raises(ValueError, match="JSON path"):
            json_field(F.lit("{}"), bad)
        with pytest.raises(ValueError, match="JSON path"):
            json_field_sql("j", bad)
    # the supported grammar passes
    json_field(F.lit("{}"), "$.a.b[0].c")


def test_json_schema_profile_classes_and_invalid_share(spark):
    """Each group's key shares sum over real keys + the ∅invalid
    share; arrays/scalars/NULL/malformed all land in ∅invalid; the
    share denominator is the WHOLE group."""
    from logparser_llm_spark.operators.profile import (
        json_schema_profile,
        json_schema_profile_sql,
    )

    rows = [
        ("click", '{"k": 1, "x": 2}'), ("click", '{"k": 3}'),
        ("click", "junk{"),
        ("view", '{"k": 1, "y": [1,2]}'), ("view", None),
        ("view", "[1,2]"), ("view", "5"),
    ]
    df = spark.createDataFrame(rows, "g string, j string")
    got = sorted(map(tuple, json_schema_profile(df, "g", "j").collect()))
    con = duckdb.connect()
    con.execute("create table t (g varchar, j varchar)")
    con.executemany("insert into t values (?,?)", rows)
    want = sorted(map(tuple, con.execute(json_schema_profile_sql(
        rel="t", group_col="g", json_col="j")).fetchall()))
    assert got == want
    d = {(r[0], r[1]): (r[2], r[3]) for r in got}
    assert d[("click", "k")] == (2, 666_666)
    assert d[("click", "∅invalid")] == (1, 333_333)
    assert d[("view", "∅invalid")] == (3, 750_000)


def test_props_extract_query_classes(spark):
    """Registered staging: malformed class ≡0 (mod 13) is all-NULL
    with valid=false; every valid row extracts k as bigint, tag0 as
    the event type, and the missing path as NULL."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["props_extract"][0](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        if r["event_id"] % 13 == 0:
            assert (r["k"], r["tag0"], r["valid"]) == (None, None, False)
        else:
            assert r["valid"] is True and r["k"] is not None
            assert r["tag0"] and r["tag0"].isalpha()  # the event type
            assert r["absent"] is None


def test_json_extraction_stays_jvm_codegen(spark):
    """The hot path must be pure JVM — no Python workers; the single
    allowed exchange is the explicit r6 fan-out of the one-file sf
    table (a real corpus's input splits make it unnecessary — the
    gopher_repetition gate precedent), never a shuffle of the
    extraction itself."""
    from logparser_llm_spark.plans.inspect import plan_facts
    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["props_extract"][0](spark, "/root/testdata/sf0.001")
    facts = plan_facts(out)
    assert facts["exchanges"] <= 1
    assert not facts["python_udf"] and not facts["map_in_pandas"]
    # with the fan-out exchange the pre-execution explain is an
    # unresolved AdaptiveSparkPlan (codegen markers appear only per
    # materialized stage) — assert codegen on the EXECUTED plan
    out.collect()  # drives THIS DataFrame's queryExecution to the final plan
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "WholeStageCodegen" in executed or "*(" in executed
    assert "BatchEvalPython" not in executed and "ArrowEvalPython" not in executed
