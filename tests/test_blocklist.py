"""Blocklist-as-a-join filtering (operators/blocklist.py): Python
reference differential, tokenizer canonicalization, the single-token
contract (woven guard fires at execution), NULL-text row survival,
DuckDB drift gate, and both-verdict-class pinning for the registered
query at sf0.01 and sf0.1."""

import pytest

from logparser_llm_spark.operators.blocklist import (
    blocklist_join,
    blocklist_join_py,
    blocklist_join_sql,
)

DOCS = {
    0: "The stream MERGE merge window",   # hits: stream, merge×2, window
    1: "clean tokens only",               # clean
    2: None,                              # NULL text → clean row, not dropped
    3: "zzzgone appears here",            # the otherwise-absent term
    4: "Window! window,WINDOW",           # punctuation-adjacent, one term
}
TERMS = ["Merge!", "STREAM", "window", "zzzgone"]


def _frames(spark):
    docs = spark.createDataFrame(
        list(DOCS.items()), "id long, text string"
    )
    bl = spark.createDataFrame([(t,) for t in TERMS], "term string")
    return docs, bl


def test_matches_python_reference(spark):
    docs, bl = _frames(spark)
    got = {
        r["id"]: (r["hits"], r["hit_terms"], r["clean"])
        for r in blocklist_join(docs, "id", "text", bl).collect()
    }
    assert got == blocklist_join_py(DOCS, TERMS)
    assert got[0] == (4, 3, False)
    assert got[1] == (0, 0, True)
    assert got[2] == (0, 0, True)   # NULL text emits a clean row
    assert got[3] == (1, 1, False)
    assert got[4] == (3, 1, False)  # case/punct collapse to one term


def test_matches_duckdb_unit_scale(spark):
    import duckdb

    docs, bl = _frames(spark)
    got = sorted(
        tuple(r) for r in blocklist_join(docs, "id", "text", bl).collect()
    )
    con = duckdb.connect()
    con.execute("create table docs (id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", list(DOCS.items()))
    vals = ", ".join(f"('{t}')" for t in TERMS)
    sql = blocklist_join_sql(
        doc_source="docs", id_col="id", text_col="text",
        blocklist_cte=f"select * from (values {vals}) t(term)",
    )
    assert got == sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_partition_invariance(spark):
    docs, bl = _frames(spark)
    a = blocklist_join(docs.repartition(1), "id", "text", bl).collect()
    b = blocklist_join(docs.repartition(7), "id", "text", bl).collect()
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_single_token_contract_fires_at_execution(spark):
    """A phrase entry would silently never match — it must raise, and
    from the KEPT term expression (the bigram_pmi dead-guard lesson)."""
    docs, _ = _frames(spark)
    phrases = docs.sparkSession.createDataFrame(
        [("two words",)], "term string"
    )
    with pytest.raises(Exception, match="single"):
        blocklist_join(docs, "id", "text", phrases).collect()
    with pytest.raises(ValueError, match="single token"):
        blocklist_join_py(DOCS, ["two words"])
    with pytest.raises(ValueError, match="reserved"):
        blocklist_join(docs.withColumnRenamed("text", "hits"), "id",
                       "hits", _frames(spark)[1])


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_classes_present(spark, sf):
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["blocklist_join"][0](spark, sf).collect()
    assert any(r["clean"] for r in rows), sf
    assert any(not r["clean"] for r in rows), sf
    # multi-term docs exist (hit_terms > 1) and counts are consistent
    assert any(r["hit_terms"] > 1 for r in rows), sf
    assert all(
        (r["hits"] == 0) == r["clean"] and r["hits"] >= r["hit_terms"]
        for r in rows
    )
