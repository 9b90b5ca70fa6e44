"""operators/ledger.py — drop provenance ledger + attrition funnel."""

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)


def _ledger(spark, rows):
    from logparser_llm_spark.operators.ledger import drop_ledger

    df = spark.createDataFrame(rows, "id long, t string")
    return {r["id"]: r for r in
            drop_ledger(df, "id", "t", min_words=5,
                        badwords=["verboten"]).collect()}


def test_ledger_first_drop_wins_precedence(spark):
    """A doc failing MULTIPLE stages lands in the EARLIEST one: a
    duplicate of a too-short bad-worded page is exact_dup, not
    too_short; NULL and whitespace-only are invalid even though they
    also have 0 words."""
    rows = [
        (1, None),
        (2, "   "),
        (3, "verboten x"),            # first holder, short AND bad → too_short
        (4, "verboten x"),            # duplicate of 3 → exact_dup wins
        (5, "one two three four five six"),      # kept
        (6, "one two three four five verboten"),  # long enough, bad
    ]
    got = _ledger(spark, rows)
    assert got[1]["stage"] == "invalid"
    assert got[2]["stage"] == "invalid"
    assert got[3]["stage"] == "too_short" and got[3]["is_first"]
    assert got[4]["stage"] == "exact_dup" and not got[4]["is_first"]
    assert got[5]["stage"] == "kept"
    assert got[6]["stage"] == "badwords" and got[6]["n_bad"] == 1


def test_ledger_family_first_holder_flows_through(spark):
    """Keep-first dedup: the min-id holder of a family is judged on
    its own merits (kept here), every later holder is exact_dup — and
    invalid rows form their own families without stealing firstness
    from valid text."""
    blob = "alpha beta gamma delta epsilon zeta"
    rows = [(9, blob), (3, blob), (7, blob), (1, ""), (2, "")]
    got = _ledger(spark, rows)
    assert got[3]["stage"] == "kept"
    assert got[7]["stage"] == "exact_dup" and got[9]["stage"] == "exact_dup"
    assert got[1]["stage"] == "invalid" and got[2]["stage"] == "invalid"


def test_ledger_validation(spark):
    from logparser_llm_spark.operators.ledger import (
        drop_ledger,
        drop_ledger_sql,
    )

    df = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(ValueError, match="min_words"):
        drop_ledger(df, "id", "t", min_words=0, badwords=["a"])
    with pytest.raises(ValueError, match="min_words"):
        drop_ledger_sql(rel="t", id_col="id", text_col="t",
                        min_words=-1, badwords=["a"])
    with pytest.raises(ValueError, match="blocklist"):
        drop_ledger_sql(rel="t", id_col="id", text_col="t",
                        min_words=5, badwords=["Bad Word"])


def test_ledger_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.ledger import (
        drop_funnel,
        drop_funnel_sql,
        drop_ledger,
        drop_ledger_sql,
    )

    rows = []
    for i in range(80):
        if i % 11 == 0:
            rows.append((i, None if i % 22 == 0 else " "))
        elif i % 7 == 0:
            rows.append((i, "dup blob alpha beta gamma delta"))
        elif i % 5 == 0:
            rows.append((i, f"verboten plus w{i} x y z q"))
        else:
            rows.append((i, " ".join(f"w{j}" for j in range(i % 9))))
    df = spark.createDataFrame(rows, "id long, t string")
    led = drop_ledger(df, "id", "t", min_words=4, badwords=["verboten"])
    got = sorted(map(tuple, led.collect()))
    con = duckdb.connect()
    con.execute("create table t (id bigint, t varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    lsql = drop_ledger_sql(rel="t", id_col="id", text_col="t",
                           min_words=4, badwords=["verboten"])
    assert got == sorted(map(tuple, con.execute(lsql).fetchall()))
    fgot = sorted(map(tuple, drop_funnel(led).collect()))
    assert fgot == sorted(map(tuple, con.execute(
        drop_funnel_sql(ledger_sql=lsql)).fetchall()))


def test_ledger_partition_invariance(spark):
    from logparser_llm_spark.operators.ledger import drop_ledger

    rows = [(i, "dup" if i % 3 == 0 else f"w{i} a b c d e") for i in range(90)]
    df = spark.createDataFrame(rows, "id long, t string")
    a = sorted(map(tuple, drop_ledger(
        df.repartition(1), "id", "t", min_words=3,
        badwords=["zz"]).collect()))
    b = sorted(map(tuple, drop_ledger(
        df.repartition(11), "id", "t", min_words=3,
        badwords=["zz"]).collect()))
    assert a == b


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_drop_ledger_registered_classes(spark, sf):
    """Every planted residue class lands in its stage; each dup
    family's min valid id flows through to kept; the funnel partitions
    the corpus exactly."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["drop_ledger"][0](spark, sf).collect()
    got = {r["doc_id"]: r for r in rows}
    blob_ids = []
    for r in rows:
        d = r["doc_id"]
        if d % 41 == 0:
            assert r["stage"] == "invalid", r
        elif d % 23 == 0:
            blob_ids.append(d)
        elif d % 19 == 0:
            assert r["stage"] == "badwords", r
            assert r["n_words"] >= 50, r  # died at the blocklist, not length
        elif d % 17 == 0:
            assert r["stage"] == "kept", r
    first = min(blob_ids)
    assert got[first]["stage"] == "kept", got[first]
    for d in blob_ids:
        if d != first:
            assert got[d]["stage"] == "exact_dup", got[d]

    funnel = {r["stage"]: r for r in
              QUERIES["drop_funnel"][0](spark, sf).collect()}
    assert set(funnel) == {"invalid", "exact_dup", "too_short",
                           "badwords", "kept"}, sf
    assert sum(r["n_docs"] for r in funnel.values()) == len(rows), sf
    for r in funnel.values():
        assert r["share_e6"] == round(1e6 * r["n_docs"] / len(rows)), r


# --- dup_family_histogram ----------------------------------------------------


def test_dup_family_histogram_exact_counts_and_null(spark):
    """Hand corpus: 3 copies of A, 2 of B, singletons C and D, one
    NULL and one '' (which share the empty family) → histogram
    {3: 1 family, 2: 2 families, 1: 2 families}; doc mass partitions
    the corpus exactly."""
    from logparser_llm_spark.operators.ledger import dup_family_histogram

    rows = [(i, t) for i, t in enumerate(
        ["A", "A", "A", "B", "B", "C", "D", None, ""])]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["family_size"]: r for r in
           dup_family_histogram(df, "t").collect()}
    assert got[3]["n_families"] == 1
    assert got[2]["n_families"] == 2   # B-family and the NULL/'' family
    assert got[1]["n_families"] == 2   # C, D
    assert sum(r["n_docs"] for r in got.values()) == 9
    assert got[3]["docs_share_e6"] == round(1e6 * 3 / 9)


def test_dup_family_histogram_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.ledger import (
        dup_family_histogram,
        dup_family_histogram_sql,
    )

    rows = [(i, f"fam{i % 6}" if i % 3 else "mega") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, t string")
    got = sorted(map(tuple, dup_family_histogram(df, "t").collect()))
    con = duckdb.connect()
    con.execute("create table t (id bigint, t varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = dup_family_histogram_sql(rel="t", text_col="t")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_dup_family_hist_registered_classes(spark, sf):
    """The planted %7 mega-family appears as ONE family holding ~1/7
    of the corpus; singleton families exist; doc mass partitions the
    corpus exactly and shares recompute from the rows."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["dup_family_hist"][0](spark, sf).collect()
    total = sum(r["n_docs"] for r in rows)
    mega = max(rows, key=lambda r: r["family_size"])
    assert mega["n_families"] == 1, sf
    assert mega["family_size"] == (total + 6) // 7, sf
    assert any(r["family_size"] == 1 for r in rows), sf
    for r in rows:
        assert r["n_docs"] == r["family_size"] * r["n_families"], r
        assert r["docs_share_e6"] == round(1e6 * r["n_docs"] / total), r
