"""SCD Type-2 history: Spark vs the driver-side reference (A->B->A
re-appearance, NULL-attr islands, single observations, multiple keys,
unsorted input), DuckDB-regenerated oracle parity at unit scale,
partition invariance, the one-Exchange/no-Python plan gate, validation
contracts, and the registered query's interval-chain laws at sf0.01
and sf0.1."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.scd import scd2_history, scd2_py, scd2_sql

# (key, ts, attr) — deliberately unsorted within keys
ROWS = [
    ("a", 3, "v1"),   # a: v1 v1 v2 v1 -> 3 islands (re-appearance!)
    ("a", 1, "v1"),
    ("a", 2, "v1"),
    ("a", 4, "v2"),
    ("a", 5, "v1"),
    ("b", 1, "x"),    # b: constant -> 1 island
    ("b", 2, "x"),
    ("c", 1, None),   # c: NULL NULL y NULL -> 3 islands (null-safe)
    ("c", 2, None),
    ("c", 3, "y"),
    ("c", 4, None),
    ("d", 7, "solo"),  # d: single observation
]
# fix the a-rows: ts 1,2 = v1; 3 = v1; 4 = v2; 5 = v1
EXPECT_VERSIONS = {"a": 3, "b": 1, "c": 3, "d": 1}


@pytest.fixture(scope="module")
def hist(spark):
    df = spark.createDataFrame(ROWS, "k string, ts bigint, attr string")
    return scd2_history(df, ["k"], "ts", ["attr"])


def test_matches_python_reference(hist):
    got = _canon(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"],
         r["version"], r["is_current"])
        for r in hist.collect()
    )
    assert got == _canon(scd2_py(ROWS))
    versions = {}
    for k, *_ in got:
        versions[k] = versions.get(k, 0) + 1
    assert versions == EXPECT_VERSIONS


def _canon(rows):
    # None-safe total order (plain tuple sort dies on None < str)
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def test_matches_duckdb_unit_scale(hist):
    con = duckdb.connect()
    con.execute("create table snaps (k varchar, ts bigint, attr varchar)")
    con.executemany("insert into snaps values (?, ?, ?)", ROWS)
    rows = con.execute(
        scd2_sql(snapshots="snaps", key_cols=["k"],
                 ts_col="ts", attr_cols=["attr"])
    ).fetchall()
    assert _canon(rows) == _canon(hist.collect())


def test_interval_chain_laws(hist):
    """Per key: versions are 1..n, exactly one is_current (the last),
    and every valid_to equals the next island's valid_from."""
    by_key = {}
    for r in hist.collect():
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert [r["is_current"] for r in rs] == [False] * (len(rs) - 1) + [True]
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert rs[-1]["valid_to"] is None


def test_partition_invariance(spark):
    outs = []
    for n in (1, 8):
        df = spark.createDataFrame(
            ROWS, "k string, ts bigint, attr string"
        ).repartition(n)
        outs.append(_canon(scd2_history(df, ["k"], "ts", ["attr"]).collect()))
    assert outs[0] == outs[1]


def test_plan_one_exchange_no_python(spark):
    """All four keyed steps (lag, island sum, island agg, interval
    lead) must share the one key shuffle. A FRESH frame — an executed
    AQE plan prints Initial+Final sections and double-counts."""
    from logparser_llm_spark.plans.inspect import plan_facts

    df = spark.createDataFrame(ROWS, "k string, ts bigint, attr string")
    facts = plan_facts(scd2_history(df, ["k"], "ts", ["attr"]))
    assert facts["exchanges"] == 1, facts
    assert not facts["python_udf"]
    assert facts["partial_aggregate"]


def test_multi_attr_and_multi_key(spark):
    """Two keys + two attrs: a change in EITHER attr opens an island."""
    rows = [
        (1, "p", 1, "a", 10), (1, "p", 2, "a", 10),
        (1, "p", 3, "a", 20),            # attr2 change
        (1, "p", 4, "b", 20),            # attr1 change
        (1, "q", 1, "a", 10),            # different key partition
    ]
    df = spark.createDataFrame(rows, "k1 bigint, k2 string, ts bigint, a1 string, a2 bigint")
    out = scd2_history(df, ["k1", "k2"], "ts", ["a1", "a2"]).collect()
    p = sorted(
        (r["version"], r["a1"], r["a2"], r["valid_from"], r["valid_to"])
        for r in out if r["k2"] == "p"
    )
    assert p == [(1, "a", 10, 1, 3), (2, "a", 20, 3, 4), (3, "b", 20, 4, None)]
    assert [r for r in out if r["k2"] == "q"][0]["version"] == 1


def test_validation_contracts(spark):
    df = spark.createDataFrame(ROWS, "k string, ts bigint, attr string")
    with pytest.raises(ValueError, match="non-empty"):
        scd2_history(df, [], "ts", ["attr"])
    with pytest.raises(ValueError, match="non-empty"):
        scd2_sql(snapshots="s", key_cols=["k"], ts_col="ts", attr_cols=[])
    df2 = df.withColumnRenamed("attr", "valid_from")
    with pytest.raises(ValueError, match="reserved"):
        scd2_history(df2, ["k"], "ts", ["valid_from"])
    with pytest.raises(ValueError, match="duplicate"):
        scd2_py([("a", 1, "x"), ("a", 1, "y")])


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_branch_coverage(spark, sf):
    """Single-, two- and three-version keys must all occur, exactly one
    current row per key, and the chain must start at snapshot 1."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["scd2_history"][0](spark, sf).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["doc_id"], []).append(r)
    counts = {len(rs) for rs in by_key.values()}
    assert counts == {1, 2, 3}
    for rs in by_key.values():
        assert sum(r["is_current"] for r in rs) == 1
        assert min(r["valid_from"] for r in rs) == 1


# --- CDC MERGE/upsert apply ----------------------------------------------


CDC_SNAP = {"a": "x", "b": "y", "c": "z", "d": "w"}
CDC_CHANGES = [
    ("a", 1, "U", "x1"), ("a", 3, "U", "x3"), ("a", 2, "U", "x2"),  # latest
    ("b", 1, "D", None),                                            # delete
    ("c", 1, "D", None), ("c", 2, "U", "z2"),                       # D then U
    ("d", 1, "U", "w1"), ("d", 2, "D", None),                       # U then D
    ("e", 1, "I", "new"),                                           # insert
]


def _cdc_frames(spark):
    from pyspark.sql import functions as F  # noqa: F401

    snap = spark.createDataFrame(
        [(k, v) for k, v in CDC_SNAP.items()], "k string, attr string"
    )
    ch = spark.createDataFrame(CDC_CHANGES, "k string, seq long, op string,"
                                            " attr string")
    return snap, ch


def test_cdc_matches_python_reference(spark):
    from logparser_llm_spark.operators.scd import cdc_apply, cdc_apply_py

    snap, ch = _cdc_frames(spark)
    got = {
        r["k"]: (r["attr"], r["last_seq"])
        for r in cdc_apply(snap, ch, ["k"], "seq", "op", ["attr"]).collect()
    }
    assert got == cdc_apply_py(CDC_SNAP, CDC_CHANGES)
    # the rule pins spelled out: latest-seq wins, delete-then-update
    # survives, update-then-delete dies, untouched passes through
    assert got["a"] == ("x3", 3)
    assert "b" not in got and "d" not in got
    assert got["c"] == ("z2", 2)
    assert got["e"] == ("new", 1)


def test_cdc_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.scd import cdc_apply, cdc_apply_sql

    snap, ch = _cdc_frames(spark)
    got = sorted(
        (r["k"], r["attr"], r["last_seq"])
        for r in cdc_apply(snap, ch, ["k"], "seq", "op", ["attr"]).collect()
    )
    con = duckdb.connect()
    con.execute("create table snap (k varchar, attr varchar)")
    con.executemany("insert into snap values (?, ?)", list(CDC_SNAP.items()))
    con.execute(
        "create table ch (k varchar, seq bigint, op varchar, attr varchar)"
    )
    con.executemany("insert into ch values (?, ?, ?, ?)", CDC_CHANGES)
    sql = cdc_apply_sql(snapshot="snap", changes="ch", key_cols=["k"],
                        seq_col="seq", op_col="op", attr_cols=["attr"])
    assert got == sorted(con.execute(sql).fetchall())


def test_cdc_partition_invariance(spark):
    from logparser_llm_spark.operators.scd import cdc_apply

    snap, ch = _cdc_frames(spark)
    a = cdc_apply(snap.repartition(1), ch.repartition(1),
                  ["k"], "seq", "op", ["attr"]).collect()
    b = cdc_apply(snap.repartition(7), ch.repartition(13),
                  ["k"], "seq", "op", ["attr"]).collect()
    key = lambda r: r["k"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_cdc_contracts_fire_at_execution(spark):
    """Duplicate (key, seq) and unknown op must raise — and the guards
    are woven into the kept op expression, so they fire on collect()
    (the bigram_pmi dead-guard lesson)."""
    from logparser_llm_spark.operators.scd import cdc_apply

    snap, _ = _cdc_frames(spark)
    dup = spark.createDataFrame(
        [("a", 1, "U", "p"), ("a", 1, "U", "q")],
        "k string, seq long, op string, attr string",
    )
    with pytest.raises(Exception, match="duplicate"):
        cdc_apply(snap, dup, ["k"], "seq", "op", ["attr"]).collect()
    bad = spark.createDataFrame(
        [("a", 1, "X", "p")], "k string, seq long, op string, attr string"
    )
    with pytest.raises(Exception, match="unknown op"):
        cdc_apply(snap, bad, ["k"], "seq", "op", ["attr"]).collect()
    with pytest.raises(ValueError, match="reserved"):
        cdc_apply(snap.withColumnRenamed("attr", "last_seq"), dup,
                  ["k"], "seq", "op", ["last_seq"])
    with pytest.raises(ValueError, match="reserved"):
        # _c_<attr> would collide with the internal attr aliases
        cdc_apply(snap.withColumnRenamed("attr", "_c_attr"), dup,
                  ["k"], "seq", "op", ["_c_attr"])
    with pytest.raises(ValueError, match="non-empty"):
        cdc_apply(snap, dup, [], "seq", "op", ["attr"])


def test_cdc_null_keys_never_match_on_either_engine(spark):
    """NULL keys are null-UNSAFE on both engines (the oracle spells
    `=` on purpose — `is not distinct from` would silently diverge
    from Spark's join-on-name-list): a NULL-key snapshot row passes
    through untouched and a NULL-key change row applies separately."""
    import duckdb

    from logparser_llm_spark.operators.scd import cdc_apply, cdc_apply_sql

    snap_rows = [(None, "keepme"), ("a", "x")]
    ch_rows = [(None, 1, "U", "upd"), ("a", 1, "U", "x1")]
    snap = spark.createDataFrame(snap_rows, "k string, attr string")
    ch = spark.createDataFrame(ch_rows, "k string, seq long, op string,"
                                        " attr string")
    got = sorted(
        ((r["k"], r["attr"], r["last_seq"])
         for r in cdc_apply(snap, ch, ["k"], "seq", "op",
                            ["attr"]).collect()),
        key=str,
    )
    con = duckdb.connect()
    con.execute("create table snap (k varchar, attr varchar)")
    con.executemany("insert into snap values (?, ?)", snap_rows)
    con.execute(
        "create table ch (k varchar, seq bigint, op varchar, attr varchar)"
    )
    con.executemany("insert into ch values (?, ?, ?, ?)", ch_rows)
    sql = cdc_apply_sql(snapshot="snap", changes="ch", key_cols=["k"],
                        seq_col="seq", op_col="op", attr_cols=["attr"])
    assert got == sorted(con.execute(sql).fetchall(), key=str)
    # both NULL-key rows present: untouched snapshot + applied change
    assert (None, "keepme", None) in got and (None, "upd", 1) in got


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_cdc_registered_query_branch_coverage(spark, sf):
    """Every residue class of the seeded batch must land its rule:
    %7=1 updated to the LATEST change, %7=2 and %7=4 gone, %7=3
    updated (delete-then-update survives), %7=5 inserted under
    doc_id + N, untouched classes pass through with NULL last_seq."""
    from logparser_llm_spark.plans.queries import QUERIES, _read

    n = _read(spark, sf, "documents").count()
    rows = {r["doc_id"]: r for r in QUERIES["cdc_upsert"][0](spark, sf).collect()}
    for did, r in rows.items():
        m = did % 7 if did < n else None
        if did >= n:  # insert
            assert (r["lang"], r["last_seq"]) == ("new", 1)
            assert (did - n) % 7 == 5
        elif m == 1:
            assert (r["lang"], r["n_chars"], r["last_seq"]) == (
                "u2", did * 5 + 1, 2)
        elif m == 3:
            assert (r["lang"], r["n_chars"], r["last_seq"]) == (
                "u3", did + 11, 2)
        else:
            assert m in (0, 5, 6) and r["last_seq"] is None
    present = {d for d in rows if d < n}
    assert not any(d % 7 in (2, 4) for d in present)
    for m in (0, 1, 3, 5, 6):
        assert any(d % 7 == m for d in present), (sf, m)
    assert any(d >= n for d in rows), sf
