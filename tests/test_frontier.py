"""Crawl-frontier politeness scheduling (operators/frontier.py):
Python reference differential, per-host slot laws, DuckDB drift gate,
guards, and registered-query class pins at sf0.01 and sf0.1."""

import duckdb
import pytest

from logparser_llm_spark.operators.frontier import (
    fetch_schedule,
    fetch_schedule_py,
    fetch_schedule_sql,
)

ROWS = [(i, f"host{i % 3}") for i in range(40)] + [(100, "solo")]


def _frame(spark):
    return spark.createDataFrame(ROWS, "id long, host string")


def test_matches_python_reference(spark):
    got = {
        r["id"]: (r["slot"], r["cycle"], r["sched_ms"])
        for r in fetch_schedule(
            _frame(spark), "id", "host", delay_ms=250, per_cycle=5
        ).collect()
    }
    assert got == fetch_schedule_py(ROWS, delay_ms=250, per_cycle=5)
    assert got[100] == (0, 0, 0)  # singleton host fetches immediately


def test_per_host_slot_laws(spark):
    """Slots within a host are exactly 0..n-1 (no gap, no dup), the
    schedule is slot·delay, the cycle is slot div per_cycle — and the
    md5 interleave means slots do NOT follow id order."""
    rows = fetch_schedule(
        _frame(spark), "id", "host", delay_ms=100, per_cycle=4
    ).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for h, rs in by_host.items():
        assert sorted(r["slot"] for r in rs) == list(range(len(rs))), h
        for r in rs:
            assert r["sched_ms"] == r["slot"] * 100
            assert r["cycle"] == r["slot"] // 4
    h0 = sorted((r["id"], r["slot"]) for r in by_host["host0"])
    slots = [s for _, s in h0]
    assert slots != sorted(slots), "md5 interleave missing"


def test_matches_duckdb_unit_scale(spark):
    got = sorted(
        (r["id"], r["host"], r["slot"], r["cycle"], r["sched_ms"])
        for r in fetch_schedule(
            _frame(spark), "id", "host", delay_ms=250, per_cycle=5
        ).collect()
    )
    con = duckdb.connect()
    con.execute("create table f (id bigint, host varchar)")
    con.executemany("insert into f values (?, ?)", ROWS)
    sql = fetch_schedule_sql(
        source="f", id_col="id", host_col="host", delay_ms=250, per_cycle=5
    )
    assert got == sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_partition_invariance(spark):
    a = fetch_schedule(_frame(spark).repartition(1), "id", "host").collect()
    b = fetch_schedule(_frame(spark).repartition(7), "id", "host").collect()
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError):
        fetch_schedule(df, "id", "host", delay_ms=0)
    with pytest.raises(ValueError):
        fetch_schedule(df, "id", "host", per_cycle=0)
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="reserved"):
        fetch_schedule(df.withColumn("slot", F.lit(1)), "id", "host")
    with pytest.raises(ValueError):
        fetch_schedule_py(ROWS, delay_ms=0)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_classes_present(spark, sf):
    """Multiple hosts, multiple cycles (slot >= per_cycle rows exist),
    and the slot/sched arithmetic law on every row."""
    from logparser_llm_spark.plans.queries import (
        FETCH_DELAY_MS,
        FETCH_PER_CYCLE,
        QUERIES,
    )

    rows = QUERIES["fetch_schedule"][0](spark, sf).collect()
    hosts = {r["host"] for r in rows}
    assert len(hosts) >= 2, sf
    assert any(r["cycle"] > 0 for r in rows), sf
    for r in rows:
        assert r["sched_ms"] == r["slot"] * FETCH_DELAY_MS
        assert r["cycle"] == r["slot"] // FETCH_PER_CYCLE


# --- crawl_frontier composed query (r5 fifteenth arc) -----------------------


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_crawl_frontier_survivor_law_and_cycles(spark, sf):
    """The composition's survivor set must be exactly {robots-allowed}
    minus {seen}: class %4=1 never scheduled (Disallow), %4=3 scheduled
    only on odd hosts (the wildcard+anchor rule), %3=0 never scheduled
    (yesterday's crawl); multi-cycle rows exist; the slot/sched
    arithmetic law holds on every row."""
    from logparser_llm_spark.plans.queries import (
        FETCH_DELAY_MS,
        FETCH_PER_CYCLE,
        QUERIES,
    )

    rows = QUERIES["crawl_frontier"][0](spark, sf).collect()
    assert rows, sf
    for r in rows:
        host_idx = int(r["host"].split(".")[0].replace("src", ""))
        assert r["doc_id"] % 3 != 0, sf            # seen-set anti-join
        assert r["doc_id"] % 4 != 1, sf            # /private/ disallowed
        if r["doc_id"] % 4 == 3:
            assert host_idx % 2 != 0, sf           # .bak rule on even hosts
        assert r["sched_ms"] == r["slot"] * FETCH_DELAY_MS
        assert r["cycle"] == r["slot"] // FETCH_PER_CYCLE
    assert any(r["cycle"] > 0 for r in rows), sf
    # per-host slots are dense 0..k-1 (the anti-join happened BEFORE
    # scheduling — holes would mean filtered-after-ranking)
    from collections import defaultdict

    by_host = defaultdict(list)
    for r in rows:
        by_host[r["host"]].append(r["slot"])
    assert len(by_host) >= 2, sf
    for slots in by_host.values():
        assert sorted(slots) == list(range(len(slots)))


def test_crawl_frontier_plan_has_anti_join(spark):
    from logparser_llm_spark.plans.inspect import physical_plan
    from logparser_llm_spark.plans.queries import QUERIES

    plan = physical_plan(
        QUERIES["crawl_frontier"][0](spark, "/root/testdata/sf0.01")
    )
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
