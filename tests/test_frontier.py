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


# --- politeness_audit --------------------------------------------------------


def test_politeness_gap_law_first_fetch_and_boundary(spark):
    """Per host: the first fetch has NULL gap and never violates; a
    gap exactly AT the minimum is compliant (strict <); equal
    timestamps gap 0 and violate; hosts are independent."""
    from logparser_llm_spark.operators.frontier import politeness_audit

    rows = [
        (1, "a", 1_000), (2, "a", 1_500), (3, "a", 2_500),
        (4, "b", 10), (5, "b", 10),
        (6, "c", 0),
    ]
    df = spark.createDataFrame(rows, "id long, host string, ts long")
    got = {r["id"]: (r["gap_us"], r["violation"]) for r in
           politeness_audit(df, "host", "ts", min_gap_us=1000,
                            tiebreak_col="id").collect()}
    assert got[1] == (None, False)
    assert got[2] == (500, True)
    assert got[3] == (1000, False)   # exactly the minimum: compliant
    assert got[4] == (None, False)
    assert got[5] == (0, True)       # same-microsecond burst
    assert got[6] == (None, False)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_gap_us"):
        politeness_audit(df, "host", "ts", min_gap_us=0)


def test_politeness_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.frontier import (
        politeness_audit,
        politeness_audit_sql,
    )

    rows = [(i, f"h{i % 5}", (i * 997) % 10_000) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, host string, ts long")
    got = sorted(map(tuple, politeness_audit(
        df, "host", "ts", min_gap_us=500, tiebreak_col="id").collect()))
    con = duckdb.connect()
    con.execute("create table t (id bigint, host varchar, ts bigint)")
    con.executemany("insert into t values (?, ?, ?)", rows)
    sql = politeness_audit_sql(rel="t", host_col="host", ts_col="ts",
                               min_gap_us=500, cols="id, host, ts",
                               tiebreak_col="id")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_politeness_audit_registered_classes(spark, sf):
    """The clock-compressed host h3 violates on every non-first fetch;
    every other host is fully compliant (the natural corpus cadence
    exceeds the 60 s delay); each flag recomputable from its own
    gap."""
    from logparser_llm_spark.plans.queries import (
        POLITENESS_MIN_GAP_US,
        QUERIES,
    )

    rows = QUERIES["politeness_audit"][0](spark, sf).collect()
    hosts = {r["host"] for r in rows}
    assert "h3" in hosts and len(hosts) == 25, sf
    for r in rows:
        if r["gap_us"] is None:
            assert not r["violation"], r
        else:
            assert r["violation"] == (r["gap_us"] < POLITENESS_MIN_GAP_US), r
        if r["host"] == "h3":
            assert r["violation"] == (r["gap_us"] is not None), r
        else:
            assert not r["violation"], r


# --- decayed_activity --------------------------------------------------------


def test_decayed_activity_exact_weights_and_rank(spark):
    """Newest day weighs 2^horizon, each day halves exactly; beyond the
    horizon contributes 0 but still counts; NULL ts counts with weight
    0 (rows never vanish); rank totals by (score desc, key)."""
    import datetime

    from logparser_llm_spark.operators.frontier import decayed_activity

    base = datetime.datetime(2024, 1, 31, 12, 0, 0)
    d = datetime.timedelta
    rows = [
        (1, base), (1, base - d(days=1)),           # 2^30 + 2^29
        (2, base - d(days=40)), (2, base - d(days=3)),  # 0 + 2^27
        (3, None), (3, base - d(days=7)),           # null + 2^23; age 7 NOT recent
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    got = {r["key"]: r for r in decayed_activity(df, "k", "ts").collect()}
    assert got[1]["score"] == 2**30 + 2**29 and got[1]["rank"] == 1
    assert got[2]["score"] == 2**27 and got[2]["n_events"] == 2
    assert got[3]["score"] == 2**23 and got[3]["n_events"] == 2
    assert got[3]["n_recent"] == 0          # age 7 fails strict < 7
    assert got[1]["n_recent"] == 2 and got[1]["recent_share_e6"] == 1_000_000
    assert got[2]["recent_share_e6"] == 500_000
    assert [got[k]["rank"] for k in (1, 2, 3)] == [1, 2, 3]


def test_decayed_activity_validation(spark):
    import pytest as _pytest

    from logparser_llm_spark.operators.frontier import (
        decayed_activity,
        decayed_activity_sql,
    )

    df = spark.createDataFrame([(1, None)], "k long, ts timestamp")
    with _pytest.raises(ValueError, match="horizon_days"):
        decayed_activity(df, "k", "ts", horizon_days=41)
    with _pytest.raises(ValueError, match="recent_days"):
        decayed_activity(df, "k", "ts", horizon_days=10, recent_days=11)
    with _pytest.raises(ValueError, match="horizon_days"):
        decayed_activity_sql(rel="t", key_col="k", ts_col="ts",
                             horizon_days=0)


def test_decayed_activity_partition_invariance(spark):
    import datetime

    from logparser_llm_spark.operators.frontier import decayed_activity

    base = datetime.datetime(2024, 2, 10)
    rows = [(i % 9, base - datetime.timedelta(days=(i * 7) % 45,
                                              hours=i % 23))
            for i in range(300)]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    a = sorted(map(tuple,
                   decayed_activity(df.repartition(1), "k", "ts").collect()))
    b = sorted(map(tuple,
                   decayed_activity(df.repartition(17), "k", "ts").collect()))
    assert a == b


def test_decayed_activity_plan_partial_agg_no_event_window(spark):
    """The per-key agg must partially aggregate (map-side combine) and
    the rank window must run over the aggregated frame — the plan has
    no Window above the raw scan side, and no Python."""
    from logparser_llm_spark.operators.frontier import decayed_activity
    from logparser_llm_spark.plans.inspect import physical_plan, plan_facts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = decayed_activity(ev, "user_id", "ts")
    facts = plan_facts(out)
    assert facts["partial_aggregate"]
    assert not facts["python_udf"] and not facts["map_in_pandas"]
    plan = physical_plan(out)
    # the Window appears once, above HashAggregate, not over the scan
    assert plan.count("Window") >= 1
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos < agg_pos  # executed-plan prints top-down


# --- sitemap_coverage --------------------------------------------------------


def test_sitemap_coverage_hand_check_all_classes(spark):
    """Dup locs and repeat fetches collapse (distinct-URL counts);
    empty-sitemap, declared-only, crawled-only and NULL-sitemap hosts
    all surface (rows never vanish); coverage is the exact integer
    division with a 0 guard for empty sitemaps."""
    from logparser_llm_spark.operators.frontier import sitemap_coverage

    sm = [
        ("h1", "<urlset><url><loc>http://h1/a</loc></url>"
               "<url><loc>http://h1/b</loc></url>"
               "<url><loc>http://h1/a</loc></url></urlset>"),
        ("h2", "<urlset></urlset>"),
        ("h3", "<loc>http://h3/x</loc>"),
        ("h5", None),
    ]
    cr = [
        ("h1", "http://h1/a"), ("h1", "http://h1/a"),
        ("h1", "http://h1/z"), ("h2", "http://h2/q"),
        ("h4", "http://h4/only"),
    ]
    sdf = spark.createDataFrame(sm, "host string, xml string")
    cdf = spark.createDataFrame(cr, "host string, url string")
    got = {r["host"]: tuple(r)
           for r in sitemap_coverage(sdf, "host", "xml",
                                     cdf, "host", "url").collect()}
    assert got["h1"] == ("h1", 2, 2, 1, 1, 1, 500_000)
    assert got["h2"] == ("h2", 0, 1, 0, 0, 1, 0)
    assert got["h3"] == ("h3", 1, 0, 0, 1, 0, 0)
    assert got["h4"] == ("h4", 0, 1, 0, 0, 1, 0)
    assert got["h5"] == ("h5", 0, 0, 0, 0, 0, 0)


def test_sitemap_coverage_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.frontier import (
        sitemap_coverage,
        sitemap_coverage_sql,
    )

    sm, cr = [], []
    for h in range(12):
        locs = "".join(
            f"<url><loc>http://h{h}/p{j}</loc></url>"
            for j in range(h * 3) if j % 3 != 1
        )
        sm.append((f"h{h}", f"<urlset>{locs}</urlset>" if h % 5 else None))
        for j in range(h * 2):
            if j % 4 != 2:
                cr.append((f"h{h}", f"http://h{h}/p{j}"))
    sdf = spark.createDataFrame(sm, "host string, xml string")
    cdf = spark.createDataFrame(cr, "host string, url string")
    got = sorted(map(tuple, sitemap_coverage(
        sdf, "host", "xml", cdf, "host", "url").collect()))
    con = duckdb.connect()
    con.execute("create table s (host varchar, xml varchar)")
    con.executemany("insert into s values (?,?)", sm)
    con.execute("create table c (host varchar, url varchar)")
    con.executemany("insert into c values (?,?)", cr)
    want = sorted(map(tuple, con.execute(sitemap_coverage_sql(
        sitemaps_rel="s", host_col="host", xml_col="xml",
        crawled_rel="c", crawled_host_col="host", url_col="url",
    )).fetchall()))
    assert got == want


def test_sitemap_coverage_broadcasts_declared_side(spark):
    """The 10^12-row fetch log must never shuffle on the url: the semi
    join against the declared set is a broadcast join, and no
    sort-merge join appears anywhere in the plan."""
    from logparser_llm_spark.operators.frontier import sitemap_coverage
    from logparser_llm_spark.plans.inspect import plan_facts

    sm = spark.createDataFrame(
        [("h", "<loc>http://h/a</loc><loc>http://h/b</loc>")],
        "host string, xml string",
    )
    cr = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).selectExpr("source as host", "concat('http://h/', doc_id) as url")
    out = sitemap_coverage(sm, "host", "xml", cr, "host", "url")
    facts = plan_facts(out)
    assert facts["broadcast_hash_join"]
    assert not facts["python_udf"]
    # the only sort-merge joins allowed are the FULL OUTER stitches of
    # the tiny per-host aggregates (keyed by host alone); the fetch log
    # must meet the declared set in a broadcast LeftSemi on (host, url)
    from logparser_llm_spark.plans.inspect import physical_plan

    plan = physical_plan(out)
    import re as _re

    for m in _re.finditer(r"SortMergeJoin (\[[^\]]*\]), \[[^\]]*\], (\w+)",
                          plan):
        keys, how = m.group(1), m.group(2)
        assert how == "FullOuter" and "url" not in keys, m.group(0)
    assert _re.search(r"BroadcastHashJoin \[[^\]]*host[^\]]*url[^\]]*\].*LeftSemi",
                      plan)


# --- crawl_gaps --------------------------------------------------------------


def test_crawl_gaps_hand_check_and_null_host(spark):
    """Gaps count whole missed-day runs; repeated same-day fetches
    collapse; a single-day host spans 1 with gap 0; an all-NULL-ts
    host surfaces with zeros and NULL days (never vanishes)."""
    import datetime

    from logparser_llm_spark.operators.frontier import crawl_gaps

    D = lambda d: datetime.datetime(2024, 1, d, 10, 0, 0)  # noqa: E731
    rows = (
        [("h1", D(1)), ("h1", D(1)), ("h1", D(2)), ("h1", D(5)),
         ("h1", D(10))]
        + [("h2", D(3))]
        + [("h3", None)]
        + [("h4", D(1)), ("h4", None), ("h4", D(2))]
    )
    df = spark.createDataFrame(rows, "h string, ts timestamp")
    got = {r["host"]: tuple(r) for r in crawl_gaps(df, "h", "ts").collect()}
    assert got["h1"][3:] == (4, 10, 6, 4, 400_000)
    assert got["h2"][3:] == (1, 1, 0, 0, 1_000_000)
    assert got["h3"][3:] == (0, 0, 0, 0, 0) and got["h3"][1] is None
    assert got["h4"][3:] == (2, 2, 0, 0, 1_000_000)


def test_crawl_gaps_matches_duckdb_and_staged_starvation(spark):
    import datetime

    import duckdb

    from logparser_llm_spark.operators.frontier import (
        crawl_gaps,
        crawl_gaps_sql,
    )

    rows = []
    for h in range(8):
        for d in range(1, 29):
            if h % 3 == 1 and 10 <= d <= 19:
                continue  # starved hosts
            if (h * d) % 5 == 2:
                continue  # natural noise
            rows.append((f"h{h}", datetime.datetime(2024, 1, d, h, 30)))
    df = spark.createDataFrame(rows, "h string, ts timestamp")
    got = sorted(map(tuple, crawl_gaps(df, "h", "ts").collect()))
    con = duckdb.connect()
    con.execute("create table t (h varchar, ts timestamp)")
    con.executemany("insert into t values (?,?)", rows)
    want = sorted(map(tuple, con.execute(crawl_gaps_sql(
        rel="t", host_col="h", ts_col="ts")).fetchall()))
    assert got == want
    by = {r[0]: r for r in got}
    for h in range(8):
        if h % 3 == 1:
            assert by[f"h{h}"][6] >= 10  # longest_gap spans the hole
        else:
            assert by[f"h{h}"][6] < 10


# --- param_explosion ---------------------------------------------------------


def test_param_explosion_hand_check_and_duckdb(spark):
    """Query strings and fragments strip to the path; repeat fetches
    collapse (distinct URLs); the worst path resolves with the
    smallest-path tiebreak; NULL URLs count as '' and never vanish."""
    import duckdb

    from logparser_llm_spark.operators.frontier import (
        param_explosion,
        param_explosion_sql,
    )

    urls = (
        [("h1", f"http://h1/p?s={i}") for i in range(5)]
        + [("h1", "http://h1/q"), ("h1", "http://h1/q"),
           ("h1", "http://h1/r#frag")]
        + [("h2", None), ("h2", "http://h2/a")]
    )
    df = spark.createDataFrame(urls, "h string, u string")
    got = {r["host"]: tuple(r)
           for r in param_explosion(df, "h", "u").collect()}
    assert got["h1"] == ("h1", 7, 3, 2333, 5, "http://h1/p")
    assert got["h2"] == ("h2", 2, 2, 1000, 1, "")
    con = duckdb.connect()
    con.execute("create table u (h varchar, u varchar)")
    con.executemany("insert into u values (?,?)", urls)
    want = {r[0]: tuple(r) for r in con.execute(param_explosion_sql(
        rel="u", host_col="h", url_col="u")).fetchall()}
    assert got == want


def test_param_explosion_staged_classes_in_query(spark):
    """Registered staging: session-id hosts (idx ≡ 2 mod 5) must blow
    past 1000 urls-per-path while clean hosts sit at exactly 1000."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["param_explosion"][0](
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        idx = int(r["host"].replace("src", ""))
        if idx % 5 == 2:
            assert r["urls_per_path_e3"] > 3000, r
            assert "?sid=" not in r["top_path"]
        else:
            assert r["urls_per_path_e3"] == 1000, r
            assert r["max_path_urls"] == 1, r


# --- crawl_health composed query ---------------------------------------------


def test_crawl_health_staged_classes(spark):
    """Compressed-clock hosts (≡3 mod 7) must violate on the
    majority of fetches; starved hosts (≡5 mod 10) carry longest_gap ≥ 10; clean
    hosts read zero violations; the recrawl rank is a permutation of
    1..n_hosts."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["crawl_health"][0](
        spark, "/root/testdata/sf0.01").collect()
    assert rows
    ranks = sorted(r["recrawl_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        h = r["host"]
        if h % 7 == 3:
            assert r["violation_share_e6"] > 500_000, tuple(r)
        else:
            # natural cadence can produce the odd same-minute pair
            assert r["violation_share_e6"] < 100_000, tuple(r)
        if h % 10 == 5:
            assert r["longest_gap"] >= 10, tuple(r)
        else:
            assert r["longest_gap"] < 10, tuple(r)
