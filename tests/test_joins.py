"""As-of join tests: differential vs DuckDB's native ASOF JOIN (an
independent implementation of the same semantics) on a randomized
corpus, brute-force forward/backward checks, tie semantics, edge cases,
and the single-shuffle plan shape."""

import random

import duckdb
import pytest

from logparser_llm_spark.operators.joins import asof_join
from logparser_llm_spark.plans.inspect import physical_plan, plan_facts


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_backward_differential_vs_duckdb_asof(spark):
    rng = random.Random(7)
    left = [(i, rng.randrange(8), rng.randrange(1000)) for i in range(300)]
    right = [
        (1000 + i, rng.randrange(8), rng.randrange(1000)) for i in range(150)
    ]
    # unique (key, ts) on the right: drop dup ts per key for determinism
    seen, r_uniq = set(), []
    for rid, k, ts in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            r_uniq.append((rid, k, ts))
    l_df = _mk(spark, left, "lid bigint, k bigint, ts bigint")
    r_df = _mk(
        spark, [(k, ts, rid) for rid, k, ts in r_uniq], "k bigint, ts bigint, rid bigint"
    )
    got = sorted(
        (r["lid"], r["rid"]) for r in asof_join(l_df, r_df, ["k"], "ts").collect()
    )

    con = duckdb.connect()
    con.execute("create table l (lid bigint, k bigint, ts bigint)")
    con.executemany("insert into l values (?,?,?)", left)
    con.execute("create table r (k bigint, ts bigint, rid bigint)")
    con.executemany("insert into r values (?,?,?)", [(k, t, i) for i, k, t in r_uniq])
    want = sorted(
        con.execute(
            "select l.lid, r.rid from l asof left join r"
            " on l.k = r.k and l.ts >= r.ts"
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_brute_force_parity(spark, direction):
    rng = random.Random(13)
    left = [(i, rng.randrange(4), rng.randrange(60)) for i in range(80)]
    right_raw = {(rng.randrange(4), rng.randrange(60)) for _ in range(40)}
    right = [(k, ts, 100 + j) for j, (k, ts) in enumerate(sorted(right_raw))]
    l_df = _mk(spark, left, "lid bigint, k bigint, ts bigint")
    r_df = _mk(spark, right, "k bigint, ts bigint, rid bigint")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(l_df, r_df, ["k"], "ts", direction=direction).collect()
    }
    for lid, k, ts in left:
        if direction == "backward":
            cand = [(t, rid) for kk, t, rid in right if kk == k and t <= ts]
            want = max(cand)[1] if cand else None
        else:
            cand = [(t, rid) for kk, t, rid in right if kk == k and t >= ts]
            want = min(cand)[1] if cand else None
        assert got[lid] == want, (lid, k, ts, direction)


def test_equal_ts_is_inclusive_both_directions(spark):
    l_df = _mk(spark, [(1, 5, "x")], "k bigint, ts bigint, v string")
    r_df = _mk(spark, [(1, 5, "hit")], "k bigint, ts bigint, p string")
    for direction in ("backward", "forward"):
        out = asof_join(l_df, r_df, ["k"], "ts", direction=direction).collect()
        assert out[0]["p"] == "hit", direction


def test_key_without_right_rows_yields_nulls(spark):
    l_df = _mk(spark, [(1, 9, 10)], "lid bigint, k bigint, ts bigint")
    r_df = _mk(spark, [(7, 1, 100)], "k bigint, ts bigint, rid bigint")
    out = asof_join(l_df, r_df, ["k"], "ts").collect()
    assert len(out) == 1 and out[0]["rid"] is None


def test_right_prefix_and_validations(spark):
    l_df = _mk(spark, [(1, 1, 5)], "v bigint, k bigint, ts bigint")
    r_df = _mk(spark, [(1, 4, 8)], "k bigint, ts bigint, v bigint")
    out = asof_join(l_df, r_df, ["k"], "ts", right_prefix="r_").collect()
    assert out[0]["r_v"] == 8 and out[0]["v"] == 1
    with pytest.raises(ValueError, match="collide"):
        asof_join(l_df, r_df, ["k"], "ts")
    with pytest.raises(ValueError, match="direction"):
        asof_join(l_df, r_df, ["k"], "ts", direction="up")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(l_df, r_df.drop("ts").withColumnRenamed("v", "ts2"), ["k"], "ts")
    with pytest.raises(ValueError, match="no payload"):
        asof_join(l_df, r_df.select("k", "ts"), ["k"], "ts")


def test_timestamp_typed_ordering_column(spark):
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    l_df = spark.createDataFrame(
        [(1, 1, t + dt.timedelta(seconds=30))], "lid bigint, k bigint, ts timestamp"
    )
    r_df = spark.createDataFrame(
        [(1, t, "early"), (1, t + dt.timedelta(seconds=60), "late")],
        "k bigint, ts timestamp, p string",
    )
    assert asof_join(l_df, r_df, ["k"], "ts").collect()[0]["p"] == "early"


def test_plan_is_single_shuffle_no_nested_loop(spark):
    """The merge shape: no non-equi join fallback (NestedLoop /
    cartesian), no join operator at all — union + one window sort."""
    l_df = _mk(spark, [(1, 1, 5)], "lid bigint, k bigint, ts bigint")
    r_df = _mk(spark, [(1, 4, 8)], "k bigint, ts bigint, rid bigint")
    out = asof_join(l_df, r_df, ["k"], "ts")
    plan = physical_plan(out)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    facts = plan_facts(out)
    assert not facts["python_udf"]


# ---------------------------------------------------------------------------
# interval (range) join


def _brute_interval(points, intervals):
    out = []
    for k, t, v in points:
        for kk, s, e, name in intervals:
            if kk == k and s <= t <= e:
                out.append((v, name))
    return sorted(out)


def test_interval_join_randomized_vs_brute_force(spark):
    from logparser_llm_spark.operators.joins import interval_join

    rng = random.Random(23)
    points = [(rng.randrange(5), rng.randrange(500), f"p{i}") for i in range(200)]
    intervals = []
    for i in range(80):
        s = rng.randrange(500)
        intervals.append((rng.randrange(5), s, s + rng.randrange(60), f"i{i}"))
    p_df = _mk(spark, points, "k bigint, t bigint, v string")
    i_df = _mk(spark, intervals, "k bigint, s bigint, e bigint, name string")
    for bw in (7, 64, 1000):  # incl. bucket >> span and bucket << span
        got = sorted(
            (r["v"], r["name"])
            for r in interval_join(
                p_df, i_df, ["k"], "t", "s", "e", bucket_width=bw
            ).collect()
        )
        assert got == _brute_interval(points, intervals), bw


def test_interval_join_boundaries_inclusive_and_invalid_dropped(spark):
    from logparser_llm_spark.operators.joins import interval_join

    p_df = _mk(spark, [(1, 5, "lo"), (1, 9, "hi"), (1, 4, "out")],
               "k bigint, t bigint, v string")
    i_df = _mk(spark, [(1, 5, 9, "iv"), (1, 50, 40, "invalid")],
               "k bigint, s bigint, e bigint, name string")
    got = sorted(
        (r["v"], r["name"])
        for r in interval_join(p_df, i_df, ["k"], "t", "s", "e", bucket_width=4).collect()
    )
    assert got == [("hi", "iv"), ("lo", "iv")]


def test_interval_join_span_cap_raises(spark):
    from logparser_llm_spark.operators.joins import interval_join

    p_df = _mk(spark, [(1, 5, "p")], "k bigint, t bigint, v string")
    i_df = _mk(spark, [(1, 0, 10_000_000, "huge")],
               "k bigint, s bigint, e bigint, name string")
    with pytest.raises(Exception, match="spans more than"):
        interval_join(
            p_df, i_df, ["k"], "t", "s", "e",
            bucket_width=8, max_buckets_per_interval=10,
        ).collect()


def test_interval_join_validations_and_prefix(spark):
    from logparser_llm_spark.operators.joins import interval_join

    p_df = _mk(spark, [(1, 5, "p")], "k bigint, t bigint, name string")
    i_df = _mk(spark, [(1, 0, 9, "iv")], "k bigint, s bigint, e bigint, name string")
    with pytest.raises(ValueError, match="collide"):
        interval_join(p_df, i_df, ["k"], "t", "s", "e", bucket_width=8)
    out = interval_join(
        p_df, i_df, ["k"], "t", "s", "e", bucket_width=8, right_prefix="iv_"
    ).collect()
    assert out[0]["iv_name"] == "iv" and out[0]["name"] == "p"
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(p_df, i_df, ["k"], "t", "s", "e", bucket_width=0)
    with pytest.raises(ValueError, match="must exist"):
        interval_join(p_df.drop("t"), i_df, ["k"], "t", "s", "e", bucket_width=8)


def test_interval_join_plan_is_equi_join_no_nested_loop(spark):
    from logparser_llm_spark.operators.joins import interval_join

    p_df = _mk(spark, [(1, 5, "p")], "k bigint, t bigint, v string")
    i_df = _mk(spark, [(1, 0, 9, "iv")], "k bigint, s bigint, e bigint, name string")
    out = interval_join(p_df, i_df, ["k"], "t", "s", "e", bucket_width=8)
    plan = physical_plan(out)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert not plan_facts(out)["python_udf"]
