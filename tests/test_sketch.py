"""HyperLogLog sketch tests: three-way register/estimate parity (Spark /
Python / DuckDB), the merge-by-max union property, published accuracy
bounds, and the raw-branch guard that keeps the registered query's
cross-engine comparison on the exact-parity code path.

(The registered ``hll_distinct`` query itself is additionally covered by
the registry-wide oracle test in test_queries_oracle.py.)
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.sketch import (
    HASH_BITS,
    hll_distinct,
    hll_estimate,
    hll_estimate_py,
    hll_estimate_sql,
    hll_merge,
    hll_registers,
    hll_registers_py,
)


def _values_df(spark, values, group="a"):
    return spark.createDataFrame(
        [(group, v) for v in values], "g string, v string"
    )


def test_registers_match_python(spark):
    vals = [f"user-{i}" for i in range(500)] * 2  # duplicates must not matter
    regs = hll_registers(_values_df(spark, vals), ["g"], "v", p=8)
    got = {r["reg_idx"]: r["rho"] for r in regs.collect()}
    assert got == hll_registers_py(vals, p=8)


def test_estimate_three_way_parity(spark):
    vals = [f"item:{i * 7}" for i in range(1200)]
    df = _values_df(spark, vals)
    est = hll_estimate(hll_registers(df, ["g"], "v", p=8), ["g"], p=8)
    srow = est.collect()[0].asDict()

    prow = hll_estimate_py(hll_registers_py(vals, p=8), p=8)

    con = duckdb.connect()
    con.execute("create table t (v varchar)")
    con.executemany("insert into t values (?)", [(v,) for v in vals])
    orow = con.execute(hll_estimate_sql("t", "'a'", "v", 8)).fetchdf().to_dict(
        "records"
    )[0]

    for field in ("n_registers", "zero_registers", "est_distinct"):
        assert srow[field] == prow[field] == orow[field], field


def test_merge_equals_union(spark):
    """Union of sketches == sketch of union, register for register —
    the property that makes day→month rollups rescan-free."""
    a = [f"a-{i}" for i in range(400)]
    b = [f"b-{i}" for i in range(300)] + a[:100]  # overlapping
    ra = hll_registers(_values_df(spark, a), ["g"], "v", p=8)
    rb = hll_registers(_values_df(spark, b), ["g"], "v", p=8)
    merged = {
        r["reg_idx"]: r["rho"] for r in hll_merge(ra.union(rb), ["g"]).collect()
    }
    whole = {
        r["reg_idx"]: r["rho"]
        for r in hll_registers(_values_df(spark, a + b), ["g"], "v", p=8).collect()
    }
    assert merged == whole


@pytest.mark.parametrize("n", [500, 20000])
def test_estimate_accuracy_within_published_bound(n):
    p = 12
    m = 1 << p
    est = hll_estimate_py(
        hll_registers_py((f"v{i}" for i in range(n)), p=p), p=p
    )["est_distinct"]
    # 1.04/sqrt(m) is the published stddev; 5 sigma on a fixed corpus
    assert abs(est / n - 1) < 5 * 1.04 / math.sqrt(m)


def test_linear_counting_branch_at_tiny_cardinality():
    out = hll_estimate_py(hll_registers_py([f"x{i}" for i in range(10)], p=12), p=12)
    assert out["raw_branch"] is False  # small-range correction taken
    assert out["est_distinct"] == 10  # linear counting is ~exact here


def test_null_values_skipped(spark):
    vals = ["a", "b", "c"]
    df = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", None)], "g string, v string"
    )
    got = {r["reg_idx"]: r["rho"] for r in hll_registers(df, ["g"], "v", p=8).collect()}
    assert got == hll_registers_py(vals, p=8) == hll_registers_py(vals + [None], p=8)


def test_p_validation():
    with pytest.raises(ValueError, match=r"\[4, 16\]"):
        hll_registers_py([], p=3)
    with pytest.raises(ValueError, match=r"\[4, 16\]"):
        hll_estimate_sql("t", "g", "v", 17)


def test_per_key_sketches_are_independent(spark):
    df = spark.createDataFrame(
        [("k1", f"v{i}") for i in range(50)] + [("k2", f"w{i}") for i in range(80)],
        "g string, v string",
    )
    rows = {
        r["g"]: r.asDict()
        for r in hll_estimate(hll_registers(df, ["g"], "v", p=8), ["g"], p=8).collect()
    }
    assert rows["k1"]["est_distinct"] == hll_estimate_py(
        hll_registers_py([f"v{i}" for i in range(50)], p=8), p=8
    )["est_distinct"]
    assert rows["k2"]["est_distinct"] == hll_estimate_py(
        hll_registers_py([f"w{i}" for i in range(80)], p=8), p=8
    )["est_distinct"]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_corpus_stays_on_raw_branch(sf):
    """The registered query's oracle parity is exact only on the
    raw-division branch (the ln branch is ulp-portable, not bit-pinned);
    assert every event_type group at both driver scales stays on it."""
    from logparser_llm_spark.plans.queries import HLL_QUERY_P

    con = duckdb.connect()
    rows = con.execute(
        "select event_type, user_id::BIGINT::VARCHAR || '|' || "
        "strftime(ts, '%Y-%m-%d') as ud "
        f"from parquet_scan('{sf}/events.parquet')"
    ).fetchall()
    groups: dict[str, list] = {}
    for et, ud in rows:
        groups.setdefault(et, []).append(ud)
    assert groups
    for et, vals in groups.items():
        out = hll_estimate_py(hll_registers_py(vals, p=HLL_QUERY_P), p=HLL_QUERY_P)
        assert out["raw_branch"] is True, (sf, et, out)


def test_hash_prefix_fits_signed_bigint():
    """15 hex chars = 60 bits by construction — the invariant that keeps
    the register hash positive in both engines' BIGINT."""
    assert HASH_BITS == 60
    regs = hll_registers_py([f"v{i}" for i in range(1000)], p=4)
    assert all(0 <= idx < 16 for idx in regs)
    assert all(1 <= rho <= (60 - 4) + 1 for rho in regs.values())


def test_one_pass_convenience_matches_two_step(spark):
    vals = [f"v{i}" for i in range(200)]
    df = _values_df(spark, vals)
    one = hll_distinct(df, ["g"], "v", p=8).collect()[0].asDict()
    two = hll_estimate(hll_registers(df, ["g"], "v", p=8), ["g"], p=8).collect()[
        0
    ].asDict()
    assert one == two


# ---------------------------------------------------------------------------
# Count-Min


def test_cms_counters_match_python(spark):
    from logparser_llm_spark.operators.sketch import cms_build, cms_build_py

    vals = [f"t{i % 17}" for i in range(300)]
    got = {
        (r["depth_i"], r["bucket"]): r["cnt"]
        for r in cms_build(_values_df(spark, vals), "v", depth=4, width=32).collect()
    }
    assert got == cms_build_py(vals, depth=4, width=32)


def test_cms_estimate_overcounts_never_under(spark):
    from logparser_llm_spark.operators.sketch import cms_build, cms_estimate

    vals = [f"t{i % 17}" for i in range(300)]
    truth = {v: vals.count(v) for v in set(vals)}
    cms = cms_build(_values_df(spark, vals), "v", depth=4, width=16)  # collide hard
    probes = spark.createDataFrame([(v,) for v in truth], "v string")
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(cms, probes, "v", depth=4, width=16).collect()
    }
    assert all(est[v] >= c for v, c in truth.items())


def test_cms_wide_sketch_is_exact(spark):
    from logparser_llm_spark.operators.sketch import cms_build, cms_estimate

    vals = [f"val-{i % 10}" for i in range(200)]
    cms = cms_build(_values_df(spark, vals), "v", depth=4, width=4096)
    probes = spark.createDataFrame(
        [(v,) for v in set(vals)] + [("absent",)], "v string"
    )
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(cms, probes, "v", depth=4, width=4096).collect()
    }
    assert est["absent"] == 0
    assert all(est[v] == 20 for v in set(vals))


def test_cms_merge_equals_combined_build(spark):
    from logparser_llm_spark.operators.sketch import cms_build, cms_merge

    a, b = [f"x{i % 5}" for i in range(60)], [f"y{i % 7}" for i in range(80)]
    ca = cms_build(_values_df(spark, a), "v", depth=3, width=32)
    cb = cms_build(_values_df(spark, b), "v", depth=3, width=32)
    merged = {
        (r["depth_i"], r["bucket"]): r["cnt"]
        for r in cms_merge(ca.union(cb)).collect()
    }
    whole = {
        (r["depth_i"], r["bucket"]): r["cnt"]
        for r in cms_build(_values_df(spark, a + b), "v", depth=3, width=32).collect()
    }
    assert merged == whole


def test_cms_null_skipped_and_validation(spark):
    from logparser_llm_spark.operators.sketch import (
        cms_build, cms_build_py, cms_estimate_py)

    df = spark.createDataFrame([("g", "a"), ("g", None)], "g string, v string")
    got = {
        (r["depth_i"], r["bucket"]): r["cnt"]
        for r in cms_build(df, "v", depth=2, width=16).collect()
    }
    assert got == cms_build_py(["a"], depth=2, width=16)
    with pytest.raises(ValueError, match="depth"):
        cms_build_py([], depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_estimate_py({}, "x", depth=2, width=1)


def test_cms_registered_probe_invariants():
    """The registered query's est ≥ exact contract, recomputed in pure
    Python over the actual sf0.01 corpus (independent of both engines)."""
    from logparser_llm_spark.operators.sketch import cms_build_py, cms_estimate_py
    from logparser_llm_spark.plans.queries import (
        CMS_PROBE_TERMS, CMS_QUERY_DEPTH, CMS_QUERY_WIDTH)
    import re as _re

    con = duckdb.connect()
    texts = [
        t for (t,) in con.execute(
            "select text from parquet_scan('/root/testdata/sf0.01/documents.parquet')"
        ).fetchall()
    ]
    toks = [w for t in texts for w in _re.split("[^a-z0-9]+", t.lower()) if w]
    cms = cms_build_py(toks, depth=CMS_QUERY_DEPTH, width=CMS_QUERY_WIDTH)
    for term in CMS_PROBE_TERMS:
        est = cms_estimate_py(cms, term, depth=CMS_QUERY_DEPTH, width=CMS_QUERY_WIDTH)
        assert est >= toks.count(term)
    assert toks.count("zzzmissing") == 0


# ---------------------------------------------------------------------------
# Bloom filter (the membership third of the trio)


def test_bloom_words_match_python(spark):
    from logparser_llm_spark.operators.sketch import bloom_build, bloom_build_py

    vals = [f"url{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r.word_idx: r.bits for r in bloom_build(df, "v", m_bits=2048, k=4).collect()}
    assert got == bloom_build_py(vals, m_bits=2048, k=4)


def test_bloom_contains_no_false_negative_and_python_parity(spark):
    from logparser_llm_spark.operators.sketch import (
        bloom_build,
        bloom_build_py,
        bloom_contains,
        bloom_contains_py,
    )

    vals = [f"u{i}" for i in range(200)]
    probes = vals[:40] + [f"absent{i}" for i in range(40)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    pf = spark.createDataFrame([(p,) for p in probes], "v string")
    bl = bloom_build(df, "v", m_bits=4096, k=4)
    got = {
        r.v: r.maybe_present
        for r in bloom_contains(bl, pf, "v", m_bits=4096, k=4).collect()
    }
    words = bloom_build_py(vals, m_bits=4096, k=4)
    assert got == {p: bloom_contains_py(words, p, m_bits=4096, k=4) for p in probes}
    assert all(got[v] for v in vals[:40])  # seen ⇒ maybe_present, always


def test_bloom_saturated_filter_reports_false_positives(spark):
    from logparser_llm_spark.operators.sketch import bloom_build, bloom_contains

    # 64 bits for 100 values: essentially every probe collides — the
    # "maybe" in maybe_present is a real output class, not a name
    df = spark.createDataFrame([(f"v{i}",) for i in range(100)], "v string")
    pf = spark.createDataFrame([("never-inserted",)], "v string")
    bl = bloom_build(df, "v", m_bits=64, k=2)
    [r] = bloom_contains(bl, pf, "v", m_bits=64, k=2).collect()
    assert r.maybe_present  # false positive, by construction


def test_bloom_merge_equals_combined_build(spark):
    from logparser_llm_spark.operators.sketch import bloom_build, bloom_merge

    vals = [f"w{i}" for i in range(240)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    full = {r.word_idx: r.bits for r in bloom_build(df, "v", m_bits=2048, k=3).collect()}
    h1 = bloom_build(df.limit(120), "v", m_bits=2048, k=3)
    h2 = bloom_build(df.subtract(df.limit(120)), "v", m_bits=2048, k=3)
    merged = {r.word_idx: r.bits for r in bloom_merge(h1.union(h2)).collect()}
    assert merged == full


def test_bloom_duckdb_word_parity(spark):
    from logparser_llm_spark.operators.sketch import bloom_build, bloom_sql

    vals = [f"url{i}" for i in range(150)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r.word_idx: r.bits for r in bloom_build(df, "v", m_bits=1024, k=5).collect()}
    con = duckdb.connect()
    con.execute(
        "create table stream as select 'url' || cast(range as varchar) as v "
        "from range(150)"
    )
    con.execute("create table pr as select 'url0' as v")
    sql = (
        "with " + bloom_sql("stream", "v", "pr", "v", m_bits=1024, k=5)
        + " select word_idx, bits from bloom_w"
    )
    assert dict(con.sql(sql).fetchall()) == got


def test_bloom_null_skipped_and_validation(spark):
    from logparser_llm_spark.operators.sketch import (
        bloom_build,
        bloom_build_py,
        bloom_contains,
    )

    df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    got = {r.word_idx: r.bits for r in bloom_build(df, "v", m_bits=512, k=3).collect()}
    assert got == bloom_build_py(["a", "b"], m_bits=512, k=3)
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(df, "v", m_bits=32, k=3)
    with pytest.raises(ValueError, match="k must"):
        bloom_contains(df, df, "v", m_bits=512, k=0)


def test_bloom_words_are_signed_bigint_safe():
    from logparser_llm_spark.operators.sketch import (
        BLOOM_BITS_PER_WORD,
        bloom_build_py,
    )

    assert BLOOM_BITS_PER_WORD <= 60
    words = bloom_build_py([f"x{i}" for i in range(5000)], m_bits=128, k=8)
    assert all(0 <= w < (1 << 63) for w in words.values())


# --- log histogram (quantile sketch) ----------------------------------


def test_loghist_bucket_py_invariants():
    from hypothesis import given, settings, strategies as st

    from logparser_llm_spark.operators.sketch import (
        loghist_bucket_py,
        loghist_lo_py,
    )

    @given(st.integers(min_value=0, max_value=(1 << 62) - 1))
    @settings(max_examples=500, deadline=None)
    def check(v):
        b = loghist_bucket_py(v)
        lo = loghist_lo_py(b)
        assert lo <= v
        assert loghist_bucket_py(lo) == b  # lo is in its own bucket
        if v >= 16:
            assert (v - lo) / v < 2 ** -3  # relative error contract
        if v < 16:
            assert lo == v  # exact region

    check()
    # monotone: bucket index never decreases with value
    from logparser_llm_spark.operators.sketch import loghist_bucket_py as bp

    last = -1
    for v in list(range(0, 4096)) + [1 << 20, (1 << 20) + 1, 1 << 40]:
        b = bp(v)
        assert b >= last
        last = b


def test_loghist_spark_matches_python_and_merge_law(spark):
    import collections

    from logparser_llm_spark.operators.sketch import (
        loghist_build,
        loghist_merge,
        loghist_quantiles,
        loghist_quantiles_py,
    )

    vals = list(range(0, 3000)) + [0, 1, 15, 16, 17, (1 << 40) - 1, 1 << 40]
    df = spark.createDataFrame(
        [("a" if v % 3 else "b", v) for v in vals], "k string, v long"
    )
    hist = loghist_build(df, ["k"], "v")
    by = collections.defaultdict(list)
    for v in vals:
        by["a" if v % 3 else "b"].append(v)
    for r in loghist_quantiles(hist, ["k"]).collect():
        py = loghist_quantiles_py(by[r["k"]])
        assert (r["n"], r["p50"], r["p95"], r["p99"]) == (
            py["n"], py["p50"], py["p95"], py["p99"],
        )
    # union law: build on disjoint halves + merge == build on the union
    h1 = loghist_build(df.where("v % 2 = 0"), ["k"], "v")
    h2 = loghist_build(df.where("v % 2 = 1"), ["k"], "v")
    merged = loghist_merge(h1.unionAll(h2), ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, hist.collect()))


def test_loghist_duckdb_renders_bit_identical():
    import duckdb as _d

    from logparser_llm_spark.operators.sketch import (
        _loghist_bucket_sql,
        _loghist_lo_sql,
        loghist_bucket_py,
        loghist_lo_py,
        loghist_quantiles_py,
        loghist_sql,
    )

    con = _d.connect()
    con.execute(
        "create table t as select unnest(range(0, 20000))::BIGINT as v "
        "union all select unnest([1023::BIGINT, 1024, (1::BIGINT<<40)-1, "
        "1::BIGINT<<40, 123456789012345]) as v"
    )
    b = _loghist_bucket_sql("v", 3, duck=True)
    for v, got in con.execute(f"select v, {b} from t").fetchall():
        assert got == loghist_bucket_py(v)
    lo = _loghist_lo_sql("bucket", 3, duck=True)
    for bk, got in con.execute(
        f"with h as (select distinct {b} as bucket from t) select bucket, {lo} from h"
    ).fetchall():
        assert got == loghist_lo_py(bk)
    body = loghist_sql("t", "'all'", "v", group_alias="k")
    row = con.execute(f"with {body} select n, p50, p95, p99 from lh_q").fetchone()
    vals = [r[0] for r in con.execute("select v from t").fetchall()]
    py = loghist_quantiles_py(vals)
    assert row == (py["n"], py["p50"], py["p95"], py["p99"])


def test_loghist_null_skipped_negative_raises_and_validation(spark):
    import pytest as _pt

    from logparser_llm_spark.operators.sketch import (
        loghist_build,
        loghist_quantiles,
        loghist_quantiles_py,
    )

    df = spark.createDataFrame([("a", 5), ("a", None), ("a", 7)], "k string, v long")
    got = loghist_quantiles(loghist_build(df, ["k"], "v"), ["k"]).collect()
    assert got[0]["n"] == 2  # NULL skipped
    neg = spark.createDataFrame([("a", -1)], "k string, v long")
    with _pt.raises(Exception, match="negative value"):
        loghist_build(neg, ["k"], "v").collect()
    with _pt.raises(ValueError, match="sub_bits"):
        loghist_build(df, ["k"], "v", sub_bits=0)
    with _pt.raises(ValueError, match="percents"):
        loghist_quantiles(loghist_build(df, ["k"], "v"), ["k"], percents=(0,))
    with _pt.raises(ValueError, match="negative"):
        loghist_quantiles_py([-5])


def test_quantile_sketch_accuracy_contract_on_registered_corpus(spark):
    """The est-vs-exact demonstration columns obey the documented bound
    on the actual sf0.01 corpus: p_est ≤ p_exact < p_est·(1 + 2^-3)."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["quantile_sketch"][0](spark, "/root/testdata/sf0.01").collect()
    assert len(rows) >= 3
    for r in rows:
        for pct in (50, 95, 99):
            est, exact = r[f"p{pct}_est"], r[f"p{pct}_exact"]
            assert est <= exact
            if exact >= 16:
                assert exact < est * (1 + 2 ** -3)


# --- Misra-Gries heavy hitters ----------------------------------------


def test_mg_summary_py_error_bound():
    """The per-summary guarantee the two-pass soundness cut rests on:
    weight(v) >= count(v) - n/(cap+1), for adversarial-ish streams."""
    import random

    from logparser_llm_spark.operators.sketch import mg_summary_py

    rng = random.Random(7)
    for trial in range(20):
        cap = rng.choice([2, 3, 5, 8])
        vals = []
        for v in range(30):
            vals += [f"v{v}"] * rng.randrange(0, 40)
        rng.shuffle(vals)
        counters, n = mg_summary_py(vals, cap)
        assert n == len(vals)
        assert len(counters) <= cap
        import collections

        exact = collections.Counter(vals)
        for v, c in exact.items():
            assert counters.get(v, 0) >= c - n / (cap + 1)
            assert counters.get(v, 0) <= c  # never overcounts


def test_heavy_hitters_exact_matches_bruteforce(spark):
    """End-to-end: skewed stream across many partitions, tiny cap so the
    decrement path runs, output must equal the exact group-by answer."""
    import collections

    from logparser_llm_spark.operators.sketch import heavy_hitters_exact

    vals = []
    for v in range(200):
        vals += [f"v{v:03d}"] * (1 + (v * 7919) % 97)
    vals += ["hot"] * 2000 + ["warm"] * 800
    df = spark.createDataFrame([(v,) for v in vals], "t string").repartition(16)
    got = {
        r["t"]: r["cnt"]
        for r in heavy_hitters_exact(df, "t", phi_num=1, phi_den=20).collect()
    }
    n = len(vals)
    thr = (n + 19) // 20
    exact = {v: c for v, c in collections.Counter(vals).items() if c >= thr}
    assert got == exact and "hot" in got


def test_heavy_hitters_nulls_and_validation(spark):
    import pytest as _pt

    from logparser_llm_spark.operators.sketch import (
        heavy_hitters_exact,
        mg_summary_py,
    )

    df = spark.createDataFrame([("a",), (None,), ("a",), ("b",)], "t string")
    got = {r["t"]: r["cnt"] for r in
           heavy_hitters_exact(df, "t", phi_num=1, phi_den=2).collect()}
    assert got == {"a": 2}  # N=3 (null skipped), threshold ceil(3/2)=2
    with _pt.raises(ValueError, match="phi"):
        heavy_hitters_exact(df, "t", phi_num=3, phi_den=2)
    with _pt.raises(ValueError, match="cap"):
        mg_summary_py(["a"], 0)


def test_heavy_hitters_partition_invariance(spark):
    """Same answer at 1, 4 and 32 partitions — the summaries are
    partition-dependent but the exact recount is not."""
    from logparser_llm_spark.operators.sketch import heavy_hitters_exact

    vals = [f"v{i % 37}" for i in range(5000)] + ["big"] * 900
    base = spark.createDataFrame([(v,) for v in vals], "t string")
    outs = []
    for p in (1, 4, 32):
        outs.append(sorted(
            map(tuple, heavy_hitters_exact(
                base.repartition(p), "t", phi_num=1, phi_den=10).collect())
        ))
    assert outs[0] == outs[1] == outs[2] and outs[0]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_heavy_hitters_registered_query_nonempty(spark, sf):
    """An empty result set would make the registered oracle row
    vacuous; pin nonemptiness at both driver scales."""
    from logparser_llm_spark.plans.queries import QUERIES

    assert QUERIES["heavy_hitters"][0](spark, sf).count() > 0


# --- grouped Bloom (per-file skip index) --------------------------------

def test_grouped_bloom_filters_are_independent(spark):
    """A value inserted only into group 0 must read maybe_present=false
    against group 1's filter (independent filters), true against its
    own; exact parity with the per-group Python build."""
    from logparser_llm_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
        bloom_contains_py,
        bloom_build_py,
    )

    m, k = 1 << 12, 3
    rows = [(i % 2, f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "g bigint, v string")
    blooms = bloom_build(df, "v", m_bits=m, k=k, group_cols=("g",))
    grid = spark.createDataFrame(
        [(g, f"v{i}") for g in (0, 1) for i in (0, 1, 2, 3, 999)],
        "g bigint, v string",
    )
    got = {
        (r["g"], r["v"]): r["maybe_present"]
        for r in bloom_contains(
            blooms, grid, "v", m_bits=m, k=k, group_cols=("g",)
        ).collect()
    }
    ref = {
        g: bloom_build_py([v for gg, v in rows if gg == g], m_bits=m, k=k)
        for g in (0, 1)
    }
    for (g, v), maybe in got.items():
        assert maybe == bloom_contains_py(ref[g], v, m_bits=m, k=k)
    # membership follows the group: v0 lives in group 0 only
    assert got[(0, "v0")] and got[(1, "v1")]
    assert not got[(1, "v0")] and not got[(0, "v1")]
    assert not got[(0, "v999")] and not got[(1, "v999")]


def test_grouped_bloom_sql_matches_spark(spark):
    import duckdb

    from logparser_llm_spark.operators.sketch import (
        bloom_build,
        bloom_contains,
        bloom_sql,
    )

    m, k = 1 << 10, 4
    rows = [(i % 3, f"key{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "g bigint, v string")
    grid_rows = [(g, f"key{i}") for g in range(3) for i in (0, 1, 2, 50)]
    grid = spark.createDataFrame(grid_rows, "g bigint, v string")
    got = sorted(
        (r["g"], r["v"], r["maybe_present"])
        for r in bloom_contains(
            bloom_build(df, "v", m_bits=m, k=k, group_cols=("g",)),
            grid, "v", m_bits=m, k=k, group_cols=("g",),
        ).collect()
    )
    con = duckdb.connect()
    con.execute("create table s (g bigint, v varchar)")
    con.executemany("insert into s values (?, ?)", rows)
    con.execute("create table p (g bigint, v varchar)")
    con.executemany("insert into p values (?, ?)", grid_rows)
    inner = bloom_sql("s", "v", "p", "v", m_bits=m, k=k, group_expr="g")
    duck = con.execute(
        f"with {inner} select grp, v, maybe_present from bloom_e"
    ).fetchall()
    assert sorted(duck) == got


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_file_skip_index_laws(spark, sf):
    """No false negatives (true_file_covered == doc_exists on every
    probe), the absent-everywhere probe exists nowhere, and the index
    actually skips: every existing probe's candidate count is far
    below the 16-file full scan."""
    from logparser_llm_spark.plans.queries import QUERIES, FSI_FILES

    rows = {r["probe"]: r for r in QUERIES["file_skip_index"][0](spark, sf).collect()}
    assert len(rows) == 7
    for r in rows.values():
        assert r["true_file_covered"] == r["doc_exists"]
    assert not rows["doc-99999"]["doc_exists"]
    assert rows["doc-0"]["doc_exists"] and rows["doc-444"]["doc_exists"]
    exists_4999 = rows["doc-4999"]["doc_exists"]
    assert exists_4999 == ("sf0.1" in sf)
    for r in rows.values():
        if r["doc_exists"]:
            assert 1 <= r["n_candidate_files"] <= FSI_FILES // 4
