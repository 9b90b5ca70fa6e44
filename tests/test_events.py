"""Event analytics (operators/events.py), collocations
(operators/collocation.py) and the table profiler
(operators/profile.py): constructed-corpus differentials vs the
module Python references, semantic edge cases (window boundaries,
warm-up, gaps, NULLs), validation contracts, plan gates, and the
registered queries' class-completeness at sf0.01 AND sf0.1."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.collocation import (
    _NU_MAX,
    bigram_pmi,
    bigram_pmi_py,
)
from logparser_llm_spark.operators.events import (
    burst_hours,
    burst_py,
    burst_sql,
    cohort_py,
    cohort_retention,
    cohort_sql,
    event_transitions,
    funnel_counts,
    funnel_py,
    transitions_py,
)
from logparser_llm_spark.operators.profile import table_profile, table_profile_py

US = 1_000_000


def _ts(sec: int):
    from datetime import datetime, timedelta

    return datetime(2024, 1, 1) + timedelta(seconds=sec)


EPOCH_2024 = 1_704_067_200  # 2024-01-01 00:00:00 UTC


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

# (user, sec, type): u1 completes A->B->C inside the window; u2's B is
# exactly AT the window edge (inclusive); u3's B is one second past it;
# u4's B precedes their first A (strictly-after is violated); u5 has a
# later A that WOULD convert but first-attempt does not credit it.
FUNNEL_ROWS = [
    ("u1", 0, "A"), ("u1", 10, "B"), ("u1", 20, "C"),
    ("u2", 0, "A"), ("u2", 60, "B"),
    ("u3", 0, "A"), ("u3", 61, "B"),
    ("u4", 50, "A"), ("u4", 40, "B"),
    ("u5", 0, "A"), ("u5", 1000, "A"), ("u5", 1010, "B"),
]


@pytest.fixture(scope="module")
def funnel_df(spark):
    return spark.createDataFrame(
        [(u, _ts(s), t) for u, s, t in FUNNEL_ROWS],
        "user_id string, ts timestamp, event_type string",
    )


def test_funnel_semantics_and_python_reference(funnel_df):
    got = sorted(
        tuple(r)
        for r in funnel_counts(
            funnel_df, "user_id", "ts", "event_type", ["A", "B", "C"],
            window_s=60,
        ).collect()
    )
    ref = sorted(
        funnel_py(
            [((u), (EPOCH_2024 + s) * US, t) for u, s, t in FUNNEL_ROWS],
            ["A", "B", "C"],
            60,
        )
    )
    assert got == ref
    by_step = {r[0]: r for r in got}
    # u1 + u2 reach B (edge inclusive), u3/u4/u5 do not; only u1 reaches C
    assert by_step[1][2] == 5
    assert by_step[2][2] == 2 and by_step[2][3] == 400
    assert by_step[3][2] == 1 and by_step[3][3] == 500


def test_funnel_empty_middle_step_yields_zero_tail(funnel_df):
    rows = {
        tuple(r)
        for r in funnel_counts(
            funnel_df, "user_id", "ts", "event_type", ["A", "X", "C"],
            window_s=60,
        ).collect()
    }
    assert (1, "A", 5, 1000) in rows
    assert (2, "X", 0, 0) in rows
    assert (3, "C", 0, 0) in rows


def test_funnel_validation(funnel_df):
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel_counts(funnel_df, "user_id", "ts", "event_type", ["A"],
                      window_s=60)
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(funnel_df, "user_id", "ts", "event_type",
                      ["A", "A"], window_s=60)
    with pytest.raises(ValueError, match="positive"):
        funnel_counts(funnel_df, "user_id", "ts", "event_type",
                      ["A", "B"], window_s=0)
    with pytest.raises(ValueError, match="reserved"):
        funnel_counts(
            funnel_df.withColumnRenamed("user_id", "step"),
            "step", "ts", "event_type", ["A", "B"], window_s=60,
        )


def test_funnel_plan_broadcasts_anchor_frames(funnel_df):
    from logparser_llm_spark.plans.inspect import plan_facts

    df = funnel_counts(
        funnel_df, "user_id", "ts", "event_type", ["A", "B", "C"],
        window_s=60,
    )
    facts = plan_facts(df)
    assert facts["broadcast_hash_join"]
    assert not facts["sort_merge_join"]
    assert not facts["python_udf"]


# ---------------------------------------------------------------------------
# transitions
# ---------------------------------------------------------------------------

# u1: A B A C (with a same-timestamp tie broken by the order col);
# u2: single event -> contributes no pair
TRANS_ROWS = [
    ("u1", 0, "A", 1), ("u1", 10, "B", 2),
    ("u1", 10, "A", 3),  # ties with the B row; order col puts it after
    ("u1", 20, "C", 4),
    ("u2", 5, "B", 5),
]


def test_transitions_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(u, _ts(s), t, o) for u, s, t, o in TRANS_ROWS],
        "user_id string, ts timestamp, event_type string, event_id bigint",
    )
    got = sorted(
        tuple(r)
        for r in event_transitions(
            df, "user_id", "ts", "event_type", ["event_id"]
        ).collect()
    )
    ref = transitions_py(
        [(u, (EPOCH_2024 + s) * US, t, o) for u, s, t, o in TRANS_ROWS]
    )
    assert got == ref
    assert ("A", "B", 1, 500) in got and ("A", "C", 1, 500) in got
    assert ("B", "A", 1, 1000) in got


def test_transitions_requires_order_cols(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), "A", 1)],
        "user_id string, ts timestamp, event_type string, event_id bigint",
    )
    with pytest.raises(ValueError, match="order_cols"):
        event_transitions(df, "user_id", "ts", "event_type", [])


# ---------------------------------------------------------------------------
# cohort
# ---------------------------------------------------------------------------

# bucket_s=10: u1 first in bucket 0, active 0 and 2 (gap at 1);
# u2 first in bucket 1, active 1 only; u3 first in bucket 0, active 0,1
COHORT_ROWS = [
    ("u1", 5), ("u1", 25), ("u1", 7),
    ("u2", 15),
    ("u3", 2), ("u3", 12),
]


def test_cohort_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(u, _ts(s)) for u, s in COHORT_ROWS],
        "user_id string, ts timestamp",
    )
    got = sorted(
        tuple(r)
        for r in cohort_retention(df, "user_id", "ts", bucket_s=10).collect()
    )
    ref = cohort_py(
        [(u, (EPOCH_2024 + s) * US) for u, s in COHORT_ROWS], bucket_s=10
    )
    # identical buckets shifted by the 2024 epoch offset on both sides
    assert got == ref
    offsets = {(r[1], r[2]) for r in got if r[3] == 2}  # the 2-user cohort
    assert (0, 2) in offsets  # both active at offset 0
    assert (1, 1) in offsets and (2, 1) in offsets  # gap pattern survives


def test_cohort_validation(spark):
    df = spark.createDataFrame([("u", _ts(0))], "user_id string, ts timestamp")
    with pytest.raises(ValueError, match="positive"):
        cohort_retention(df, "user_id", "ts", bucket_s=0)


# ---------------------------------------------------------------------------
# burst
# ---------------------------------------------------------------------------


def _burst_rows():
    # type 'x': buckets 0..11 at 2/bucket (warm-up exactly satisfied at
    # bucket 12), bucket 12 spikes to 10 (burst), bucket 13 back to 2
    # (wsum now includes the spike -> not a burst); bucket 20 spikes
    # after a short gap — its RANGE frame still sees the 14 present
    # buckets 0..13 (gap-aware: present buckets count, missing ones
    # don't), so it alerts; bucket 50 spikes after a long gap — the
    # trailing frame 26..49 is empty, wn=0 < min_periods, so an
    # isolated spike with no baseline can never alert.
    rows = []
    for b in range(12):
        rows += [(b * 3600 + 1, "x"), (b * 3600 + 2, "x")]
    rows += [(12 * 3600 + i, "x") for i in range(10)]
    rows += [(13 * 3600 + 1, "x"), (13 * 3600 + 2, "x")]
    rows += [(20 * 3600 + i, "x") for i in range(30)]
    rows += [(50 * 3600 + i, "x") for i in range(30)]
    return rows


def test_burst_matches_python_reference_and_semantics(spark):
    rows = _burst_rows()
    df = spark.createDataFrame(
        [(_ts(s), t) for s, t in rows], "ts timestamp, event_type string"
    )
    got = sorted(
        tuple(r)
        for r in burst_hours(df, "ts", "event_type", min_periods=12).collect()
    )
    base = EPOCH_2024 // 3600
    ref = burst_py(
        [((EPOCH_2024 + s) * US, t) for s, t in rows], min_periods=12
    )
    assert got == ref
    flags = {r[1] - base: r[5] for r in got}
    assert flags[12] is True  # the seeded spike
    assert flags[11] is False  # warm-up not yet satisfied (wn=11)
    assert flags[13] is False  # trailing window absorbed the spike
    assert flags[20] is True  # short gap: 14 trailing buckets remain
    assert flags[50] is False  # long gap: wn=0, no baseline -> no alert


def test_cohort_and_burst_pre_epoch_three_way_parity(spark):
    """Review pin: time bucketing floors (pure integer arithmetic), so
    pre-epoch (negative-micros) timestamps land in the same bucket on
    Spark, DuckDB and the Python references. A truncating spelling
    (float div + cast, or bare `div`/`//`) puts -1800s in bucket 0
    instead of -1 and all three disagree — the corpus below is built so
    that divergence changes cohorts, offsets AND per-bucket counts."""
    import duckdb
    import pandas as pd

    rows = [
        ("u1", -1_800 * US), ("u1", 3_600 * US),
        ("u2", -7_200 * US), ("u2", -1_800 * US),
        ("u3", 10 * US),
    ]
    df = spark.createDataFrame(rows, "user_id string, us bigint").select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    got = sorted(
        tuple(r)
        for r in cohort_retention(df, "user_id", "ts", bucket_s=3600).collect()
    )
    ref = cohort_py(rows, bucket_s=3600)
    assert got == ref
    # floor semantics: u1's first-seen bucket is -1, NOT the truncated 0,
    # and their second activity is offset 2 (buckets -1 -> 1)
    assert {r[0] for r in got} == {-2, -1, 0}
    assert (-1, 2) in {(r[0], r[1]) for r in got}

    con = duckdb.connect()
    con.register("ev_us", pd.DataFrame(rows, columns=["user_id", "us"]))
    rel = "(select user_id, make_timestamp(us) as ts from ev_us)"
    oracle = sorted(
        tuple(r)
        for r in con.sql(
            cohort_sql(events=rel, user_col="user_id", ts_col="ts", bucket_s=3600)
        ).fetchall()
    )
    assert oracle == ref

    brows = [(-3_600 * US, "x"), (-1_800 * US, "x"), (10 * US, "x")]
    bdf = spark.createDataFrame(brows, "us bigint, event_type string").select(
        F.timestamp_micros("us").alias("ts"), "event_type"
    )
    bgot = sorted(
        tuple(r) for r in burst_hours(bdf, "ts", "event_type").collect()
    )
    bref = burst_py(brows)
    assert bgot == bref
    # -3600s (exact boundary) and -1800s (floored) share bucket -1
    assert [(r[1], r[2]) for r in bgot] == [(-1, 2), (0, 1)]

    con.register("b_us", pd.DataFrame(brows, columns=["us", "event_type"]))
    brel = "(select make_timestamp(us) as ts, event_type from b_us)"
    boracle = sorted(
        tuple(r)
        for r in con.sql(
            burst_sql(events=brel, ts_col="ts", type_col="event_type")
        ).fetchall()
    )
    assert boracle == bref


def test_burst_validation(spark):
    df = spark.createDataFrame([(_ts(0), "x")], "ts timestamp, event_type string")
    with pytest.raises(ValueError, match="positive"):
        burst_hours(df, "ts", "event_type", bucket_s=0)
    with pytest.raises(ValueError, match="min_periods"):
        burst_hours(df, "ts", "event_type", min_periods=0)
    with pytest.raises(ValueError, match="min_periods"):
        burst_hours(df, "ts", "event_type", trail=5, min_periods=6)


# ---------------------------------------------------------------------------
# collocations
# ---------------------------------------------------------------------------

PHRASE_TEXTS = [
    "new york is far from new jersey",
    "new york and new york again",
    "  padded   spacing  new york  ",
    "york new",
]


def test_bigram_pmi_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in PHRASE_TEXTS], "text string")
    got = [tuple(r) for r in bigram_pmi(df, "text", min_count=2, k=5).collect()]
    ref = bigram_pmi_py(PHRASE_TEXTS, min_count=2, k=5)
    assert got == ref
    assert got[0][:2] == ("new", "york")  # the collocation wins
    # counts are exact: 'new york' appears 4 times across docs
    top = {(r[0], r[1]): r[2] for r in got}
    assert top[("new", "york")] == 4


def test_bigram_pmi_validation_and_single_token_docs(spark):
    df = spark.createDataFrame([("solo",), ("",)], "text string")
    assert bigram_pmi(df, "text", min_count=1).collect() == []
    with pytest.raises(ValueError, match="min_count"):
        bigram_pmi(df, "text", min_count=0)
    with pytest.raises(ValueError, match="k"):
        bigram_pmi(df, "text", k=0)
    with pytest.raises(ValueError, match="nu_max"):
        bigram_pmi(df, "text", nu_max=0)
    with pytest.raises(ValueError, match="nu_max"):
        bigram_pmi(df, "text", nu_max=_NU_MAX + 1)


def test_bigram_pmi_headroom_guard_actually_executes(spark):
    """Review pin: the assert_true guard is woven into the kept score
    expression — a guard in a dropped side column is pruned by Catalyst
    and never runs (the original spelling collect()ed fine with the cap
    below the corpus size). Lowering nu_max below this corpus's token
    count must therefore RAISE at execution."""
    df = spark.createDataFrame([(t,) for t in PHRASE_TEXTS], "text string")
    with pytest.raises(Exception, match="headroom"):
        bigram_pmi(df, "text", min_count=1, nu_max=3).collect()


# ---------------------------------------------------------------------------
# profiler
# ---------------------------------------------------------------------------


def test_table_profile_matches_python_reference(spark):
    rows = [
        {"a": 1, "b": "x", "c": None},
        {"a": 2, "b": "x", "c": None},
        {"a": 2, "b": None, "c": None},
    ]
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["c"]) for r in rows],
        "a bigint, b string, c string",
    )
    got = sorted(tuple(r) for r in table_profile(df).collect())
    ref = sorted(table_profile_py(rows, ["a", "b", "c"]))
    assert got == ref
    by_col = {r[0]: r for r in got}
    assert by_col["a"][1:] == (3, 0, 2, "1", "2")
    assert by_col["b"][1:] == (3, 1, 1, "x", "x")
    assert by_col["c"][1:] == (3, 3, 0, None, None)  # all-NULL column


def test_table_profile_validation(spark):
    df = spark.createDataFrame([(1.5, 1)], "d double, a bigint")
    with pytest.raises(ValueError, match="stage to string/bigint"):
        table_profile(df, ["d"])
    with pytest.raises(ValueError, match="unknown column"):
        table_profile(df, ["zz"])
    with pytest.raises(ValueError, match="no columns"):
        table_profile(df, [])
    df2 = spark.createDataFrame([(1,)], "n_rows bigint")
    with pytest.raises(ValueError, match="reserved"):
        table_profile(df2, ["n_rows"])


def test_table_profile_plan_single_pass(spark):
    from logparser_llm_spark.plans.inspect import physical_plan

    df = spark.createDataFrame([(1, "x")], "a bigint, b string")
    plan = physical_plan(table_profile(df))
    assert "Expand" in plan  # the multi-count-distinct strategy
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# registered queries: class completeness at sf0.01 AND sf0.1
# ---------------------------------------------------------------------------

SCALES = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf", SCALES)
def test_funnel_query_strictly_decreasing_and_nonempty(spark, sf):
    from logparser_llm_spark.plans.queries import q_funnel_steps

    rows = sorted(q_funnel_steps(spark, sf).collect(), key=lambda r: r["step"])
    ns = [r["n_users"] for r in rows]
    assert len(ns) == 3
    assert ns[0] > ns[1] > ns[2] > 0  # calibrated: real drop at every step
    assert rows[0]["conv_permille"] == 1000
    assert all(0 < r["conv_permille"] < 1000 for r in rows[1:])


@pytest.mark.parametrize("sf", SCALES)
def test_cohort_query_triangle_classes(spark, sf):
    from logparser_llm_spark.plans.queries import q_cohort_retention

    rows = q_cohort_retention(spark, sf).collect()
    cohorts = {r["cohort_bucket"] for r in rows}
    assert len(cohorts) >= 3  # thinning spreads first-seen over weeks
    assert all(
        r["retention_permille"] == 1000 for r in rows if r["offset"] == 0
    )
    partial = [r for r in rows if r["offset"] > 0]
    assert partial and all(
        0 < r["retention_permille"] < 1000 for r in partial
    )


@pytest.mark.parametrize("sf", SCALES)
def test_burst_query_seeded_hour_flags_both_classes(spark, sf):
    from logparser_llm_spark.plans.queries import BURST_HOUR_IDX, q_burst_hours

    rows = q_burst_hours(spark, sf).collect()
    seeded = [
        r for r in rows
        if r["event_type"] == "error" and r["bucket_idx"] == BURST_HOUR_IDX
    ]
    assert len(seeded) == 1 and seeded[0]["is_burst"] is True
    flags = {r["is_burst"] for r in rows}
    assert flags == {True, False}  # negative class present too


@pytest.mark.parametrize("sf", SCALES)
def test_transitions_query_full_matrix_and_permille_law(spark, sf):
    from logparser_llm_spark.plans.queries import q_event_transitions

    rows = q_event_transitions(spark, sf).collect()
    assert len(rows) == 25  # all 5x5 transitions occur at driver scales
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["p_permille"])
    for ps in by_from.values():
        assert 1000 - len(ps) < sum(ps) <= 1000  # floor-division law


# --- char_entropy (operators/profile.py) -----------------------------------


def test_char_entropy_matches_python_reference(spark):
    from logparser_llm_spark.operators.profile import (
        char_entropy,
        char_entropy_py,
    )

    rows = [
        (0, "aaaaaaaaaa"),            # degenerate: entropy 0
        (1, "abab"),                  # two equiprobable chars: ln 2
        (2, "the quick brown fox"),   # natural-ish
        (3, ""),                      # empty
        (4, None),                    # NULL must still emit a row
        (5, "0123456789abcdef"),      # uniform 16-char: ln 16
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["n_chars"], r["distinct_chars"], r["entropy_e6"])
        for r in char_entropy(df, "id", "text").collect()
    }
    assert got == {i: char_entropy_py(t) for i, t in rows}
    assert got[0] == (10, 1, 0)
    assert got[1][2] == 693_147          # round(1e6·ln 2)
    assert got[3] == (0, 0, 0) and got[4] == (0, 0, 0)
    assert got[5][2] == 2_772_589        # round(1e6·ln 16)


def test_char_entropy_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.profile import (
        char_entropy,
        char_entropy_sql,
    )

    rows = [(0, "mississippi river"), (1, "zzzz"), (2, None), (3, "ab"),
            (4, "unicode: déjà vu ✓")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(tuple(r) for r in char_entropy(df, "id", "text").collect())
    con = duckdb.connect()
    con.execute("create table t (id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = char_entropy_sql(rel="t", id_col="id", text_col="text")
    assert got == sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_char_entropy_partition_invariance(spark):
    from logparser_llm_spark.operators.profile import char_entropy

    rows = [(i, f"text number {i} with repeats {('ab' * (i % 5))}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, text string")
    a = char_entropy(df.repartition(1), "id", "text").collect()
    b = char_entropy(df.repartition(13), "id", "text").collect()
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_char_entropy_registered_classes(spark, sf):
    """Three seeded classes: single-char runs at EXACTLY 0, md5-hex
    blobs just under the 16-char-uniform ceiling ln 16 (the ceiling is
    a hard inequality — H <= ln(alphabet)), natural text strictly
    positive. (Note the bands: this corpus's natural text uses a
    LARGER alphabet than hex, so its entropy overlaps/exceeds the
    blobs' — the useful detector contrasts are run-vs-anything and
    entropy-vs-own-alphabet ceiling, both pinned here.)"""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["char_entropy"][0](spark, sf).collect()
    runs = [r for r in rows if r["doc_id"] % 17 == 0]
    blobs = [r for r in rows if r["doc_id"] % 17 == 1]
    text = [r for r in rows if r["doc_id"] % 17 > 1]
    assert runs and blobs and text, sf
    assert all(r["entropy_e6"] == 0 and r["distinct_chars"] == 1
               for r in runs), sf
    assert all(
        2_400_000 < r["entropy_e6"] <= 2_772_589
        and r["distinct_chars"] <= 16
        for r in blobs
    ), sf
    assert all(0 < r["entropy_e6"] for r in text), sf


# --- mixture_jsd (operators/profile.py) -------------------------------------


def _jsd_py(docs):
    """Independent pure-Python restatement of the exact integer JSD
    pipeline (same tokenization, same >= 1 ln rewrite, HALF_UP
    quantize-before-sum, same floor) for differential testing."""
    import math
    import re
    from collections import Counter

    LN2 = 693147
    a = Counter()
    for g, t in docs:
        for tok in re.split(r"[^a-z0-9]+", (t or "").lower()):
            if tok:
                a[(g, tok)] += 1
    st, b, vocab = Counter(), Counter(), Counter()
    for (g, tok), c in a.items():
        st[g] += c
        b[tok] += c
        vocab[g] += 1
    ct = sum(b.values())

    def q(x):  # x >= 1 always, so HALF_UP == floor(x + 0.5)
        return math.floor(math.log(x) * 1_000_000 + 0.5)

    np_, nqp, sb = Counter(), Counter(), Counter()
    for (g, tok), av in a.items():
        bv = b[tok]
        mix = float(av) * ct + float(bv) * st[g]
        np_[g] += av * (LN2 - q(mix / (float(av) * ct)))
        nqp[g] += bv * (LN2 - q(mix / (float(bv) * st[g])))
        sb[g] += bv
    out = {}
    for g in st:
        nq = nqp[g] + LN2 * (ct - sb[g])
        out[g] = (st[g], vocab[g], np_[g], nq,
                  math.floor(np_[g] / (2.0 * st[g]) + nq / (2.0 * ct)))
    return out


def test_mixture_jsd_identical_sources_diverge_zero(spark):
    """Two sources with the SAME token multiset: every present-token ln
    argument is exactly 2 so both quantized numerators vanish and the
    absent mass is empty — JSD == 0 with zero tolerance."""
    from logparser_llm_spark.operators.profile import mixture_jsd

    rows = [(g, t) for g in ("a", "b")
            for t in ("the cat sat", "on the mat", "the end")]
    df = spark.createDataFrame(rows, "src string, text string")
    out = {r["src"]: r for r in mixture_jsd(df, "src", "text").collect()}
    for g in ("a", "b"):
        assert (out[g]["jsd_p_num"], out[g]["jsd_q_num"], out[g]["jsd_e6"]) \
            == (0, 0, 0)
        assert out[g]["n_tokens"] == 8 and out[g]["vocab"] == 6


def test_mixture_jsd_matches_python_reference(spark):
    from logparser_llm_spark.operators.profile import mixture_jsd

    docs = [
        ("news", "stocks rally as markets rise today"),
        ("news", "markets fall after rally fades"),
        ("spam", "casino casino win win win free"),
        ("spam", "free casino bonus now now"),
        ("blog", "today i wrote about markets and casino movies"),
        ("blog", None),
        ("blog", ""),
        ("empty", None),          # whole source empty: NO output row
        ("empty", "  \t "),
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    got = {r["src"]: (r["n_tokens"], r["vocab"], r["jsd_p_num"],
                      r["jsd_q_num"], r["jsd_e6"])
           for r in mixture_jsd(df, "src", "text").collect()}
    assert got == _jsd_py(docs)
    assert "empty" not in got


def test_mixture_jsd_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.profile import (
        mixture_jsd,
        mixture_jsd_sql,
    )

    rows = [
        ("a", "alpha beta gamma alpha"),
        ("a", "beta delta"),
        ("b", "zz yy xx zz zz"),
        ("b", "alpha zz"),
        ("c", "Unicode Déjà vu 123 beta"),
    ]
    df = spark.createDataFrame(rows, "src string, text string")
    got = sorted(tuple(r) for r in mixture_jsd(df, "src", "text").collect())
    con = duckdb.connect()
    con.execute("create table t (src varchar, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = mixture_jsd_sql(rel="t", group_col="src", text_col="text")
    assert got == sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_mixture_jsd_partition_invariance_and_bounds(spark):
    """Exact bigint numerators are partition-order-free, and every
    quantized divergence respects the mathematical ceiling ln 2 (a
    source disjoint from the rest approaches it from below)."""
    from logparser_llm_spark.operators.profile import mixture_jsd

    rows = [(f"s{i % 4}", f"tok{i % 7} tok{i % 11} word{i % 3} {i}")
            for i in range(80)]
    df = spark.createDataFrame(rows, "src string, text string")
    a = sorted(map(tuple, mixture_jsd(df.repartition(1), "src", "text").collect()))
    b = sorted(map(tuple, mixture_jsd(df.repartition(17), "src", "text").collect()))
    assert a == b
    for row in a:
        assert 0 <= row[5] <= 693_147 + 5, row


@pytest.mark.parametrize("sf", SCALES)
def test_mixture_jsd_registered_class_ordering(spark, sf):
    """The staged corpus's drift bands order strictly: the disjoint
    md5-blob source (index 5) nearest the ln 2 ceiling, the shared-vocab
    spam-flood source (index 3) in a mid band, every untouched source
    below both."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = {r["source"]: r["jsd_e6"]
            for r in QUERIES["mixture_jsd"][0](spark, sf).collect()}
    assert len(rows) == 20, sf
    rest = max(v for k, v in rows.items() if k not in ("src5", "src3"))
    assert rows["src5"] > rows["src3"] > rest, (sf, rows)
    assert rows["src5"] > 400_000, sf
    assert all(0 <= v <= 693_147 + 5 for v in rows.values()), sf


def test_mixture_jsd_plan_is_jvm_partial_agg(spark):
    from logparser_llm_spark.plans.inspect import physical_plan, plan_facts
    from logparser_llm_spark.plans.queries import QUERIES

    df = QUERIES["mixture_jsd"][0](spark, "/root/testdata/sf0.001")
    facts = plan_facts(df)
    assert not facts["python_udf"] and not facts["map_in_pandas"]
    assert facts["partial_aggregate"]
    assert "CartesianProduct" not in physical_plan(df)


# --- g_test_drift (operators/profile.py) ------------------------------------


def test_g_test_drift_exact_known_contingency(spark):
    """Perfectly separated 2x2 (A only in period 0, B only in period 1)
    has the closed-form G = 2·2·100·round(1e6·ln 2) — quantize-per-cell
    makes the expected value an exact integer; a perfectly balanced
    group has G = 0 and must not flag."""
    from logparser_llm_spark.operators.profile import g_test_drift

    rows = [("A", 0)] * 100 + [("B", 1)] * 100
    df = spark.createDataFrame(rows, "g string, p long")
    got = {r["g"]: r for r in g_test_drift(df, "g", "p").collect()}
    assert got["A"]["g_e6"] == 2 * 2 * 100 * 693147
    assert got["A"]["drifted"] and got["B"]["drifted"]

    bal = spark.createDataFrame(
        [("A", 0)] * 10 + [("A", 1)] * 10 + [("B", 0)] * 7 + [("B", 1)] * 7,
        "g string, p long",
    )
    for r in g_test_drift(bal, "g", "p").collect():
        assert r["g_e6"] == 0 and not r["drifted"], r


def test_g_test_drift_single_group_and_zero_cells(spark):
    """With one group the complement cells are empty (den = 0 → term
    0 by the guard, not NaN) and the group trivially has G = 0; a
    group absent from one period contributes only its nonzero cells."""
    from logparser_llm_spark.operators.profile import (
        g_test_drift,
        g_test_drift_py,
    )

    one = spark.createDataFrame([("A", 0)] * 3 + [("A", 1)] * 5,
                                "g string, p long")
    r = g_test_drift(one, "g", "p").collect()[0]
    assert r["g_e6"] == 0 and not r["drifted"]

    skew = spark.createDataFrame(
        [("A", 0)] * 6 + [("B", 0)] * 4 + [("B", 1)] * 10,
        "g string, p long",
    )
    got = {x["g"]: x for x in g_test_drift(skew, "g", "p").collect()}
    for g, x in got.items():
        assert x["g_e6"] == g_test_drift_py(
            x["o1"], x["o2"], x["r1"], x["r2"]), (g, x)
    assert got["A"]["o2"] == 0 and got["A"]["g_e6"] > 0


def test_g_test_drift_trilateral_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.profile import (
        g_test_drift,
        g_test_drift_py,
        g_test_drift_sql,
    )

    rows = [(f"g{i % 5}", (i * 7 + i // 13) % 2) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, p long")
    got = sorted(map(tuple, g_test_drift(df, "g", "p").collect()))
    con = duckdb.connect()
    con.execute("create table t (g varchar, p bigint)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = g_test_drift_sql(rel="t", group_col="g", period_col="p")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))
    for g, o1, o2, r1, r2, g_e6, drifted in got:
        assert g_e6 == g_test_drift_py(o1, o2, r1, r2), g
        assert drifted == (g_e6 > 3_841_459)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_template_drift_registered_classes(spark, sf):
    """The staged click deletion must make 'click' the suite's largest
    G by a wide margin and flag it; every row's statistic is
    recomputable from its own counts. (No not-drifted assertion: G
    scales with n, so at larger SFs even the knock-on share shift in
    the untouched types crosses the fixed chi-square bar — correct
    test behavior, the planted effect just has to DOMINATE.)"""
    from logparser_llm_spark.operators.profile import g_test_drift_py
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["template_drift"][0](spark, sf).collect()
    assert len(rows) == 5, sf
    by_type = {r["event_type"]: r for r in rows}
    for r in rows:
        assert r["g_e6"] == g_test_drift_py(
            r["o1"], r["o2"], r["r1"], r["r2"]), r
        assert r["drifted"] == (r["g_e6"] > 3_841_459), r
    click = by_type["click"]
    assert click["drifted"], sf
    assert click["g_e6"] == max(r["g_e6"] for r in rows), sf
    # the deletion is visible in the raw counts: click lost period-1 mass
    assert click["o2"] < click["o1"] * 2 // 3, sf
    runner_up = max(r["g_e6"] for r in rows if r["event_type"] != "click")
    assert click["g_e6"] > 3 * runner_up, (sf, click["g_e6"], runner_up)


# --- source_token_jaccard (operators/profile.py) -----------------------------


def test_source_token_jaccard_exact_sets(spark):
    """Hand sets: |{a,b,c} ∩ {b,c,d}| = 2, union 4 → exactly 500000;
    identical sets → exactly 1e6; a disjoint source keeps 0-rows
    against EVERY other source (the grid left-join, not an inner
    join); output is every unordered pair once."""
    from logparser_llm_spark.operators.profile import source_token_jaccard

    rows = [("A", "a b c"), ("B", "b c d"), ("C", "x"),
            ("D", "a b c"), ("E", None)]
    df = spark.createDataFrame(rows, "g string, text string")
    got = {(r["g1"], r["g2"]): r for r in
           source_token_jaccard(df, "g", "text").collect()}
    # E has no tokens → absent; C(3 others) + pairs among A,B,D = 3+3
    assert set(got) == {("A", "B"), ("A", "C"), ("A", "D"),
                        ("B", "C"), ("B", "D"), ("C", "D")}
    assert got[("A", "B")]["jaccard_e6"] == 500_000
    assert got[("A", "D")]["jaccard_e6"] == 1_000_000
    for pair in (("A", "C"), ("B", "C"), ("C", "D")):
        assert got[pair]["inter"] == 0 and got[pair]["jaccard_e6"] == 0


def test_source_token_jaccard_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.profile import (
        source_token_jaccard,
        source_token_jaccard_sql,
    )

    rows = [(f"g{i % 4}", f"tok{i % 7} tok{(i * 3) % 11} shared")
            for i in range(60)]
    df = spark.createDataFrame(rows, "g string, text string")
    got = sorted(map(tuple, source_token_jaccard(df, "g", "text").collect()))
    con = duckdb.connect()
    con.execute("create table t (g varchar, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = source_token_jaccard_sql(rel="t", group_col="g", text_col="text")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_source_overlap_registered_classes(spark, sf):
    """All 190 unordered pairs present; every src7 pair is exactly 0
    (disjoint md5 blobs), (src2, src4) is exactly 1e6 (shared
    sentinel), natural-text pairs are nonzero (the synthetic corpus
    vocabulary is shared — some natural pairs legitimately reach 1e6),
    and every jaccard_e6 is recomputable from its own row."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["source_overlap"][0](spark, sf).collect()
    assert len(rows) == 190, sf
    staged = {"src2", "src4", "src7"}
    for r in rows:
        expect = round(1e6 * r["inter"]
                       / (r["size1"] + r["size2"] - r["inter"]))
        assert r["jaccard_e6"] == expect, r
        if "src7" in (r["g1"], r["g2"]):
            assert r["inter"] == 0 and r["jaccard_e6"] == 0, r
        elif (r["g1"], r["g2"]) == ("src2", "src4"):
            assert r["jaccard_e6"] == 1_000_000, r
        elif not staged & {r["g1"], r["g2"]}:
            assert 0 < r["jaccard_e6"] <= 1_000_000, r


# --- script_mix (operators/profile.py) --------------------------------------


def test_script_mix_hand_check_and_ties(spark):
    """Dominant picks the argmax; exact ties resolve by SCRIPT_CLASSES
    precedence (latin > cyrillic > han > arabic); letterless and NULL
    docs emit zero rows with dominant 'none' (never dropped); the
    mixed bar is inclusive (second·1000 == permille·letters flags)."""
    from logparser_llm_spark.operators.profile import script_mix

    rows = [
        (0, "hello world"),            # latin pure
        (1, "привет мир hello"),       # cyr-dominant, latin 5/14 mixed
        (2, "你好世界"),                 # han pure
        (3, None),                     # NULL: zero row, 'none'
        (4, "123 !!"),                 # letterless: 'none'
        (5, "abc абв"),                # 3-3 tie -> latin wins
        (6, "a" * 18 + " по"),         # 2/20 == inclusive 100 permille bar
        (7, "a" * 19 + " п"),          # 1/20 = 50 permille: under bar
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in script_mix(df, "id", "text").collect()}
    assert len(got) == 8  # NULL and letterless rows present
    assert (got[0]["dominant"], got[0]["is_mixed"]) == ("latin", False)
    assert (got[1]["dominant"], got[1]["is_mixed"]) == ("cyrillic", True)
    assert (got[2]["dominant"], got[2]["n_han"]) == ("han", 4)
    assert (got[3]["dominant"], got[3]["n_letters"]) == ("none", 0)
    assert got[4]["dominant"] == "none"
    assert got[5]["dominant"] == "latin"  # tie precedence
    assert got[6]["is_mixed"] is True     # inclusive bar
    assert got[7]["is_mixed"] is False


def test_script_mix_validation_and_second_max_law(spark):
    import pytest as _pytest

    from logparser_llm_spark.operators.profile import (
        script_mix,
        script_mix_sql,
    )

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with _pytest.raises(ValueError, match="mixed_permille"):
        script_mix(df, "id", "text", mixed_permille=0)
    with _pytest.raises(ValueError, match="mixed_permille"):
        script_mix_sql(rel="t", id_col="id", text_col="text",
                       mixed_permille=1001)
    # greatest-of-pairwise-leasts == true second max on a 4-way spread
    rows = [(0, "aa ббб 你好世界好 ννν")]  # latin 2, cyr 3, han 5 (greek !counted)
    d2 = spark.createDataFrame(rows, "id long, text string")
    r = script_mix(d2, "id", "text").collect()[0]
    assert (r["n_latin"], r["n_cyrillic"], r["n_han"]) == (2, 3, 5)
    # second max is 3 -> 3*1000 >= 100*10 -> mixed
    assert r["n_letters"] == 10 and r["is_mixed"] is True


def test_script_mix_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.profile import (
        script_mix,
        script_mix_sql,
    )

    rows = []
    for i in range(150):
        base = f"doc {i} " + "word " * (i % 5)
        if i % 4 == 1:
            base += " привет мир" * (i % 3 + 1)
        if i % 4 == 2:
            base = "数据处理流水线" * (i % 2 + 1) + " ok"
        if i % 7 == 3:
            base += " مرحبا"
        if i % 29 == 0:
            base = None
        rows.append((i, base))
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(map(tuple, script_mix(df, "id", "text").collect()))
    con = duckdb.connect()
    con.execute("create table t (id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        script_mix_sql(rel="t", id_col="id", text_col="text")
    ).fetchall()))
    assert got == want


def test_script_mix_zero_exchange_plan(spark):
    """The signal is a pure scan-side projection: no Exchange, no
    Python, whole-stage codegen."""
    from logparser_llm_spark.operators.profile import script_mix
    from logparser_llm_spark.plans.inspect import plan_facts

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = script_mix(df, "doc_id", "text")
    facts = plan_facts(out)
    assert facts["exchanges"] == 0
    assert not facts["python_udf"] and not facts["map_in_pandas"]
    assert facts["whole_stage_codegen"]


# --- ks_drift (operators/profile.py) ----------------------------------------


def test_ks_drift_hand_cases_and_python_reference(spark):
    """Disjoint supports → D = 1 exactly; identical distributions →
    D = 0; a +shift translation must dominate a same-volume unshifted
    group; results match a pure-Python KS reference."""
    from logparser_llm_spark.operators.profile import ks_drift

    rows = (
        [("a", v) for v in (1, 1, 2, 3)]
        + [("b", v) for v in (1, 1, 2, 3)]      # identical law to a
        + [("c", v) for v in (11, 12, 12, 13)]  # disjoint support
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in ks_drift(df, "g", "v").collect()}
    assert got["c"]["ks_e6"] == 1_000_000 and got["c"]["at_value"] == 3

    # python reference on the same data
    def ks(g):
        from collections import Counter
        mine = Counter(v for gg, v in rows if gg == g)
        rest = Counter(v for gg, v in rows if gg != g)
        ng, nr = sum(mine.values()), sum(rest.values())
        best, at = -1, None
        cg = cr = 0
        for v in sorted(set(mine) | set(rest)):
            cg += mine.get(v, 0); cr += rest.get(v, 0)
            d = abs(cg * nr - cr * ng)
            if d > best:
                best, at = d, v
        return best * 1_000_000 // (ng * nr), at

    for g in ("a", "b", "c"):
        want_ks, want_at = ks(g)
        assert got[g]["ks_e6"] == want_ks, g
        if want_ks > 0:
            assert got[g]["at_value"] == want_at, g


def test_ks_drift_single_group_and_invariance(spark):
    from logparser_llm_spark.operators.profile import ks_drift

    one = spark.createDataFrame([("a", 1), ("a", 5)], "g string, v long")
    r = ks_drift(one, "g", "v").collect()
    assert len(r) == 1 and r[0]["ks_e6"] == 0 and r[0]["at_value"] is None

    rows = [(f"g{i % 5}", (i * 13) % 40 + (i % 5) * 3) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v long")
    a = sorted(map(tuple, ks_drift(df.repartition(1), "g", "v").collect()))
    b = sorted(map(tuple, ks_drift(df.repartition(13), "g", "v").collect()))
    assert a == b


def test_ks_drift_shift_dominates_in_query_staging(spark):
    """The registered length_drift staging (+250 IQR shift on src13)
    must rank src13 decisively top — the shape-vs-volume point."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["length_drift"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    top = max(rows, key=lambda r: r["ks_e6"])
    assert top["source"] == "src13"
    runner_up = sorted((r["ks_e6"] for r in rows), reverse=True)[1]
    assert top["ks_e6"] * 2 > 3 * runner_up  # >= 1.5x the noise floor


# --- vocab_growth (operators/profile.py) ------------------------------------


def test_vocab_growth_exact_hand_case_and_invariance(spark):
    """First-appearance is min(bucket) (order inside a bucket is
    irrelevant); NULL text contributes nothing but its doc counts;
    cumulative totals telescope; partition invariant."""
    from logparser_llm_spark.operators.profile import vocab_growth

    rows = [(0, "a b c"), (1, "a b"), (10, "c d e"), (11, None),
            (20, "e f"), (21, "A, b!")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(map(tuple,
                     vocab_growth(df, "id", "text",
                                  bucket_size=10).collect()))
    assert got == [(0, 2, 5, 3, 5, 3), (1, 2, 3, 2, 8, 5),
                   (2, 2, 4, 1, 12, 6)]
    g2 = sorted(map(tuple,
                    vocab_growth(df.repartition(5), "id", "text",
                                 bucket_size=10).collect()))
    assert g2 == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_size"):
        vocab_growth(df, "id", "text", bucket_size=0)


def test_vocab_growth_gibberish_band_bends_curve_up(spark):
    """Registered staging: the %20>=16 gibberish band injects all-new
    md5 types, so buckets covering it add far more new types per doc
    than natural-text buckets — the decidable inversion of Heaps
    flattening."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = sorted(
        map(tuple, QUERIES["vocab_growth"][0](
            spark, "/root/testdata/sf0.001").collect())
    )
    # every bucket holds 25 docs of which 5 are gibberish (2 unique
    # md5 words each => >= 10 new types guaranteed per bucket) while
    # natural text saturates: new types must never hit zero
    assert all(r[3] >= 8 for r in rows), rows[:5]
    # telescoping check
    cum = 0
    for r in rows:
        cum += r[3]
        assert r[5] == cum


# --- hill_tail_index (operators/profile.py) ----------------------------------


def test_hill_tail_index_geometric_hand_case_and_edges(spark):
    """Geometric sizes 2^(20-i) give a closed-form ln-ratio ladder;
    all-equal sizes are a degenerate tail (NULL alpha); zero/negative
    sizes are excluded from the order statistics; k validation."""
    import math

    import pytest as _pytest

    from logparser_llm_spark.operators.profile import hill_tail_index

    rows = [(f"h{i}", 1 << (20 - i)) for i in range(1, 16)]
    df = spark.createDataFrame(rows, "k string, s long")
    r = hill_tail_index(df, "k", "s", k=10).collect()[0]
    exp = sum(round(1e6 * math.log((1 << (20 - i)) / (1 << 9)))
              for i in range(1, 11))
    assert (r["k"], r["x_ref"], r["sum_ln_e6"]) == (10, 512, exp)
    assert r["alpha_e3"] == 10 * 10**9 // exp  # ~1/ln2 = 1.443
    eq = spark.createDataFrame([(f"h{i}", 7) for i in range(6)],
                               "k string, s long")
    assert hill_tail_index(eq, "k", "s", k=3).collect()[0]["alpha_e3"] \
        is None
    with _pytest.raises(ValueError, match="k must be"):
        hill_tail_index(df, "k", "s", k=0)


def test_hill_tail_index_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.profile import (
        hill_tail_index,
        hill_tail_index_sql,
    )

    rows = [(f"h{i}", ((i * 37) % 90 + 1) * (1 << (i % 9)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "k string, s long")
    got = sorted(map(tuple, hill_tail_index(df, "k", "s", k=12).collect()))
    con = duckdb.connect()
    con.execute("create table t (k varchar, s bigint)")
    con.executemany("insert into t values (?,?)", rows)
    want = sorted(map(tuple, con.execute(hill_tail_index_sql(
        rel="t", key_col="k", size_col="s", k=12)).fetchall()))
    assert got == want


# --- encoding_advisor (operators/profile.py) ---------------------------------


def test_encoding_advisor_rules_and_dense_guard(spark):
    """Long-run column → rle; low-NDV alternating column → dict (runs
    too short); all-unique → plain; NULL-heavy sparse column's NULL
    runs are runs; sparse ids raise via the woven dense-id assert
    (the standalone-assert-column form was pruned by Catalyst — found
    live, the second time; the weave is the regression test)."""
    import duckdb
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    import pytest as _pytest

    from logparser_llm_spark.operators.profile import (
        encoding_advisor,
        encoding_advisor_sql,
    )

    rows = [(i, "x" if i < 40 else "y", f"u{i}", i % 2)
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "id long, longrun string, uniq string, alt long")
    got = sorted(map(tuple, encoding_advisor(
        df, "id", ["longrun", "uniq", "alt"]).collect()))
    con = duckdb.connect()
    con.execute(
        "create table e (id bigint, longrun varchar, uniq varchar, "
        "alt bigint)")
    con.executemany("insert into e values (?,?,?,?)", rows)
    want = sorted(map(tuple, con.execute(encoding_advisor_sql(
        rel="e", id_col="id",
        cols=["longrun", "uniq", "alt"])).fetchall()))
    assert got == want
    d = {r[0]: r for r in got}
    assert d["longrun"][1:] == (60, 2, 2, 30_000, "rle")
    assert d["uniq"][5] == "plain"
    assert d["alt"][1:] == (60, 2, 60, 1_000, "dict")
    sparse = spark.createDataFrame([(0, "a"), (5, "b")],
                                   "id long, c string")
    with _pytest.raises(SparkRuntimeException, match="dense"):
        encoding_advisor(sparse, "id", ["c"]).collect()
    with _pytest.raises(ValueError, match="no columns"):
        encoding_advisor(df, "id", [])
