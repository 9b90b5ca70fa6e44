"""Ninth-arc operators: winnowing fingerprints (MOSS), association-rule
pair mining, and exact-integer group trend slopes — differential vs the
module Python references, validation + woven-guard firing, and
both-scale non-degeneracy pins (DuckDB side; cross-engine parity runs
in test_queries_oracle.py)."""

import duckdb
import pytest

from logparser_llm_spark.operators.assoc import (
    assoc_pairs,
    assoc_pairs_py,
)
from logparser_llm_spark.operators.trend import (
    group_trend,
    group_trend_py,
)
from logparser_llm_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
    winnow_py,
)

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    return con


# --- winnowing -----------------------------------------------------------

WTEXTS = {
    1: "the quick brown fox jumps over the lazy dog repeatedly today",
    2: "a quick brown fox jumps over the lazy dog yesterday evening!!",
    3: "completely different content with nothing shared at all here",
    4: "short",  # < k + w - 1 → no full window → no fingerprints
}


def _wdf(spark, texts=WTEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    )


def test_winnow_fingerprints_match_python_reference(spark):
    got = {
        (r["id"], r["fp_h"], r["fp_pos"])
        for r in winnow_fingerprints(_wdf(spark), "doc_id", "text", k=8, w=4).collect()
    }
    ref = {
        (i, h, p)
        for i, t in WTEXTS.items()
        for h, p in winnow_py(t, k=8, w=4)
    }
    assert got == ref
    assert not any(i == 4 for i, _, _ in got)  # too-short doc → none


def test_winnow_guarantee_and_disjoint_docs(spark):
    """The paper's guarantee: a shared substring of length ≥ w + k − 1
    forces ≥1 shared selected fingerprint; docs sharing no k-gram share
    nothing."""
    k, w = 8, 4
    shared = "XYZQWERTYUIOPASDFGH"  # len 19 ≥ w + k - 1 = 11
    texts = {
        10: "aaaa bbbb " + shared + " cccc dddd eeee ffff",
        11: "1111 2222 3333 " + shared + " 4444 5555",
        12: "zzzzzzzz yyyyyyyy xxxxxxxx wwwwwwww vvvv",
    }
    rows = winnow_pairs(
        _wdf(spark, texts), "doc_id", "text",
        k=k, w=w, min_shared=1, max_doc_freq=3,
    ).collect()
    pairs = {(r["doc1"], r["doc2"]) for r in rows}
    assert (10, 11) in pairs
    assert all(12 not in p for p in pairs)


def test_winnow_validation_and_poscap_guard(spark):
    df = _wdf(spark)
    with pytest.raises(ValueError, match="k must be"):
        winnow_fingerprints(df, "doc_id", "text", k=1)
    with pytest.raises(ValueError, match="w must be"):
        winnow_fingerprints(df, "doc_id", "text", w=0)
    with pytest.raises(ValueError, match="poscap"):
        winnow_fingerprints(df, "doc_id", "text", poscap=1)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_pairs(df, "doc_id", "text", min_shared=0)
    with pytest.raises(ValueError, match="max_doc_freq"):
        winnow_pairs(df, "doc_id", "text", max_doc_freq=1)
    with pytest.raises(ValueError, match="topk"):
        winnow_pairs(df, "doc_id", "text", topk=0)
    # the poscap guard is WOVEN into the kept packed key — it must fire
    with pytest.raises(Exception, match="poscap k-grams"):
        winnow_fingerprints(
            df, "doc_id", "text", k=2, w=2, poscap=8
        ).collect()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_winnow_dups_non_degenerate_both_scales(sf_dir):
    from logparser_llm_spark.plans.queries import q_winnow_dups_sql

    rows = _duck(sf_dir).execute(q_winnow_dups_sql("")).fetchall()
    assert len(rows) == 100  # hits topk at both scales
    assert all(d1 < d2 and s >= 2 for d1, d2, s in rows)
    assert max(s for _, _, s in rows) >= 10  # real shared passages exist


# --- association rules ---------------------------------------------------

BASKETS = [
    ["view", "click", "error", "retry"],
    ["view", "click"],
    ["error", "retry"],
    ["view", "error", "retry"],
    ["click", "buy"],
    ["view", "click", "buy"],
    ["error", "retry", "view"],
    ["view"],
]


def _adf(spark, baskets=BASKETS):
    rows = [
        (b, it) for b, items in enumerate(baskets) for it in items
    ]
    return spark.createDataFrame(rows, "basket bigint, item string")


def test_assoc_pairs_match_python_reference(spark):
    got = [
        tuple(r)
        for r in assoc_pairs(
            _adf(spark), ["basket"], "item", min_support=2, k=20
        ).collect()
    ]
    assert got == assoc_pairs_py(BASKETS, min_support=2, k=20)
    # error↔retry is a perfect rule in the constructed corpus: both
    # confidences exactly 1000 permille, lift = 4·8e6/(4·4) = 2e6
    er = next(r for r in got if r[:2] == ("error", "retry"))
    assert er[5] == 1000 and er[6] == 1000 and er[7] == 2_000_000
    # ties at the top rank by (item_a, item_b) lexicographically
    assert got[0][:2] == ("buy", "click") and got[0][7] == 2_000_000


def test_assoc_null_items_dropped_and_in_basket_dups_deduped(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, None), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    out = assoc_pairs(df, ["basket"], "item", min_support=1, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["pair_n"]) == ("a", "b", 2)
    assert r["a_n"] == 2 and r["b_n"] == 2  # dup (1,'a') counted once


def test_assoc_validation_and_guards(spark):
    df = _adf(spark)
    with pytest.raises(ValueError, match="min_support"):
        assoc_pairs(df, ["basket"], "item", min_support=0)
    with pytest.raises(ValueError, match="k must be"):
        assoc_pairs(df, ["basket"], "item", k=0)
    with pytest.raises(ValueError, match="nb_max"):
        assoc_pairs(df, ["basket"], "item", nb_max=0)
    with pytest.raises(ValueError, match="max_items_per_basket"):
        assoc_pairs(df, ["basket"], "item", max_items_per_basket=1)
    # both woven guards must actually fire at execution
    with pytest.raises(Exception, match="lift headroom"):
        assoc_pairs(df, ["basket"], "item", min_support=1, nb_max=2).collect()
    with pytest.raises(Exception, match="max_items_per_basket"):
        assoc_pairs(
            df, ["basket"], "item", min_support=1, max_items_per_basket=2
        ).collect()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_assoc_rules_non_degenerate_both_scales(sf_dir):
    from logparser_llm_spark.plans.queries import q_assoc_rules_sql

    rows = _duck(sf_dir).execute(q_assoc_rules_sql("")).fetchall()
    assert len(rows) == 10  # all C(5,2) type pairs clear min_support
    for item_a, item_b, pair_n, a_n, b_n, cab, cba, lift in rows:
        assert item_a < item_b
        assert 0 < cab <= 1000 and 0 < cba <= 1000
        assert pair_n <= min(a_n, b_n)
        assert lift > 0


# --- trend slopes --------------------------------------------------------

TPTS = {
    "up": [(100, 5), (101, 7), (102, 9), (104, 14)],
    "down": [(10, 100), (11, 80), (12, 61), (13, 38)],
    "flat": [(7, 4), (8, 4), (9, 4)],
    "one_x": [(5, 9), (5, 11)],  # den = 0 → NULL slope, row kept
}


def _tdf(spark, pts=TPTS):
    rows = [(g, x, y) for g, p in pts.items() for x, y in p]
    return spark.createDataFrame(rows, "g string, x bigint, y bigint")


def test_group_trend_matches_python_reference(spark):
    got = {
        r["g"]: (r["n"], r["slope_num"], r["slope_den"], r["slope_e6"])
        for r in group_trend(_tdf(spark), ["g"], "x", "y").collect()
    }
    assert got == group_trend_py(TPTS)
    assert got["down"][3] < 0 < got["up"][3]  # sign-safe floor both ways
    assert got["flat"][3] == 0
    assert got["one_x"][2] == 0 and got["one_x"][3] is None


def test_group_trend_negative_floor_is_mathematical(spark):
    # num = -1, den = 2 → floor(-1e6/2) = -500000 on every engine
    pts = {"t": [(0, 1), (1, 1), (2, 0)]}
    r = group_trend(_tdf(spark, pts), ["g"], "x", "y").collect()[0]
    assert (r["slope_num"], r["slope_den"]) == (-3, 6)
    assert r["slope_e6"] == (-3 * 1_000_000) // 6 == -500_000


def test_group_trend_validation_and_guard(spark):
    df = _tdf(spark)
    with pytest.raises(ValueError, match="group_cols"):
        group_trend(df, [], "x", "y")
    dbl = spark.createDataFrame([("a", 1.0, 2)], "g string, x double, y bigint")
    with pytest.raises(ValueError, match="integer-typed"):
        group_trend(dbl, ["g"], "x", "y")
    with pytest.raises(ValueError, match="num_abs_max"):
        group_trend(df, ["g"], "x", "y", num_abs_max=0)
    with pytest.raises(Exception, match="1e6 headroom"):
        group_trend(df, ["g"], "x", "y", num_abs_max=1).collect()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_trend_slopes_non_degenerate_both_scales(sf_dir):
    from logparser_llm_spark.plans.queries import q_trend_slopes_sql

    rows = _duck(sf_dir).execute(q_trend_slopes_sql("")).fetchall()
    assert len(rows) == 5  # one row per event type
    slopes = [r[4] for r in rows]
    assert all(r[3] > 0 for r in rows)  # multi-day span everywhere
    assert any(s > 0 for s in slopes) and any(s < 0 for s in slopes)
