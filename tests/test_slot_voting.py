"""Slot-voting pool generalization (VERDICT r3 item 2).

The per-row extractor wildcards only tokens that look variable in
isolation; ``generalize_pool`` adds the Drain-style CROSS-MEMBER vote
(evidence model of reference prefix_tree.py:241-279 / merger.py:179-207):
a token position varying across otherwise-identical pool patterns with
enough distinct values is a variable slot.
"""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.merging import generalize_pool

PATHS = ["/feed.xml", "/admin", "/checkout", "/health", "/login", "/index.html"]
USERS = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]


def _pool(patterns_counts):
    return [{"pattern": p, "count": c} for p, c in patterns_counts]


def test_word_slot_merges():
    pool = _pool([(f"User {u} logged in from <*> session <*>", 10) for u in USERS])
    out = generalize_pool(pool)
    assert len(out) == 1
    assert out[0]["pattern"] == "User <*> logged in from <*> session <*>"
    assert out[0]["count"] == 80
    assert sorted(out[0]["sources"]) == sorted(t["pattern"] for t in pool)


def test_two_way_discriminator_stays_split():
    """GET vs POST differ at one position with only TWO distinct values —
    a discriminator, not a slot; min_distinct=3 keeps them apart."""
    pool = _pool(
        [
            ("GET <*> HTTP/<NUM> returned <*> in <*> ms", 40),
            ("POST <*> HTTP/<NUM> returned <*> in <*> ms", 25),
        ]
    )
    out = generalize_pool(pool)
    assert sorted(t["pattern"] for t in out) == sorted(t["pattern"] for t in pool)


def test_component_with_discriminator_partitions_and_merges_within():
    """GET and POST families chain into ONE component through shared path
    tokens; the vote must partition on the discriminator position and
    still merge the path slot WITHIN each verb family."""
    pool = []
    for verb in ("GET", "POST"):
        pool.append({"pattern": f"{verb} <*> HTTP/<NUM> returned <*> in <*> ms", "count": 100})
        pool += [
            {"pattern": f"{verb} {p} HTTP/<NUM> returned <*> in <*> ms", "count": 50}
            for p in PATHS
        ]
    out = generalize_pool(pool)
    assert sorted(t["pattern"] for t in out) == [
        "GET <*> HTTP/<NUM> returned <*> in <*> ms",
        "POST <*> HTTP/<NUM> returned <*> in <*> ms",
    ]
    assert all(t["count"] == 400 for t in out)


def test_wildcard_counts_as_variability_evidence():
    """A position already wildcarded by one member merges even with only
    one other distinct value (the member declared the slot variable)."""
    pool = _pool(
        [
            ("Cache key <*> expired", 5),
            ("Cache key session expired", 2),
        ]
    )
    out = generalize_pool(pool)
    assert len(out) == 1
    assert out[0]["pattern"] == "Cache key <*> expired"


def test_all_wildcard_result_is_rejected():
    """Single-token patterns would merge to a bare '<*>' — refused: a
    match-anything template has no routing value."""
    pool = _pool([("alpha", 1), ("bravo", 1), ("delta", 1), ("gamma", 1)])
    out = generalize_pool(pool)
    assert sorted(t["pattern"] for t in out) == ["alpha", "bravo", "delta", "gamma"]


def test_multi_slot_cross_product_converges():
    pool = _pool(
        [
            (f"Job {w} owned by {u} finished", 1)
            for w in ("alpha", "bravo", "delta")
            for u in ("alice", "bob", "carol")
        ]
    )
    out = generalize_pool(pool)
    assert len(out) == 1
    assert out[0]["pattern"] == "Job <*> owned by <*> finished"
    assert out[0]["count"] == 9
    assert len(out[0]["sources"]) == 9


def test_min_distinct_knob():
    pool = _pool([("level ERROR reached", 3), ("level WARN reached", 2)])
    assert len(generalize_pool(pool, min_distinct=3)) == 2
    assert len(generalize_pool(pool, min_distinct=2)) == 1


def test_input_order_invariance():
    pool = []
    for verb in ("GET", "POST"):
        pool += [
            {"pattern": f"{verb} {p} HTTP/<NUM> returned <*> in <*> ms", "count": 1}
            for p in PATHS
        ]
    pool += [{"pattern": f"User {u} logged out after <*> minutes", "count": 1} for u in USERS]
    a = generalize_pool(list(pool))
    b = generalize_pool(list(reversed(pool)))
    key = lambda t: t["pattern"]
    assert sorted((t["pattern"], t["count"]) for t in a) == sorted(
        (t["pattern"], t["count"]) for t in b
    )


def test_different_lengths_never_mix():
    pool = _pool(
        [
            ("User alice logged out after <*> minutes", 1),
            ("User bob logged out after <*> minutes", 1),
            ("User carol logged out after <*> minutes", 1),
            ("User dave logged in from <*> session <*>", 1),
            ("User erin logged in from <*> session <*>", 1),
            ("User frank logged in from <*> session <*>", 1),
        ]
    )
    out = generalize_pool(pool)
    assert sorted(t["pattern"] for t in out) == [
        "User <*> logged in from <*> session <*>",
        "User <*> logged out after <*> minutes",
    ]


# ---- distributed pipeline with slot voting --------------------------------


@pytest.fixture()
def sv_cfg():
    from dataclasses import replace

    from logparser_llm_spark.config import DEFAULT_CONFIG

    return replace(
        DEFAULT_CONFIG,
        merging=replace(DEFAULT_CONFIG.merging, enable_slot_voting=True),
    )


def test_pipeline_slot_voting_partition_invariant(spark, sv_cfg):
    """The generalized pool and per-line assignment are byte-identical at
    any input partitioning (the distributed-determinism contract)."""
    from logparser_llm_spark.operators.cluster import assign_templates, discover_templates
    from logparser_llm_spark.sources.synth import generate_labeled_lines

    lines = generate_labeled_lines(spark, 300, seed=101)
    pools = []
    assigns = []
    for parts in (2, 13):
        df = lines.repartition(parts)
        pool = discover_templates(df, "text", sv_cfg)
        pools.append([(t["template_id"], t["pattern"]) for t in pool])
        assigns.append(
            sorted(
                (r["url"], r["line_no"], r["template_id"])
                for r in assign_templates(df, "text", pool, sv_cfg)
                .select("url", "line_no", "template_id")
                .collect()
            )
        )
    assert pools[0] == pools[1]
    assert assigns[0] == assigns[1]


def test_pipeline_slot_voting_groups_word_slots(spark, sv_cfg):
    """End-to-end: lines from the {user} bank template land in ONE
    template with slot voting, 8 without."""
    from logparser_llm_spark.config import DEFAULT_CONFIG
    from logparser_llm_spark.operators.cluster import assign_templates, discover_templates
    from logparser_llm_spark.sources.synth import generate_labeled_lines

    lines = generate_labeled_lines(spark, 600, seed=101).cache()
    try:
        login = lines.filter(F.col("gt_template").startswith("User <*> logged in"))

        def n_clusters(cfg):
            pool = discover_templates(lines, "text", cfg)
            out = assign_templates(lines, "text", pool, cfg)
            return (
                out.join(login.select("url", "line_no"), ["url", "line_no"], "left_semi")
                .select("template_id")
                .distinct()
                .count()
            )

        assert n_clusters(sv_cfg) == 1
        assert n_clusters(DEFAULT_CONFIG) > 1
    finally:
        lines.unpersist()


def test_sequential_oracle_final_ids_remap(spark, sv_cfg):
    """The oracle's post-parse re-pointing (reference merge semantics,
    template_pool.py:160-163) groups the over-split ids the same way."""
    from logparser_llm_spark.reference_oracle import SequentialParser

    lines = [f"User {u} logged in from 10.0.0.{i} session abcdef{i:02d}" for i, u in
             enumerate(["alice", "bob", "carol", "dave"] * 3)]
    p = SequentialParser(sv_cfg)
    raw_ids = [p.parse(ln) for ln in lines]
    final_ids, id_to_pattern = p.final_ids(raw_ids)
    assert len(set(raw_ids)) > 1
    assert len(set(final_ids)) == 1
    # the user slot is wildcarded (the ip/hex slots were already variable
    # in the cleaner's own rendering)
    assert id_to_pattern[final_ids[0]].startswith("User <*> logged in from")


def test_slot_voting_sf001_per_row_parity_with_sequential_oracle(spark, sv_cfg):
    """VERDICT r4 item 1(a): the fixture-scale ``final_ids`` parity test
    promoted to DRIVER scale — the distributed slot-voted pipeline over
    the actual /root/testdata/sf0.01 events parquet agrees PER ROW with
    the sequential reference-flow oracle's post-parse re-pointing
    (reference merge semantics, template_pool.py:160-163). Comparison is
    in pattern space (each side's ids mapped through its own pool), the
    canonical id mapping VERDICT asked for."""
    from logparser_llm_spark.operators.cluster import assign_templates, discover_templates
    from logparser_llm_spark.plans.queries import event_log_line_col
    from logparser_llm_spark.reference_oracle import SequentialParser

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_id", event_log_line_col().alias("text"))
    )
    pool = discover_templates(ev, "text", sv_cfg)
    id2pat = {t["template_id"]: t["pattern"] for t in pool}
    spark_pat = {
        r["event_id"]: id2pat.get(r["template_id"], "unknown")
        for r in assign_templates(ev, "text", pool, sv_cfg)
        .select("event_id", "template_id")
        .collect()
    }

    rows = sorted(ev.collect(), key=lambda r: r["event_id"])
    p = SequentialParser(sv_cfg)
    raw = [p.parse(r["text"]) for r in rows]
    final, oid2pat = p.final_ids(raw)
    oracle_pat = {r["event_id"]: oid2pat.get(t, "unknown") for r, t in zip(rows, final)}

    assert len(spark_pat) == len(oracle_pat) == 10_000
    assert spark_pat == oracle_pat
    # the documented outcome on this corpus: the vote collapses the pool
    # to one template (event_type is a 5-distinct word slot)
    assert set(spark_pat.values()) == {"<*> value <*> from user <*>"}


def test_streaming_parser_composes_with_slot_voting(spark, sv_cfg, tmp_path):
    """Slot voting flows through the streaming micro-batch path
    unchanged: per-batch discovery generalizes, and identical generalized
    patterns merge across batches by the exact-pattern rule, so the
    stable pool converges to the voted templates."""
    from logparser_llm_spark.sources.synth import generate_labeled_lines
    from logparser_llm_spark.streaming.incremental import StreamingParser

    out = str(tmp_path / "out")
    parser = StreamingParser(out, cfg=sv_cfg)
    lines = generate_labeled_lines(spark, 400, seed=101).cache()
    try:
        half1 = lines.filter(F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8"))
        half2 = lines.filter(~F.col("url").substr(-1, 1).isin("0", "2", "4", "6", "8"))
        parser.process_batch(half1.select("text"), 0)
        n_after_1 = len(parser.pool)
        parser.process_batch(half2.select("text"), 1)
        patterns = [t["pattern"] for t in parser.pool]
        # the user-slot template exists in generalized form, and no
        # per-user split pattern survives in the stable pool
        assert any(p.startswith("User <*> logged in from") for p in patterns)
        assert not any(
            p.startswith("User alice") or p.startswith("User bob") for p in patterns
        )
        # batch 2's re-discovered generalized patterns merged by exact
        # pattern instead of growing the pool per batch
        assert len(parser.pool) <= n_after_1 + 3
    finally:
        lines.unpersist()
