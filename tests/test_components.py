"""Connected components (dedup group formation).

Both algorithms carry the Kiveris-style LOCAL FINISH (r5): an edge list
under ``local_max_edges`` is solved by driver-side union-find instead of
O(rounds) tiny Spark jobs. ``local_max_edges=-1`` forces the distributed
loop; tests below run BOTH paths and assert they agree, so neither can
rot unnoticed.
"""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.components import (
    connected_components,
    dedup_representatives,
)

FORCE_DISTRIBUTED = {"local_max_edges": -1}


def _comp(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    return {
        r["node"]: r["component_id"] for r in connected_components(df, **kw).collect()
    }


def _both_paths(spark, pairs):
    """(local-finish result, distributed-loop result) for min-label."""
    return _comp(spark, pairs), _comp(spark, pairs, **FORCE_DISTRIBUTED)


def test_basic_components(spark):
    local, dist = _both_paths(spark, [(1, 2), (2, 3), (5, 6), (8, 8)])
    assert local == dist == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8}


def test_chain_converges(spark):
    # a 12-node chain needs multiple propagation rounds distributed
    local, dist = _both_paths(spark, [(i, i + 1) for i in range(12)])
    assert local == dist
    assert set(local.values()) == {0} and len(local) == 13


def test_partitioning_invariance(spark):
    pairs = [(i, (i * 7) % 40) for i in range(40)] + [(100, 101)]
    df1 = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    df2 = df1.repartition(13)
    for kw in ({}, FORCE_DISTRIBUTED):
        a = {r["node"]: r["component_id"] for r in connected_components(df1, **kw).collect()}
        b = {r["node"]: r["component_id"] for r in connected_components(df2, **kw).collect()}
        assert a == b


def test_representatives(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (9, 10)], "id_a bigint, id_b bigint")
    rows = {r["component_id"]: r["n_members"] for r in dedup_representatives(df).collect()}
    assert rows == {1: 3, 9: 2}


def test_non_convergence_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2, **FORCE_DISTRIBUTED)


def test_empty_graph_both_paths(spark):
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(empty).collect() == []
    assert connected_components(empty, **FORCE_DISTRIBUTED).collect() == []


# --- star contraction (adversarial-diameter fallback) ---------------------


def _star(spark, pairs, **kw):
    from logparser_llm_spark.operators.components import connected_components_star

    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    return {
        r["node"]: r["component_id"]
        for r in connected_components_star(df, **kw).collect()
    }


def test_star_basic_components(spark):
    # same contract as min-label: the self-pair node 8 IS labeled (itself)
    pairs = [(1, 2), (2, 3), (5, 6), (8, 8)]
    want = {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8}
    assert _star(spark, pairs) == want
    assert _star(spark, pairs, **FORCE_DISTRIBUTED) == want
    assert _comp(spark, pairs) == want


def test_star_long_chain_logarithmic_rounds(spark):
    """The point of star contraction: a 60-link chain (diameter 60)
    converges within 15 DISTRIBUTED rounds — min-label propagation
    without pointer doubling would need ~60."""
    got = _star(spark, [(i, i + 1) for i in range(60)], max_iter=15, **FORCE_DISTRIBUTED)
    assert set(got.values()) == {0} and len(got) == 61


def test_star_equals_min_label_on_random_graphs(spark):
    """Property: both algorithms and both execution paths produce
    identical labelings on seeded random graphs of varied shape."""
    import random

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 60), (3, 25, 25), (4, 60, 30)]:
        rng = random.Random(seed)
        # self-pairs kept deliberately: both algorithms must label the
        # node with itself when no other edge names it
        pairs = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ] + [(n_nodes + 7, n_nodes + 7)]
        results = [
            _comp(spark, pairs),
            _comp(spark, pairs, **FORCE_DISTRIBUTED),
            _star(spark, pairs),
            _star(spark, pairs, **FORCE_DISTRIBUTED),
        ]
        assert all(r == results[0] for r in results[1:]), f"seed={seed}"


def test_star_non_convergence_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        from logparser_llm_spark.operators.components import connected_components_star

        connected_components_star(df, max_iter=1, **FORCE_DISTRIBUTED)


def test_star_empty_and_partitioning_invariance(spark):
    from logparser_llm_spark.operators.components import connected_components_star

    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components_star(empty).collect() == []
    assert connected_components_star(empty, **FORCE_DISTRIBUTED).collect() == []

    pairs = [(i, (i * 7) % 40) for i in range(40)] + [(100, 101)]
    df1 = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    for kw in ({}, FORCE_DISTRIBUTED):
        a = {r["node"]: r["component_id"] for r in connected_components_star(df1, **kw).collect()}
        b = {
            r["node"]: r["component_id"]
            for r in connected_components_star(df1.repartition(13), **kw).collect()
        }
        assert a == b


def test_local_finish_frame_is_data_sized_not_core_sized(spark):
    """r6: the local-finish result frame must be sliced by data volume
    (~100k rows/slice), never one slice per core — a core-count-wide
    handful-of-rows frame makes every downstream stage over the
    components launch one task per core (measured 0.6-0.8 s stages in
    every components consumer at sf0.1)."""
    pairs = [(i, i + 1) for i in range(0, 100, 2)]
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    out = connected_components(df)  # 50 edges << local_max_edges
    assert out.rdd.getNumPartitions() == 1
    # and the labels themselves are still correct
    got = {r["node"]: r["component_id"] for r in out.collect()}
    assert got == {n: (n // 2) * 2 for n in range(100)}
