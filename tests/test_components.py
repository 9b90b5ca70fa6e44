"""Connected components (dedup group formation)."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.components import (
    connected_components,
    dedup_representatives,
)


def _comp(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    return {
        r["node"]: r["component_id"] for r in connected_components(df).collect()
    }


def test_basic_components(spark):
    got = _comp(spark, [(1, 2), (2, 3), (5, 6), (8, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8}


def test_chain_converges(spark):
    # a 12-node chain needs multiple propagation rounds
    got = _comp(spark, [(i, i + 1) for i in range(12)])
    assert set(got.values()) == {0} and len(got) == 13


def test_partitioning_invariance(spark):
    pairs = [(i, (i * 7) % 40) for i in range(40)] + [(100, 101)]
    df1 = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    df2 = df1.repartition(13)
    a = {r["node"]: r["component_id"] for r in connected_components(df1).collect()}
    b = {r["node"]: r["component_id"] for r in connected_components(df2).collect()}
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
        connected_components(df, max_iter=2)


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
    got = _star(spark, [(1, 2), (2, 3), (5, 6), (8, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8}
    assert got == _comp(spark, [(1, 2), (2, 3), (5, 6), (8, 8)])


def test_star_long_chain_logarithmic_rounds(spark):
    """The point of star contraction: a 60-link chain (diameter 60)
    converges within 15 rounds — min-label propagation would need ~60."""
    got = _star(spark, [(i, i + 1) for i in range(60)], max_iter=15)
    assert set(got.values()) == {0} and len(got) == 61


def test_star_equals_min_label_on_random_graphs(spark):
    """Property: both algorithms produce identical labelings on seeded
    random graphs of varied shape (sparse, dense, multi-component)."""
    import random

    from logparser_llm_spark.operators.components import connected_components_star

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 60), (3, 25, 25), (4, 60, 30)]:
        rng = random.Random(seed)
        # self-pairs kept deliberately: both algorithms must label the
        # node with itself when no other edge names it
        pairs = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ] + [(n_nodes + 7, n_nodes + 7)]
        df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
        want = {
            r["node"]: r["component_id"] for r in connected_components(df).collect()
        }
        got = {
            r["node"]: r["component_id"]
            for r in connected_components_star(df).collect()
        }
        assert got == want, f"seed={seed}: star != min-label"


def test_star_non_convergence_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        from logparser_llm_spark.operators.components import connected_components_star

        connected_components_star(df, max_iter=1)


def test_star_empty_and_partitioning_invariance(spark):
    from logparser_llm_spark.operators.components import connected_components_star

    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components_star(empty).collect() == []

    pairs = [(i, (i * 7) % 40) for i in range(40)] + [(100, 101)]
    df1 = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    a = {r["node"]: r["component_id"] for r in connected_components_star(df1).collect()}
    b = {
        r["node"]: r["component_id"]
        for r in connected_components_star(df1.repartition(13)).collect()
    }
    assert a == b
