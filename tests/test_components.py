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
