"""Distributed k-means: differential parity against a driver-side
reference of the same algorithm, tie/empty-cluster/validation
contracts, the zero-shuffle assignment plan, and quantization-grid
semantics. DuckDB parity for the registered ``kmeans`` query runs via
test_queries_oracle (the unrolled-CTE oracle recomputes everything)."""

import math

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.kmeans import (
    CSHIFT,
    QSCALE,
    centroid_md5,
    kmeans_fit,
    quantized_vec,
)


def _ref_kmeans(rows, k, iters):
    """Driver-side reference: same quantize/init/assign/update rules."""
    import hashlib

    xq = {
        i: [math.floor(v * QSCALE + 0.5) for v in vec] for i, vec in rows
    }
    seeds = sorted(xq, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [[CSHIFT * v for v in xq[i]] for i in seeds[:k]]

    def assign(c):
        out = {}
        for i, q in xq.items():
            ds = [sum((CSHIFT * a - b) ** 2 for a, b in zip(q, cj)) for cj in c]
            out[i] = (ds.index(min(ds)), min(ds))
        return out

    for _ in range(iters):
        a = assign(cents)
        new = list(cents)
        for j in range(k):
            members = [xq[i] for i, (cj, _) in a.items() if cj == j]
            if members:
                m = len(members)
                new[j] = [
                    (CSHIFT * sum(col)) // m for col in zip(*members)
                ]
        cents = new
    return assign(cents), cents


def _vecs(n, dim, spread):
    # two tight blobs + a stray, deterministic
    rows = []
    for i in range(n):
        base = 0.4 if i % 2 else -0.3
        rows.append(
            (i, [base + ((i * 31 + j * 17) % 13 - 6) * spread for j in range(dim)])
        )
    return rows


@pytest.fixture(scope="module")
def fitted(spark):
    rows = _vecs(60, 6, 0.004)
    df = spark.createDataFrame(rows, "vec_id bigint, vec array<double>")
    assigned, cents = kmeans_fit(df, "vec_id", "vec", k=3, dim=6, iters=3)
    return rows, {r["vec_id"]: (r["cluster"], r["dist"]) for r in assigned.collect()}, cents


def test_matches_driver_reference(fitted):
    rows, got, cents = fitted
    want_assign, want_cents = _ref_kmeans(rows, 3, 3)
    assert got == want_assign
    assert cents == want_cents


def test_blobs_separate(fitted):
    rows, got, _ = fitted
    even = {got[i][0] for i, _ in rows if i % 2 == 0}
    odd = {got[i][0] for i, _ in rows if i % 2 == 1}
    assert even.isdisjoint(odd)  # the two blobs never share a cluster


def test_tie_breaks_to_lowest_cluster_id(spark):
    """Two identical seed vectors -> two identical centroids; every
    point is equidistant to both and must land on the lower cid."""
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(6)], "vec_id bigint, vec array<double>"
    )
    assigned, cents = kmeans_fit(df, "vec_id", "vec", k=2, dim=2, iters=1)
    assert cents[0] == cents[1]
    assert {r["cluster"] for r in assigned.collect()} == {0}


def test_empty_cluster_keeps_centroid(spark):
    """k=3 over two tight blobs: at least one centroid ends up owning
    nothing after round 1 and must carry over unchanged."""
    rows = [(i, [0.1, 0.1]) for i in range(5)] + [(i, [-0.5, -0.5]) for i in range(5, 10)]
    df = spark.createDataFrame(rows, "vec_id bigint, vec array<double>")
    _, cents = kmeans_fit(df, "vec_id", "vec", k=3, dim=2, iters=3)
    want_assign, want_cents = _ref_kmeans(rows, 3, 3)
    assert cents == want_cents
    owners = {c for c, _ in want_assign.values()}
    assert len(owners) < 3  # the scenario actually exercises the carry


def test_quantization_grid(spark):
    df = spark.createDataFrame(
        [(1, [0.0015, -0.0015, 0.49999999, 0.0])], "id bigint, vec array<double>"
    )
    [r] = df.select(quantized_vec(F.col("vec")).alias("q")).collect()
    # floor(v*1000 + 0.5): 1.5->1 (floor 2.0? no: 0.0015*1000+0.5 = 2.0 -> 2)
    assert r["q"] == [2, -1, 500, 0]


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id bigint, vec array<double>")
    with pytest.raises(ValueError, match=">= 1"):
        kmeans_fit(df, "vec_id", "vec", k=0, dim=1)
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_fit(df, "vec_id", "vec", k=5, dim=1)
    df2 = spark.createDataFrame([(1, [1.0, 2.0]), (2, [0.0, 1.0])],
                                "vec_id bigint, vec array<double>")
    with pytest.raises(Exception, match="width != dim"):
        kmeans_fit(df2, "vec_id", "vec", k=2, dim=3)


def test_ragged_non_seed_vector_raises_cleanly(spark):
    """A mis-width vector that is NOT one of the k seeds must still hit
    the width contract (review r5), not a raw array-index crash."""
    rows = [(0, [1.0]), (1, [5.0, 6.0]), (2, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, vec array<double>")
    with pytest.raises(Exception, match="width != dim=2 for vec_id=0"):
        kmeans_fit(df, "vec_id", "vec", k=2, dim=2, iters=1)


def test_assignment_stage_never_shuffles(spark):
    """The per-iteration scale contract: the assignment output plan is
    scan + broadcast-literal map — no Exchange over the data (the only
    shuffles in a fit live in the k-row update aggregate)."""
    df = spark.createDataFrame(_vecs(40, 4, 0.004), "vec_id bigint, vec array<double>")
    assigned, _ = kmeans_fit(df, "vec_id", "vec", k=2, dim=4, iters=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_centroid_md5_is_str_of_ints():
    assert centroid_md5([1, -2, 3]) == centroid_md5([1.0, -2.0, 3.0])
