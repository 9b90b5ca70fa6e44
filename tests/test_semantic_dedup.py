"""SemDeDup (operators/dedup.py:semantic_dedup): keep-first verdicts,
a full local differential against a numpy reference on the planted-dup
sf corpus, and the validation contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.dedup import semantic_dedup

SF = "/root/testdata/sf0.01"


def test_keep_first_semantics_exact_copies(spark):
    """Identical vectors quantize identically, so they NECESSARILY share
    a cell whatever the seeding — the lowest id survives, every other
    copy is flagged; orthogonal/diagonal outsiders stay clean at 0.95."""
    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]),
        (4, [0.0, 1.0]), (5, [0.0, 1.0]),
        (6, [0.7, 0.7]),
    ]
    df = spark.createDataFrame(rows, "id bigint, v array<double>")
    out = semantic_dedup(df, "id", "v", dim=2, k=2, threshold=0.95, iters=2)
    flags = {r["id"]: r["is_dup"] for r in out.collect()}
    assert flags == {1: False, 2: True, 3: True, 4: False, 5: True, 6: False}
    spark.catalog.clearCache()


def test_matches_local_reference_on_planted_corpus(spark):
    """Full differential at sf0.01: given the operator's own cell
    assignment, the is_dup verdict must equal the keep-first rule
    recomputed in numpy (e6-quantized cosine, lower-id-wins) — and the
    planted ≈0.99 dups must make the drop set non-trivial."""
    from logparser_llm_spark.plans.queries import (
        EMB_DIM,
        SEM_ITERS,
        SEM_K,
        SEM_TAU,
        embeddings_with_planted_dups,
    )

    allv = embeddings_with_planted_dups(spark, SF)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in allv.collect()
    }
    out = semantic_dedup(
        allv, "vec_id", "embedding",
        dim=EMB_DIM, k=SEM_K, threshold=SEM_TAU, iters=SEM_ITERS,
    ).collect()
    tau_e6 = int(round(SEM_TAU * 1_000_000))
    by_cell: dict[int, list[int]] = {}
    for r in out:
        by_cell.setdefault(r["cluster"], []).append(r["vec_id"])
    expected = {}
    for members in by_cell.values():
        members.sort()
        for j, idj in enumerate(members):
            dup = False
            vj = vecs[idj]
            nj = np.linalg.norm(vj)
            for idi in members[:j]:
                vi = vecs[idi]
                denom = np.linalg.norm(vi) * nj
                cos = float(vi @ vj / denom) if denom > 0 else 0.0
                if int(np.round(cos * 1_000_000)) >= tau_e6:
                    dup = True
                    break
            expected[idj] = dup
    got = {r["vec_id"]: r["is_dup"] for r in out}
    assert got == expected
    assert sum(got.values()) > 0, "no dups flagged — planted corpus broken?"
    spark.catalog.clearCache()


def test_assignment_join_is_cached(spark):
    """The (id, vec, cluster) frame has three consumers — the plan must
    read the cache, not recompute the assignment join per consumer."""
    from logparser_llm_spark.plans.inspect import physical_plan
    from logparser_llm_spark.plans.queries import QUERIES

    df = QUERIES["semantic_dedup"][0](spark, SF)
    assert "InMemoryTableScan" in physical_plan(df)
    spark.catalog.clearCache()


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "id bigint, v array<double>")
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, "id", "v", dim=1, k=1, threshold=1.5)
    bad = spark.createDataFrame([(1, [1.0])], "cluster bigint, v array<double>")
    with pytest.raises(ValueError, match="reserved"):
        semantic_dedup(bad, "cluster", "v", dim=1, k=1)
    from logparser_llm_spark.operators.dedup import semantic_dedup_sql

    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup_sql("t", "id", "v", dim=1, k=1, threshold=0.0)
