"""Metrics formula parity vs the actual reference metrics module, plus the
distributed variants."""

import random

import pytest

from logparser_llm_spark.metrics import (
    adjusted_rand_index,
    adjusted_rand_index_df,
    cluster_f1,
    grouping_accuracy,
    grouping_accuracy_df,
    parsing_accuracy,
    template_accuracy,
)

from .ref_loader import ref_metrics

REF = ref_metrics().ParsingMetrics


def _random_labels(seed: int, n: int, k: int) -> list[str]:
    rng = random.Random(seed)
    return [f"c{rng.randint(0, k)}" for _ in range(n)]


@pytest.mark.parametrize("seed", [1, 5, 9])
def test_formula_parity_with_reference(seed):
    pred = _random_labels(seed, 200, 8)
    truth = _random_labels(seed + 1, 200, 6)
    assert grouping_accuracy(pred, truth) == REF.grouping_accuracy(pred, truth)
    assert cluster_f1(pred, truth) == REF.f1_score(pred, truth)
    assert adjusted_rand_index(pred, truth) == pytest.approx(
        REF.adjusted_rand_index(pred, truth)
    )
    t1 = {f"t{i}": f"User  <*> logged   in {i}" for i in range(5)}
    t2 = {f"t{i}": f"User <*> logged in {i}" for i in range(5)}
    assert template_accuracy(t1, t2) == REF.template_accuracy(t1, t2) == 1.0
    assert parsing_accuracy(list(t1.values()), list(t2.values())) == REF.parsing_accuracy(
        list(t1.values()), list(t2.values())
    )


def test_perfect_scores():
    labels = ["a", "a", "b", "c", "c", "c"]
    relabeled = ["x", "x", "y", "z", "z", "z"]  # same clustering, new names
    f1, p, r = cluster_f1(labels, relabeled)
    assert (f1, p, r) == (1.0, 1.0, 1.0)
    assert adjusted_rand_index(labels, relabeled) == pytest.approx(1.0)
    assert grouping_accuracy(labels, labels) == 1.0


def test_distributed_variants_match(spark):
    pred = _random_labels(3, 500, 10)
    truth = _random_labels(4, 500, 7)
    df = spark.createDataFrame(list(zip(pred, truth)), "pred string, truth string")
    assert grouping_accuracy_df(df, "pred", "truth") == pytest.approx(
        grouping_accuracy(pred, truth)
    )
    assert adjusted_rand_index_df(df, "pred", "truth") == pytest.approx(
        adjusted_rand_index(pred, truth)
    )
