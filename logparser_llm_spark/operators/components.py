"""Connected components over near-duplicate pair sets — dedup group
formation (the step after pair mining: every near-dup family collapses
to one canonical representative).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min of its label and
its neighbors' labels; fixpoint = components labeled by their minimum
member id. Convergence is O(graph diameter) rounds — near-dup families
are dense and shallow (a cluster of rewrites of one page), so a handful
of rounds suffices; ``max_iter`` bounds pathological chains.

Scale notes:
- each round is ONE shuffle (edge join + min-aggregate), map-side
  combinable; the label frame is (node, label) — two bigints — so even
  10^9 nodes iterate cheaply;
- lineage is truncated with ``localCheckpoint`` every round (an
  iterative plan otherwise grows a new join/agg layer per round and
  re-executes everything from the scan each action);
- convergence is detected by the monotone invariant Σlabels: labels only
  ever decrease, so an unchanged sum IS the fixpoint — one cheap action
  per round, no change-count join;
- for graphs with adversarial diameter (10^6-link chains) swap the
  per-round neighbor-min for the large-star/small-star contraction
  (Kiveris et al., "Connected Components in MapReduce"), which converges
  in O(log n) rounds on the same (node, label) frame shape. Near-dup
  dedup does not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id_a, id_b) undirected pair set → (node, component_id) where
    component_id = min node id reachable from ``node``. Nodes appearing
    in no pair are absent (callers union isolated ids if needed).

    Raises RuntimeError if the fixpoint is not reached within
    ``max_iter`` rounds (graph diameter > max_iter) — wrong-but-silent
    labels are never returned; raise ``max_iter`` or switch to the
    log-rounds star contraction for pathological chains."""
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = prev_sum is None  # empty graph is trivially converged
    for _ in range(max_iter):
        if converged:
            break
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:  # labels only decrease → fixpoint
            converged = True
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter) — raise max_iter"
        )
    return labels.select(F.col("node"), F.col("label").alias("component_id"))


def dedup_representatives(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Component summary: (component_id, n_members) with component_id =
    the canonical (min-id) representative of each near-dup family."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("n_members"))
