"""Link-graph analytics for web corpora: integer-arithmetic PageRank.

The webtext pipeline's canonical graph signal (page quality priors for
crawl scheduling and corpus filtering) is PageRank over the link graph.
The float formulation is NOT reproducible across engines or even across
partitionings — float addition is order-dependent, and a distributed
groupBy sums in nondeterministic order — so a "matches the oracle"
check would need tolerances and could hide real bugs. This module uses
a FIXED-POINT formulation instead: ranks are scaled int64, per-edge
contributions use integer floor division, and the per-node inflow is an
INTEGER sum (associative + commutative → identical under any partition
order, any engine). The result is bit-exact reproducible: Spark,
DuckDB, and a single-threaded loop all produce the same int64 per node.

Semantics (per iteration, damping d = damp_num/damp_den):

    contrib(u→v) = pr(u) * damp_num  div  (damp_den * outdeg(u))
    pr'(v)       = (damp_den − damp_num) * scale div damp_den
                   + Σ_{u→v} contrib(u→v)

Floor-division mass loss (≤ outdeg ulps per node per round) and
dangling-node leakage are accepted and documented — they are the same
in every engine, which is the point. Ranks stay O(scale·avg_indegree),
so with scale = 10⁹ the int64 sum is safe to ~10⁹-in-degree hubs; at
true web scale drop scale to 10⁶ or switch the inflow sum to
decimal(38,0) (Spark and DuckDB both support it exactly).

Scale story: out-degrees and edges are computed once, repartitioned by
src and persisted; each iteration is then one co-partitioned join plus
one integer groupBy-sum — and integer sums are map-side combinable, so
hub pages (huge in-degree) pre-aggregate inside each map task before
the shuffle: degree skew never concentrates on one reducer the way a
non-combinable aggregate would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

DEFAULT_SCALE = 10**9


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    nodes: DataFrame | None = None,
    iterations: int = 4,
    scale: int = DEFAULT_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """PageRank over ``edges`` → (node, pr) with pr a scaled int64
    (initial rank = ``scale`` per node). ``nodes`` defaults to the
    distinct endpoints of ``edges``; pass the full page table when
    isolated pages must appear in the output (they hold the base rank).

    Every arithmetic step is integer, so the output is bit-exact
    reproducible across engines and partitionings — see the module
    docstring for the exact per-iteration formula an oracle must
    mirror."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 < damp_num < damp_den:
        raise ValueError("need 0 < damp_num < damp_den")

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # one co-partitioned (src, dst, outdeg) frame reused every round
    ed = e.join(deg, "src").repartition(F.col("src")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)

    base = (damp_den - damp_num) * scale // damp_den
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("pr"))
    for _ in range(iterations):
        inflow = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(f"pr * {damp_num} div ({damp_den} * outdeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
            .cast("long")
            .alias("pr"),
        )
    return ranks


def pagerank_oracle_sql(
    node_source: str,
    node_col: str,
    edge_cte: str,
    *,
    iterations: int = 4,
    scale: int = DEFAULT_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """DuckDB CTE chain mirroring :func:`pagerank_integer` exactly
    (unrolled — one CTE per iteration). ``edge_cte`` must be a SELECT
    yielding (src, dst, outdeg); ``node_source``/``node_col`` name the
    node table. Kept next to the operator so the two formulations can't
    drift apart."""
    base = (damp_den - damp_num) * scale // damp_den
    parts = [
        f"edges as ({edge_cte})",
        f"r0 as (select {node_col} as node, cast({scale} as bigint) as pr "
        f"from {node_source})",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"r{i} as (\n"
            f"  select n.{node_col} as node,\n"
            f"         cast({base} + coalesce(sum(f.c), 0) as bigint) as pr\n"
            f"  from {node_source} n left join (\n"
            f"    select e.dst as node,\n"
            f"           r.pr * {damp_num} // ({damp_den} * e.outdeg) as c\n"
            f"    from edges e join r{i - 1} r on e.src = r.node) f\n"
            f"    on f.node = n.{node_col}\n"
            f"  group by n.{node_col}\n"
            f")"
        )
    return "with " + ",\n".join(parts) + f"\nselect node, pr from r{iterations}"
