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


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Exact per-node triangle counts over the UNDIRECTED graph induced
    by ``edges`` → (node, degree, triangles). Direction, duplicate
    edges and self-loops are collapsed/dropped first, so (u,v) and
    (v,u) are one edge.

    Scale story — degree-ordered node-iterator (Latapy's
    compact-forward / the Suri–Vassilvitskii MapReduce shape): each
    undirected edge is oriented from the LOWER node to the HIGHER node
    in the total order (degree, node), and wedges are generated only at
    an edge pair's shared lower-ordered endpoint. That bounds total
    wedge work by O(m^1.5) regardless of degree skew — a celebrity page
    with in-degree 10^8 is ordered last, so it is never a wedge apex
    and its edges fan out from their OTHER endpoint (each of which has
    at most a handful of higher-ordered neighbors). The naive
    neighbor-pair join would square the hub degree on one reducer; this
    one never does. Every triangle {x,y,z} (x<y<z in order) is counted
    exactly once: wedge at x over (y,z), closed by the oriented edge
    y→z. Plain equi-joins + one integer groupBy count (map-side
    combinable) — no UDF, no window, fully Catalyst-visible.

    ``nodes`` defaults to the distinct edge endpoints; pass the page
    table to include isolated pages (degree 0, triangles 0).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    lo_first = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    # oriented edge lo→hi in (degree, node) order; hd = degree(hi) so the
    # wedge join can compare (degree, node) tuples without re-joining deg
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("hd"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    x = o.select("lo", F.col("hi").alias("h1"), F.col("hd").alias("hd1"))
    y = o.select("lo", F.col("hi").alias("h2"), F.col("hd").alias("hd2"))
    wedges = x.join(y, "lo").where(
        F.struct(F.col("hd1"), F.col("h1")) < F.struct(F.col("hd2"), F.col("h2"))
    )
    # the closing edge (h1, h2) is oriented h1→h2 by construction
    tri = wedges.join(
        o.select(F.col("lo").alias("h1"), F.col("hi").alias("h2")), ["h1", "h2"]
    ).select(F.col("lo").alias("n1"), F.col("h1").alias("n2"), F.col("h2").alias("n3"))
    per_node = (
        tri.select(F.col("n1").alias("node"))
        .unionAll(tri.select(F.col("n2").alias("node")))
        .unionAll(tri.select(F.col("n3").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    if nodes is None:
        base = deg.select("node")
    else:
        base = nodes.select(F.col(nodes.columns[0]).alias("node"))
    return (
        base.join(deg, "node", "left")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        )
    )


def triangle_oracle_sql(node_source: str, node_col: str, edge_cte: str) -> str:
    """DuckDB mirror of :func:`triangle_counts` using the NAIVE
    id-ordered triple join (a<b<c on node ids) — a deliberately
    INDEPENDENT algebra: the Spark side orders by (degree, node) and
    builds wedges, so agreement validates the orientation trick rather
    than restating it. ``edge_cte`` must yield (src, dst)."""
    return f"""
    with raw as ({edge_cte}),
    und as (
      select distinct least(src, dst) as a, greatest(src, dst) as b
      from raw where src <> dst
    ),
    deg as (
      select node, count(*) as degree from (
        select a as node from und union all select b from und
      ) group by node
    ),
    tri as (
      select e1.a as x, e1.b as y, e2.b as z
      from und e1
      join und e2 on e2.a = e1.b
      join und e3 on e3.a = e1.a and e3.b = e2.b
    ),
    cnt as (
      select node, count(*) as triangles from (
        select x as node from tri
        union all select y from tri
        union all select z from tri
      ) group by node
    )
    select n.{node_col} as node,
           cast(coalesce(d.degree, 0) as bigint) as degree,
           cast(coalesce(c.triangles, 0) as bigint) as triangles
    from {node_source} n
    left join deg d on d.node = n.{node_col}
    left join cnt c on c.node = n.{node_col}
    """


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    nodes: DataFrame | None = None,
    max_hops: int = 64,
) -> DataFrame:
    """Resolve redirect chains over a FUNCTIONAL graph (each ``src`` has
    exactly one ``dst``) → (node, final, hops, resolved) per node: the
    terminal target reached within ``max_hops`` hops, or
    resolved = false (final/hops NULL) when the chase exceeds the budget
    — which covers both cycles and over-long chains, exactly the way an
    HTTP client reports "maximum redirects followed" without
    distinguishing the two. A node with no outgoing edge resolves to
    itself with hops = 0.

    Scale story — pointer doubling: the state frame (node, cur, hops,
    done) composes with ITSELF each round (cur' = state[cur].cur,
    hops' = hops + state[cur].hops), so the resolved horizon doubles per
    round and the loop runs ceil(log2(max_hops)) rounds TOTAL —
    independent of corpus size (6 rounds for the default budget of 64,
    whether the frontier holds 10^4 or 10^11 urls). Each round is one
    equi-join + a union with the done rows; lineage is truncated with a
    lazy localCheckpoint per round (the components.py convention) so the
    self-join's plan tree cannot double every round. The linear chase an
    oracle runs (one hop per recursion step) is a deliberately
    INDEPENDENT algebra — see :func:`redirect_oracle_sql`.

    The one-outgoing-edge contract is enforced loudly: a duplicate src
    raises at execution time (guard woven into the kept dst expression —
    a dropped-column assert would be pruned away, the bigram_pmi
    lesson). ``nodes`` defaults to the distinct edge endpoints; pass the
    url universe to include never-redirecting pages (hops 0).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    m = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_c"), F.max("dst").alias("_dst"))
        .select(
            "src",
            F.when(
                F.assert_true(
                    F.col("_c") == 1,
                    F.concat(
                        F.lit("resolve_redirects: src has multiple outgoing "
                              "edges (functional-graph contract): "),
                        F.col("src").cast("string"),
                    ),
                ).isNull(),
                F.col("_dst"),
            ).alias("dst"),
        )
    )
    if nodes is None:
        universe = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        universe = nodes.select(F.col(nodes.columns[0]).alias("node"))
    # the chase table must contain every endpoint so a not-done row's
    # composition partner always exists; output is filtered to the
    # caller's universe at the end
    chase_nodes = (
        universe.select("node")
        .union(m.select(F.col("src").alias("node")))
        .union(m.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_edge = m.select(F.col("src").alias("node"), F.col("dst").alias("_nxt"))
    is_src = m.select(F.col("src").alias("_t"), F.lit(True).alias("_t_has"))
    state = (
        chase_nodes.join(out_edge, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("_nxt"), F.col("node")).alias("cur"),
            F.when(F.col("_nxt").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("hops"),
        )
        .join(is_src, F.col("cur") == F.col("_t"), "left")
        .select(
            "node", "cur", "hops", F.col("_t_has").isNull().alias("done")
        )
        .localCheckpoint(eager=False)
    )
    rounds = max(0, (max_hops - 1).bit_length())  # ceil(log2(max_hops))
    for _ in range(rounds):
        s2 = state.select(
            F.col("node").alias("_jn"),
            F.col("cur").alias("_jc"),
            F.col("hops").alias("_jh"),
            F.col("done").alias("_jd"),
        )
        active = (
            state.where(~F.col("done"))
            .join(s2, F.col("cur") == F.col("_jn"))
            .select(
                "node",
                F.col("_jc").alias("cur"),
                (F.col("hops") + F.col("_jh")).alias("hops"),
                F.col("_jd").alias("done"),
            )
        )
        state = (
            state.where(F.col("done"))
            .unionByName(active)
            .localCheckpoint(eager=False)
        )
    resolved = F.col("done") & (F.col("hops") <= max_hops)
    return universe.join(state, "node").select(
        "node",
        F.when(resolved, F.col("cur")).alias("final"),
        F.when(resolved, F.col("hops")).cast("long").alias("hops"),
        resolved.alias("resolved"),
    )


def redirect_oracle_sql(
    node_source: str,
    node_col: str,
    edge_cte: str,
    *,
    max_hops: int = 64,
) -> str:
    """DuckDB mirror of :func:`resolve_redirects` as a recursive CTE
    LINEAR chase (one hop per recursion step, bounded at ``max_hops``) —
    a deliberately independent algebra: the Spark side doubles the
    horizon per round, so agreement validates the composition arithmetic
    rather than restating it. ``edge_cte`` must yield (src, dst) with
    unique srcs."""
    return f"""
    with recursive edges as ({edge_cte}),
    chase as (
      select n.{node_col} as node, n.{node_col} as cur, 0 as hops
      from {node_source} n
      union all
      select c.node, e.dst, c.hops + 1
      from chase c join edges e on e.src = c.cur
      where c.hops < {max_hops}
    ),
    term as (
      select c.node, c.cur as final, c.hops
      from chase c
      where not exists (select 1 from edges e where e.src = c.cur)
    )
    select n.{node_col} as node,
           t.final as final,
           cast(t.hops as bigint) as hops,
           t.node is not null as resolved
    from {node_source} n left join term t on t.node = n.{node_col}
    """


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
