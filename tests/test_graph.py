"""Integer PageRank: bit-exact parity with a single-threaded reference
loop, partition invariance (the property the integer formulation
exists to guarantee), dangling/isolated node semantics, contracts.
The sf0.01 DuckDB-oracle parity for the registered ``pagerank`` query
runs via test_queries_oracle."""

from collections import defaultdict

import pytest

from logparser_llm_spark.operators.graph import (
    pagerank_integer,
    pagerank_oracle_sql,
    triangle_counts,
    triangle_oracle_sql,
)

SCALE = 10**9


def ref_pagerank(edges, nodes, iterations, scale=SCALE, dn=85, dd=100):
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    pr = {v: scale for v in nodes}
    base = (dd - dn) * scale // dd
    for _ in range(iterations):
        inflow = defaultdict(int)
        for s, t in edges:
            inflow[t] += pr[s] * dn // (dd * outdeg[s])
        pr = {v: base + inflow.get(v, 0) for v in nodes}
    return pr


def _graph(n_nodes=60, seed=5):
    """Deterministic scraggly graph: hubs, chains, a dangling node, a
    self-loop, duplicate-free."""
    edges = []
    for u in range(n_nodes - 1):  # node n_nodes-1 stays dangling-ish
        for j in range(1 + (u * seed) % 4):
            edges.append((u, (u * 13 + 7 * j + seed) % n_nodes))
    edges.append((3, 3))  # self-loop
    nodes = list(range(n_nodes + 1))  # +1: isolated node, never linked
    return edges, nodes


def _run(spark, edges, nodes, iterations, partitions=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    if partitions:
        e = e.repartition(partitions)
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    out = pagerank_integer(e, nodes=nd, iterations=iterations)
    return {r["node"]: r["pr"] for r in out.collect()}


def test_matches_reference_loop_bit_exact(spark):
    edges, nodes = _graph()
    got = _run(spark, edges, nodes, iterations=4)
    assert got == ref_pagerank(edges, nodes, 4)


def test_partition_invariance(spark):
    """The whole point of the integer formulation: any partitioning of
    the edge frame yields the IDENTICAL int64 per node."""
    edges, nodes = _graph(n_nodes=40, seed=9)
    a = _run(spark, edges, nodes, iterations=3, partitions=1)
    b = _run(spark, edges, nodes, iterations=3, partitions=17)
    assert a == b


def test_isolated_and_dangling_nodes(spark):
    # 2 -> dangling (no out-edges): absorbs, never contributes;
    # 9 isolated: holds exactly the base rank after one iteration
    edges = [(0, 1), (1, 2), (0, 2)]
    nodes = [0, 1, 2, 9]
    got = _run(spark, edges, nodes, iterations=2)
    ref = ref_pagerank(edges, nodes, 2)
    assert got == ref
    assert got[9] == (100 - 85) * SCALE // 100


def test_default_nodes_are_edge_endpoints(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = pagerank_integer(e, iterations=1)
    assert {r["node"] for r in out.collect()} == {1, 2, 3}


def test_contracts(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_integer(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank_integer(e, damp_num=100, damp_den=100)


def test_oracle_sql_mirrors_reference(spark):
    """The generated DuckDB CTE chain must agree with the Python
    reference loop on an arbitrary closed-form graph — this is the
    drift gate between pagerank_oracle_sql and pagerank_integer."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "create table pages as select range as pid from range(30)"
    )
    edge_cte = """
        select p.pid as src,
               (p.pid * 11 + 5 * j.j + 2) % 30 as dst,
               1 + p.pid % 2 as outdeg
        from pages p, generate_series(0, 1) as j(j)
        where j.j <= p.pid % 2
    """
    sql = pagerank_oracle_sql("pages", "pid", edge_cte, iterations=3)
    got = dict(con.execute(sql).fetchall())
    edges = []
    for u in range(30):
        for j in range(1 + u % 2):
            edges.append((u, (u * 11 + 5 * j + 2) % 30))
    assert got == ref_pagerank(edges, list(range(30)), 3)


# ---------------------------------------------------------------- triangles


def ref_triangles(edges, nodes):
    """Single-threaded reference: canonicalize, then count triangles by
    brute-force adjacency intersection."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    seen = set()
    for a, b in und:
        for c in adj[a] & adj[b]:
            t = tuple(sorted((a, b, c)))
            if t not in seen:
                seen.add(t)
                for v in t:
                    tri[v] += 1
    return {v: (len(adj[v]), tri.get(v, 0)) for v in nodes}


def _run_tri(spark, edges, nodes, partitions=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    if partitions:
        e = e.repartition(partitions)
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    out = triangle_counts(e, nodes=nd)
    return {r["node"]: (r["degree"], r["triangles"]) for r in out.collect()}


def test_triangles_match_reference_on_scraggly_graph(spark):
    edges, nodes = _graph()
    assert _run_tri(spark, edges, nodes) == ref_triangles(edges, nodes)


def test_triangles_partition_invariance(spark):
    edges, nodes = _graph(n_nodes=40, seed=9)
    a = _run_tri(spark, edges, nodes, partitions=1)
    b = _run_tri(spark, edges, nodes, partitions=17)
    assert a == b


def test_triangles_k4(spark):
    # K4: every node sits in C(3,2) = 3 triangles, degree 3
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _run_tri(spark, edges, list(range(4)))
    assert got == {v: (3, 3) for v in range(4)}


def test_triangles_collapse_direction_duplicates_and_self_loops(spark):
    # (0,1) twice + reversed, a self-loop, and both orientations of the
    # closing edge: still exactly ONE triangle
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (0, 2), (1, 1)]
    got = _run_tri(spark, edges, [0, 1, 2, 7])
    assert got == {0: (2, 1), 1: (2, 1), 2: (2, 1), 7: (0, 0)}


def test_triangles_star_hub_plus_one_closing_edge(spark):
    # hub 0 linked to 1..20 (no triangles), then close (1, 2): the hub
    # participates in exactly that one triangle — the skew shape the
    # degree ordering exists for
    edges = [(0, v) for v in range(1, 21)] + [(1, 2)]
    got = _run_tri(spark, edges, list(range(21)))
    assert got[0] == (20, 1)
    assert got[1] == (2, 1) and got[2] == (2, 1)
    assert all(got[v] == (1, 0) for v in range(3, 21))


def test_triangle_oracle_sql_mirrors_reference(spark):
    """Drift gate: the generated naive-triple-join DuckDB oracle must
    agree with the Python reference on a closed-form graph."""
    import duckdb

    con = duckdb.connect()
    con.execute("create table pages as select range as pid from range(24)")
    edge_cte = """
        select p.pid as src, (p.pid * 5 + 3) % 24 as dst from pages p
        union all
        select p.pid as src, (p.pid + 1) % 24 as dst from pages p
        union all
        select p.pid as src, (p.pid + 2) % 24 as dst from pages p
    """
    sql = triangle_oracle_sql("pages", "pid", edge_cte)
    got = {n: (d, t) for n, d, t in con.execute(sql).fetchall()}
    edges = []
    for u in range(24):
        edges += [(u, (u * 5 + 3) % 24), (u, (u + 1) % 24), (u, (u + 2) % 24)]
    assert got == ref_triangles(edges, list(range(24)))
