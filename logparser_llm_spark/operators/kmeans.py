"""Distributed Lloyd k-means over an embedding column — the corpus
clustering / IVF-centroid-training step of an embedding-heavy data
pipeline (the same iterate shape MLlib's KMeans runs: broadcast the k
centroids, one map for assignment, one partially-aggregable groupBy for
the update, k·dim numbers back to the driver per round).

Scale shape per iteration: assignment is scan + broadcast-literal
argmin (ZERO shuffle over the data); the update shuffles exactly
k·(dim+1) aggregated values (map-side combine does the heavy lifting);
the driver step is O(k·dim). Nothing grows with corpus size except the
one map pass.

Cross-engine determinism — the reason this is oracle-able at all: all
assignment arithmetic is INTEGER. Vectors quantize to
``floor(v·1000 + 0.5)`` (identical IEEE ops both engines, then an exact
floor); centroids live at 8× that scale and update by exact integer
floor division ``floordiv(8·Σxq, m)``; distances are bigint sums of
squared integer differences, so the argmin can never flip on a
float-rounding hair. Ties break to the lowest centroid id; empty
clusters keep their previous centroid; init is the k vectors of lowest
``(md5(vec_id), vec_id)`` rank (the repo's deterministic-sample
convention). :func:`kmeans_sql` regenerates the whole algorithm —
unrolled per iteration — for the DuckDB oracle (zero drift)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QSCALE = 1_000  # vector quantization scale
CSHIFT = 8      # extra centroid precision: centroids live at 8*QSCALE


def _floordiv(a: int, b: int) -> int:
    return a // b  # python // is floor division


def quantized_vec(vec_col, scale: int = QSCALE):
    """``array<bigint>``: per-component ``floor(v·scale + 0.5)`` — the
    half-up grid both engines compute bit-identically."""
    return F.transform(
        vec_col, lambda v: F.floor(v.cast("double") * scale + F.lit(0.5))
    )


def _assign_cols(xq_name: str, centroids: list[list[int]]):
    """(cluster, dist) columns for quantized vectors against literal
    centroids: integer argmin, first (lowest id) wins ties.

    r6 (guide §1.2 step 2, per-task→per-call work): the k·dim centroid
    literal used to be built as nested ``F.array(F.lit(...))`` columns —
    one py4j round-trip per literal, ~17k driver round-trips and ~2.5 s
    of pure Python per warm pass for k=8, dim=64, 4 assignment builds.
    One ``F.expr`` string parses JVM-side in a single call and yields
    the same literal-array argmin plan (identical integer arithmetic;
    bigint literals instead of int literals — promoted identically)."""
    cents_sql = "array(%s)" % ",".join(
        "array(%s)" % ",".join(f"{int(v)}L" for v in c) for c in centroids
    )
    dists = F.expr(
        f"transform({cents_sql}, c -> aggregate("
        f"zip_with({xq_name}, c, (a, b) -> (a * {CSHIFT}L - b) * (a * {CSHIFT}L - b)), "
        f"0L, (acc, x) -> acc + x))"
    )
    best = F.array_min(dists)
    return (F.array_position(dists, best) - 1).cast("int").alias("cluster"), best.alias(
        "dist"
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int,
    dim: int,
    iters: int = 3,
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` Lloyd rounds; return ``(assigned, centroids)``
    where ``assigned`` is ``(<id_col>, cluster, dist)`` under the FINAL
    centroids (dist = integer squared distance at the 8·QSCALE grid)
    and ``centroids`` the final integer centroid list (k × dim).

    ``dim`` is required up front (the LSH entry-point convention): the
    update aggregates one ``sum`` per dimension, so the width must be
    known without scanning."""
    if k < 1 or dim < 1 or iters < 1:
        raise ValueError(f"k={k}, dim={dim}, iters={iters} must all be >= 1")
    # enforce the width contract on EVERY row (review r5: a ragged
    # non-seed vector used to escape the seed-only check and die mid-job
    # with a raw array-index error, or null its way into the update)
    xq = F.when(
        F.size(F.col(vec_col)) == dim, quantized_vec(F.col(vec_col))
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"kmeans: vector width != dim={dim} for {id_col}="),
                F.col(id_col).cast("string"),
            )
        )
    )
    base = df.select(F.col(id_col), xq.alias("__xq")).persist()

    seeds = (
        base.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(seeds)}")
    centroids = [[int(v) * CSHIFT for v in r["__xq"]] for r in seeds]

    # r6: the per-dimension sums ride ONE array expression (one py4j
    # call, one agg column) instead of ``dim`` separate F.sum columns —
    # same partial-aggregable sums, same collected values
    sums_expr = F.expr(
        "array(%s) as sums" % ",".join(f"sum(__xq[{i}])" for i in range(dim))
    )
    for _ in range(iters):
        cluster, _dist = _assign_cols("__xq", centroids)
        agg = (
            base.select(cluster, "__xq")
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("m"), sums_expr)
            .collect()
        )
        new = list(centroids)  # empty clusters keep their centroid
        for r in agg:
            m = r["m"]
            new[r["cluster"]] = [
                _floordiv(CSHIFT * s, m) for s in r["sums"]
            ]
        centroids = new

    cluster, dist = _assign_cols("__xq", centroids)
    assigned = base.select(F.col(id_col), cluster, dist)
    return assigned, centroids


def centroid_md5(c: list[int]) -> str:
    """md5 of the comma-joined integer components — the cross-engine
    centroid fingerprint (DuckDB: ``md5(array_to_string(cq, ','))``)."""
    return hashlib.md5(",".join(str(int(v)) for v in c).encode()).hexdigest()


def kmeans_sql(
    src_cte: str,
    id_expr: str,
    vec_expr: str,
    *,
    k: int,
    dim: int,
    iters: int = 3,
) -> str:
    """DuckDB rendering of the SAME algorithm, iterations unrolled (the
    pagerank/bpe zero-drift pattern): CTE chain ending in
    ``km_final(id, cluster, dist)`` and ``km_cent{iters}(cid, cq)``.
    Every arithmetic step mirrors the Spark side exactly — quantize,
    integer distances, tie-to-lowest-cid, floor-division update with
    empty-cluster carry."""
    if k < 1 or dim < 1 or iters < 1:
        raise ValueError(f"k={k}, dim={dim}, iters={iters} must all be >= 1")
    dist = (
        "list_aggregate(list_transform(range(1, {dim} + 1), "
        "i -> ({cs}*q.xq[i] - c.cq[i]) * ({cs}*q.xq[i] - c.cq[i])), 'sum')::BIGINT"
    ).format(dim=dim, cs=CSHIFT)
    # truncating // -> floor division for either sign (m > 0 always)
    fdiv = (
        "case when s >= 0 then ({cs}*s) // m "
        "else -(({cs}*(-s) + m - 1) // m) end"
    ).format(cs=CSHIFT)
    parts = [
        f"""
      km_q as (
        select {id_expr} as id,
               list_transform({vec_expr}::DOUBLE[],
                              v -> floor(v * {QSCALE} + 0.5)::BIGINT) as xq
        from {src_cte}
      ),
      km_cent0 as (
        select row_number() over (order by md5(cast(id as varchar)), id) - 1
                 as cid,
               list_transform(xq, v -> {CSHIFT} * v) as cq
        from (select id, xq from km_q
              order by md5(cast(id as varchar)), id limit {k})
      )"""
    ]
    for t in range(1, iters + 1):
        prev, cur = f"km_cent{t - 1}", f"km_cent{t}"
        parts.append(f"""
      km_a{t} as (
        select id, xq, cid, d from (
          select q.id, q.xq, c.cid, {dist} as d,
                 row_number() over (partition by q.id
                                    order by {dist}, c.cid) as rk
          from km_q q cross join {prev} c
        ) where rk = 1
      ),
      {cur} as (
        select p.cid, coalesce(u.cq, p.cq) as cq
        from {prev} p left join (
          select cid, list(cqi order by i) as cq from (
            select cid, i, {fdiv} as cqi from (
              select cid, i, sum(v)::BIGINT as s, count(*)::BIGINT as m
              from (
                select cid, unnest(xq) as v,
                       generate_subscripts(xq, 1) as i
                from km_a{t}
              ) group by cid, i
            )
          ) group by cid
        ) u using (cid)
      )""")
    final = f"""
      km_final as (
        select id, cid as cluster, d as dist from (
          select q.id, c.cid, {dist} as d,
                 row_number() over (partition by q.id
                                    order by {dist}, c.cid) as rk
          from km_q q cross join km_cent{iters} c
        ) where rk = 1
      )"""
    parts.append(final)
    return ",".join(parts)
