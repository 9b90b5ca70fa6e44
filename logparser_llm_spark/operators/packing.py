"""Sequence packing: assign documents to fixed-length training
sequences by chopping the ordered token stream at ``seq_len``
boundaries — the concat-then-chop batching step an LLM training
pipeline runs after filtering/dedup (every published data pipeline
packs; padding-free batches need the global token prefix sum).

The primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM. The naive Spark
spelling — ``sum() over (order by k)`` with no partition key — collapses
to a single-partition sort, the one shape that cannot scale. This
module implements the classic two-pass scan instead (the MLlib /
classic-PRAM decomposition):

1. range-repartition + sort-within-partitions on the order key (the
   ONLY full shuffle), persisted so both passes share one
   materialization;
2. per-partition subtotals → driver (one tiny row per partition),
   exclusive-scanned there and broadcast back;
3. an Arrow ``mapInPandas`` per-partition running cumsum seeded at the
   partition's offset (vectorized ``np.cumsum``; state carries across
   the partition's record batches, zero further shuffle).

Total cost at 100 TB: one range shuffle + one O(num_partitions) driver
step — the prefix sum itself never re-shuffles the data. Equality
against the single-partition window spelling is pytest-pinned (the
cdc/simhash dual-path precedent), as is partition-count invariance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SEQ_LEN = 512  # tokens per packed training sequence (the registered query)


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    *,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Every input column plus ``out_col`` = the sum of ``val_col`` over
    all rows strictly before this one in ``order_col`` order (NULL
    values count 0; ``order_col`` must be a total order for the result
    to be well-defined). Output partitioning: range on ``order_col``.
    """
    if order_col not in df.columns or val_col not in df.columns:
        raise ValueError(f"{order_col!r}/{val_col!r} must be in {df.columns}")
    for reserved in ("__pid", "__v", out_col):
        if reserved in df.columns:
            raise ValueError(f"input already has a column named {reserved!r}")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = df.columns

    part = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__v", F.coalesce(F.col(val_col).cast("bigint"), F.lit(0)))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    subs = {
        r["__pid"]: r["s"]
        for r in part.groupBy("__pid").agg(F.sum("__v").alias("s")).collect()
    }
    offsets, running = {}, 0
    for pid in range(max(subs) + 1 if subs else 0):
        offsets[pid] = running
        running += subs.get(pid, 0)
    bc = spark.sparkContext.broadcast(offsets)

    def scan(batches):
        import numpy as np

        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = bc.value[int(pdf["__pid"].iloc[0])]
            vals = pdf["__v"].to_numpy(dtype="int64")
            pdf = pdf.drop(columns=["__pid", "__v"])
            pdf[out_col] = run + np.concatenate(([0], np.cumsum(vals)[:-1]))
            run += int(vals.sum())
            yield pdf

    from pyspark.sql.types import LongType

    schema = part.drop("__pid", "__v").schema.add(out_col, LongType(), False)
    return part.mapInPandas(scan, schema).select(*cols, out_col)


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_col: str,
    *,
    seq_len: int = SEQ_LEN,
    num_partitions: int | None = None,
) -> DataFrame:
    """Chop the ``order_col``-ordered token stream at exact ``seq_len``
    boundaries: every input column plus ``cum_before`` (tokens strictly
    before this doc), ``seq_id`` (the sequence the doc STARTS in),
    ``seq_offset`` (position within it) and ``straddles`` (the doc spans
    a boundary — its tail spills into the next sequence). Token counts
    must be non-negative."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    out = exclusive_prefix_sum(
        df, order_col, token_col, num_partitions=num_partitions
    )
    tok = F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
    return (
        out.withColumn("seq_id", F.floor(F.col("cum_before") / seq_len))
        .withColumn("seq_offset", F.col("cum_before") % seq_len)
        .withColumn("straddles", F.col("seq_offset") + tok > seq_len)
    )


def global_rank(
    df: DataFrame,
    order_col: str,
    *,
    out_col: str = "global_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Every input column plus ``out_col`` = the row's exact 0-based
    GLOBAL position in ``order_col`` order — the scale-correct spelling
    of ``row_number() over (order by …)``, whose empty-window form
    funnels the whole table through ONE task (the classic 100 TB
    stage-killer). Built as :func:`exclusive_prefix_sum` of the
    constant 1: range shuffle on the order key, partition-parallel
    local ranks, one bounded driver pass over per-partition counts.
    ``order_col`` must be a TOTAL order (unique keys) — with ties the
    positions of tied rows are partition-placement-dependent, exactly
    like the window spelling without a full tiebreak."""
    for reserved in ("__one", out_col):
        if reserved in df.columns:
            raise ValueError(f"input already has a column named {reserved!r}")
    ranked = exclusive_prefix_sum(
        df.withColumn("__one", F.lit(1)),
        order_col,
        "__one",
        out_col=out_col,
        num_partitions=num_partitions,
    )
    return ranked.drop("__one")


def budget_select(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    *,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-budget-constrained corpus selection: walk the corpus in
    ``order_col`` order (the caller encodes best-first — e.g. quality
    descending) and keep whole documents until the NEXT one would push
    the running token total past ``budget`` — the "give me the best
    10B tokens" cut every mixture builder makes, made exact: a doc is
    selected iff its exclusive prefix-sum of ``tokens_col`` plus its
    own count is <= budget. No partial documents, and because the
    prefix sum is exact the selected set is the unique maximal prefix
    of the ordering that fits (greedy-by-order, not knapsack — the
    point is a deterministic, reproducible cut, not an NP-hard
    optimum).

    Scale shape: :func:`exclusive_prefix_sum` — range shuffle on the
    order key, partition-parallel local sums, one bounded driver pass
    over per-partition totals — NEVER the empty-window running sum
    that funnels 100 TB through one task. ``order_col`` must be a
    total order (unique keys; the repo convention is a fixed-width
    string with an id tiebreak) and ``tokens_col`` non-negative —
    a negative count would make "maximal prefix" meaningless.

    Output: every input column plus ``cum_before`` (exclusive prefix
    tokens) and ``selected``."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    ranked = exclusive_prefix_sum(
        df, order_col, tokens_col, out_col="cum_before",
        num_partitions=num_partitions,
    )
    return ranked.withColumn(
        "selected",
        (F.col("cum_before") + F.col(tokens_col)) <= F.lit(budget),
    )


def shard_plan(
    df: DataFrame,
    order_col: str,
    bytes_col: str,
    *,
    target_bytes: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Size-balanced export sharding: assign every document a shard id
    so that shards, read in ``order_col`` order, each hold about
    ``target_bytes`` — ``shard_id = exclusive_prefix_bytes //
    target_bytes``. The plan every bulk exporter needs before writing
    (a corpus dumped by hash lands wildly uneven file sizes; training
    loaders want shards within a 2x band), with the two properties the
    formula gives for free: shards are CONTIGUOUS in the order (shard
    ids are non-decreasing, so shard k is a byte range, resumable and
    seekable), and every shard except possibly the last spans at least
    ``target_bytes`` of input once its straddling first document is
    counted — a shard's overshoot is bounded by its largest document.

    Same scale spelling as :func:`budget_select`:
    :func:`exclusive_prefix_sum` (range shuffle, partition-parallel
    local sums, bounded driver pass), never a single-task global
    window. ``order_col`` must be a total order; ``bytes_col``
    non-negative. Output: input columns plus ``cum_before`` and
    ``shard_id``."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    ranked = exclusive_prefix_sum(
        df, order_col, bytes_col, out_col="cum_before",
        num_partitions=num_partitions,
    )
    # integer `div`, not `/`: stays on the exact bigint path end to end
    return ranked.withColumn(
        "shard_id", F.expr(f"cum_before div {target_bytes}")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    epochs: int,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic multi-epoch reshuffle PLAN — the data-loader
    question at training scale: every epoch must visit every document
    exactly once in a different, reproducible order, WITHOUT
    materializing a permutation table or trusting a single-node RNG.
    Order key = md5(seed ‖ epoch ‖ id) (tie-broken by id): a keyed
    hash order, reproducible on any engine, uncorrelated between
    epochs; the position is the scale-correct global rank
    (:func:`exclusive_prefix_sum` with epoch as the major key — ONE
    range shuffle over epochs×rows, never the single-task
    row_number), so within each epoch positions are exactly
    0..N−1 — a bijection by construction.

    Output: (id, epoch, pos). Each epoch's pos multiset is exactly
    {0..N−1} (asserted in tests); the same (seed, epoch, id) always
    lands on the same pos.

    Scale note: for E epochs this materializes E·N plan rows in one
    job — the shape a loader wants when it writes per-epoch manifest
    files; for an on-the-fly loader, compute one epoch at a time
    (same call, epochs=1, seed+epoch varied)."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    e = df.select(F.col(id_col).alias("id")).crossJoin(
        F.broadcast(
            df.sparkSession.range(epochs).select(
                F.col("id").cast("bigint").alias("epoch")
            )
        )
    )
    key = F.concat(
        F.lpad(F.col("epoch").cast("string"), 6, "0"),
        F.lit("|"),
        F.md5(
            F.concat(
                F.lit(f"{seed}|"),
                F.col("epoch").cast("string"),
                F.lit("|"),
                F.col("id").cast("string"),
            )
        ),
        F.lit("|"),
        F.lpad(F.col("id").cast("string"), 20, "0"),
    )
    ranked = global_rank(
        e.withColumn("_ek", key),
        "_ek",
        out_col="_gpos",
        num_partitions=num_partitions,
    )
    n = df.count()
    return ranked.select(
        "id",
        "epoch",
        (F.col("_gpos") - F.col("epoch") * F.lit(n)).cast("bigint")
        .alias("pos"),
    )


def epoch_shuffle_sql(
    *, rel: str, id_col: str, epochs: int, seed: int = 0
) -> str:
    """DuckDB recompute of :func:`epoch_shuffle` — same keyed-hash
    order per epoch, spelled as the single-node window (the
    independent algebra the Spark side deliberately avoids)."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    return f"""
        select {id_col} as id, e.epoch,
               cast(row_number() over (
                 partition by e.epoch
                 order by md5('{seed}|' || cast(e.epoch as varchar)
                              || '|' || cast({id_col} as varchar)),
                          {id_col}
               ) - 1 as bigint) as pos
        from {rel}
        cross join (select unnest(range({epochs}))::BIGINT as epoch) e
    """
