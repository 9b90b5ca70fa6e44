"""Temporal joins: a distributed as-of (point-in-time) join.

The brief-level custom-operator family Spark lacks natively: for every
left row, the single right row with the greatest ``ts`` at-or-before
(backward) / least at-or-after (forward) the left row's ``ts`` within
the same key — "the last price before the trade", "the most recent
purchase before the error". Kudu/Pinot/QuestDB ship this as a
primitive; in Spark a naive formulation is a non-equi range join
(O(n·m) per key under SortMergeJoin's inequality fallback, or worse a
BroadcastNestedLoopJoin).

This implementation is the MERGE shape instead, which is how a column
store executes it: union both sides tagged, ONE shuffle on the key,
one window sort per key, and a running ``last(right_payload,
ignorenulls=True)`` carries each right row forward to every following
left row. Cost = one shuffle + one sort of |L| + |R| — the same class
as the groupBy it usually feeds, with zero row multiplication. Skewed
keys degrade to a per-key sort exactly like any window; the usual
salting is NOT applicable (the running carry needs key-complete
ordering), so a pathologically hot key should be pre-split upstream by
time range.

Tie semantics (pinned by tests and the DuckDB ASOF oracle): equal
timestamps MATCH (inclusive, both directions). Among multiple right
rows at the same (key, ts) the LAST one in (ts, input-order) wins —
callers who need determinism there should reduce the right side to one
row per (key, ts) first (the registered query does, via max-struct).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    *,
    direction: str = "backward",
    right_prefix: str = "",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the payload of the
    matching ``right`` row (NULLs when no right row qualifies).

    ``on`` are the equality keys and ``ts_col`` the shared ordering
    column name (present in both frames). Right payload columns (all
    but ``on`` + ``ts_col``) are emitted with ``right_prefix``; a name
    collision with a left column raises.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    on = list(on)
    for c in on + [ts_col]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist in both frames")
    payload = [c for c in right.columns if c not in on and c != ts_col]
    if not payload:
        raise ValueError("right frame has no payload columns beyond keys + ts")
    out_names = {right_prefix + c for c in payload}
    clash = out_names & set(left.columns)
    if clash:
        raise ValueError(
            f"right payload columns {sorted(clash)} collide with left columns; "
            "pass right_prefix"
        )

    r_struct = F.struct(*[F.col(c) for c in payload]).alias("_r")
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    r2 = right.select(
        *on, F.col(ts_col).alias("_ts"), r_struct, F.lit(0).alias("_src")
    ).withColumn("_l", F.lit(None).cast(f"struct<{_ddl(left)}>"))
    l2 = left.select(
        *on, F.col(ts_col).alias("_ts"), F.lit(None).cast(f"struct<{_ddl_payload(right, payload)}>").alias("_r"),
        F.lit(1).alias("_src"), l_struct,
    )
    both = l2.unionByName(r2)

    if direction == "backward":
        # right (src 0) sorts before left at equal ts → inclusive match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_src").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)
    else:
        # left (src 1) sorts before right at equal ts → inclusive match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_src").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("_r", ignorenulls=True).over(w)

    out = both.withColumn("_m", matched).where(F.col("_src") == 1)
    return out.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(right_prefix + c) for c in payload],
    )


DEFAULT_MAX_BUCKETS_PER_INTERVAL = 1024


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_width: int,
    right_prefix: str = "",
    max_buckets_per_interval: int = DEFAULT_MAX_BUCKETS_PER_INTERVAL,
) -> DataFrame:
    """Range (interval containment) join: every (point, interval) pair
    with equal keys and ``start ≤ point ≤ end`` — the other non-equi
    join Spark executes as a row-multiplying nested loop if written
    naively.

    Grid-bucketed instead: each interval is exploded to the
    ``bucket_width``-sized grid cells it covers, each point addresses
    its single cell, and the pair meets in an ordinary EQUI-join on
    (keys, cell) followed by the exact containment filter. A pair
    matches in exactly one cell (the point's), so no dedup is needed.
    Cost: |intervals| × (span/bucket_width + 1) exploded rows — pick
    ``bucket_width`` near the typical span so that factor stays ~2.
    An interval spanning more than ``max_buckets_per_interval`` cells
    raises at execution time (``raise_error``) rather than silently
    exploding the join — re-bucket or split such outliers upstream.

    Ordering columns must be numeric (epoch seconds/days, not raw
    timestamps); empty/invalid intervals (start > end) match nothing.
    Output: all point columns + interval payload columns (with
    ``right_prefix``; collisions raise, as in :func:`asof_join`).
    """
    on = list(on)
    for c in on + [point_col]:
        if c not in points.columns:
            raise ValueError(f"column {c!r} must exist in the points frame")
    for c in on + [start_col, end_col]:
        if c not in intervals.columns:
            raise ValueError(f"column {c!r} must exist in the intervals frame")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    payload = [c for c in intervals.columns if c not in on]
    clash = {right_prefix + c for c in payload} & set(points.columns)
    if clash:
        raise ValueError(
            f"interval columns {sorted(clash)} collide with point columns; "
            "pass right_prefix"
        )

    b0 = F.floor(F.col(start_col) / bucket_width).cast("bigint")
    b1 = F.floor(F.col(end_col) / bucket_width).cast("bigint")
    span = b1 - b0 + 1
    cells = F.when(span <= max_buckets_per_interval, F.sequence(b0, b1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: an interval spans more than "
                    f"{max_buckets_per_interval} buckets of width "
                    f"{bucket_width} (span="
                ),
                span.cast("string"),
                F.lit("); re-bucket or split it upstream"),
            )
        )
    )
    r = intervals.where(F.col(start_col) <= F.col(end_col)).select(
        *on,
        F.explode(cells).alias("_cell"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    l = points.select(
        "*", F.floor(F.col(point_col) / bucket_width).cast("bigint").alias("_cell")
    )
    joined = l.join(r, on + ["_cell"]).where(
        (F.col(f"_r_{start_col}") <= F.col(point_col))
        & (F.col(point_col) <= F.col(f"_r_{end_col}"))
    )
    return joined.select(
        *[F.col(c) for c in points.columns],
        *[F.col(f"_r_{c}").alias(right_prefix + c) for c in payload],
    )


def _ddl(df: DataFrame) -> str:
    return ", ".join(f"{name}: {dtype}" for name, dtype in df.dtypes)


def _ddl_payload(df: DataFrame, payload: Sequence[str]) -> str:
    types = dict(df.dtypes)
    return ", ".join(f"{c}: {types[c]}" for c in payload)
