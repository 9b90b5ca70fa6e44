"""Event/telemetry analytics operators: windowed funnel, Markov
transition counts, cohort retention, and trailing-window burst
detection — the four classic product/ops analytics shapes over an
event stream ``(user, ts, event_type)`` that the log tier's routed
sinks feed at 10^12-row scale.

The reference engine stops at per-template counts (aggregator.py);
these sit in the repo's beyond-reference tier next to the
sessionization / as-of / attribution queries.

Scale shape (what must survive 100 TB):

- **Funnel**: the per-user step frames are aggregates (≤ |users| rows,
  shrinking per step) and are persisted + broadcast back against the
  event scan, so an N-step funnel is N filter-pushed scans + N
  broadcast hash joins + N partial aggregates — the event stream is
  never shuffled. First-attempt semantics (see :func:`funnel_counts`)
  make each step a plain conditional ``min``.
- **Transitions / cohort**: exactly one shuffle on the user key (the
  lead window / first-seen aggregate); everything after is counts that
  pre-reduce map-side.
- **Burst**: one partially-aggregable groupBy down to
  (type, time-bucket) — thousands of rows however large the stream —
  then a per-type range-frame window on the tiny frame.

Cross-engine determinism: all timestamps become **epoch microseconds**
(``unix_micros`` / ``epoch_us`` — timezone-free instants on both
engines), every rate is an integer-permille via floor division of
non-negative operands (Spark ``div`` == DuckDB ``//``), and the burst
test is a pure integer cross-multiplication (``n·wn > mult·wsum`` —
no float mean, no sqrt). Time BUCKETING is exact floor division in
pure integer arithmetic (``(us - pmod(us, b)) div b`` — see
:func:`_floor_bucket`): Spark ``div`` and DuckDB ``//`` truncate
toward zero while Python ``//`` floors, so a naive ``us / b`` (or a
float division + cast) silently diverges from the module's own Python
references on pre-epoch (negative) timestamps — exactly the corrupt-
data profile a profiler/burst pass exists to surface.

Caching: the per-step funnel anchors and the cohort first-seen frame
persist MEMORY_AND_DISK without an explicit unpersist, per the repo's
bench-managed cache convention — lazy results have no safe unpersist
point inside the operator, caches are LRU-evictable, and bench.py
``clearCache()``\\ s between queries.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_US = 1_000_000

_FUNNEL_RESERVED = ("__ts_us", "__t", "step", "n_users", "conv_permille")


def _ts_us(ts_col: str) -> F.Column:
    """Epoch microseconds of a timestamp column. The cast makes
    TIMESTAMP_NTZ inputs (what parquet scans produce here) legal for
    ``unix_micros``; NTZ wall times are interpreted in the session
    timezone — UTC on this host, matching DuckDB's naive-as-UTC
    ``epoch_us``."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _floor_bucket(us_col: str, bucket_us: int) -> F.Column:
    """Floor-divide an epoch-micros column by the bucket width in pure
    integer arithmetic. ``pmod`` is non-negative, so ``us - pmod`` is
    the exact floor multiple and the closing ``div`` is exact — the
    result equals Python's flooring ``//`` for EVERY input, including
    pre-epoch (negative) timestamps where Spark's truncating ``div``
    (and DuckDB's truncating ``//``) would round the other way."""
    b = int(bucket_us)
    return F.expr(f"({us_col} - pmod({us_col}, {b})) div {b}")


def _floor_bucket_sql(us: str, bucket_us: int) -> str:
    """DuckDB spelling of :func:`_floor_bucket` (``%`` follows the
    dividend's sign there, so pmod is ``((x % b) + b) % b``)."""
    b = int(bucket_us)
    return f"(({us}) - ((({us}) % {b} + {b}) % {b})) // {b}"


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    *,
    window_s: int,
) -> DataFrame:
    """First-attempt windowed funnel: how many users performed
    ``steps[0]``, then ``steps[1]`` within ``window_s`` seconds of
    their FIRST ``steps[0]``, then ``steps[2]`` within ``window_s`` of
    that first qualifying ``steps[1]``, and so on.

    Semantics (deterministic, join-expressible): step 1's anchor is
    the user's earliest ``steps[0]`` event; step k's anchor is the
    earliest ``steps[k-1]`` event STRICTLY after the previous anchor
    and at most ``window_s`` seconds after it. This is the
    "first-attempt" funnel (a later retry that would have converted is
    not credited), documented because sliding-window maximal funnels
    (ClickHouse ``windowFunnel``) need per-user sequence scans; the
    first-attempt form is exact with nothing but conditional mins.

    Output: one row per step — ``(step, event_type, n_users,
    conv_permille)`` with ``conv_permille = n_users*1000 //
    previous-step users`` (floor; step 1 reads 1000 when non-empty;
    0 whenever the previous step is empty).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    if window_s <= 0:
        raise ValueError("window_s must be positive")
    clash = set(_FUNNEL_RESERVED) & {user_col, ts_col, type_col}
    if clash:
        raise ValueError(f"reserved output column name(s): {sorted(clash)}")

    ev = df.select(
        F.col(user_col),
        _ts_us(ts_col).alias("__ts_us"),
        F.col(type_col),
    )
    win_us = int(window_s) * _US

    anchor = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min("__ts_us").alias("__t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frames = [anchor]
    for s in steps[1:]:
        anchor = (
            ev.where(F.col(type_col) == s)
            .join(F.broadcast(anchor.select(user_col, "__t")), user_col)
            .where(
                (F.col("__ts_us") > F.col("__t"))
                & (F.col("__ts_us") <= F.col("__t") + F.lit(win_us))
            )
            .groupBy(user_col)
            .agg(F.min("__ts_us").alias("__t"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        frames.append(anchor)

    rows = [
        f.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).cast("bigint").alias("step"),
            F.lit(steps[i]).alias("event_type"),
            F.col("n_users"),
        )
        for i, f in enumerate(frames)
    ]
    out = reduce(lambda a, b: a.unionByName(b), rows)
    # k-row frame: the single-partition window is over the step count,
    # never the data
    prev_n = F.coalesce(F.lag("n_users").over(Window.orderBy("step")), F.lit(0))
    return out.withColumn("__prev", prev_n).select(
        "step",
        "event_type",
        "n_users",
        F.when((F.col("step") == 1) & (F.col("n_users") > 0), F.lit(1000))
        .when(F.col("__prev") > 0, F.expr("n_users * 1000 div __prev"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("conv_permille"),
    )


def funnel_sql(
    *,
    events: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    window_s: int,
) -> str:
    """DuckDB twin of :func:`funnel_counts`, generated here so the two
    spellings cannot drift. ``events`` is a relation or parenthesized
    subquery with the same columns."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    win_us = int(window_s) * _US
    ctes = [
        f"""s0 as (
          select {user_col}, min(epoch_us({ts_col})) as t
          from {events} where {type_col} = '{steps[0]}' group by 1
        )"""
    ]
    for k, s in enumerate(steps[1:], start=1):
        ctes.append(
            f"""s{k} as (
          select e.{user_col}, min(epoch_us(e.{ts_col})) as t
          from {events} e join s{k - 1} p on e.{user_col} = p.{user_col}
          where e.{type_col} = '{s}'
            and epoch_us(e.{ts_col}) > p.t
            and epoch_us(e.{ts_col}) <= p.t + {win_us}
          group by 1
        )"""
        )
    counts = " union all ".join(
        f"select {k + 1}::BIGINT as step, '{s}' as event_type, "
        f"(select count(*) from s{k})::BIGINT as n_users"
        for k, s in enumerate(steps)
    )
    return f"""
        with {", ".join(ctes)},
        counts as ({counts})
        select step, event_type, n_users,
               case when step = 1 and n_users > 0 then 1000
                    when lag(n_users) over (order by step) > 0
                      then n_users * 1000 // lag(n_users) over (order by step)
                    else 0 end::BIGINT as conv_permille
        from counts
    """


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """Markov next-event transition counts: for each user's event
    sequence (ordered by timestamp, tiebroken by ``order_cols`` so the
    sequence is total), count ``(from_type, to_type)`` adjacent pairs
    and the per-``from_type`` transition probability in permille
    (floor division — rows per ``from_type`` sum to ≤1000).

    One shuffle on the user key (the lead window); the pair count
    pre-reduces map-side.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty (total order per user)")
    ev = df.select(
        F.col(user_col),
        _ts_us(ts_col).alias("__ts_us"),
        F.col(type_col),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy(user_col).orderBy("__ts_us", *order_cols)
    pairs = (
        ev.withColumn("__to", F.lead(type_col).over(w))
        .where(F.col("__to").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("__to").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return pairs.withColumn("__tot", tot).select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000 div __tot").cast("bigint").alias("p_permille"),
    )


def transitions_sql(
    *,
    events: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`event_transitions`."""
    order = ", ".join([f"epoch_us({ts_col})"] + list(order_cols))
    return f"""
        with seq as (
          select {user_col}, {type_col} as from_type,
                 lead({type_col}) over
                   (partition by {user_col} order by {order}) as to_type
          from {events}
        ),
        pairs as (
          select from_type, to_type, count(*)::BIGINT as n
          from seq where to_type is not null group by 1, 2
        )
        select from_type, to_type, n,
               (n * 1000 // sum(n) over (partition by from_type))::BIGINT
                 as p_permille
        from pairs
    """


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    bucket_s: int = 604_800,
) -> DataFrame:
    """Cohort retention: bucket time (default weekly), cohort each user
    by their first-seen bucket, and report for every (cohort, offset)
    how many of the cohort's users were active ``offset`` buckets after
    their first — the classic retention triangle.

    Output: ``(cohort_bucket, offset, n_active, cohort_n,
    retention_permille)``; offset 0 is 1000 by construction.

    Two shuffles however large the stream: the first-seen aggregate on
    the user key and the distinct over (cohort, offset, user) — both
    partially aggregable. The user→cohort join broadcasts under AQE at
    dimension scale (one row per user); at extreme user cardinality it
    degrades to a co-partitioned join on the same key the first-seen
    aggregate already shuffled on.
    """
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    bucket_us = int(bucket_s) * _US
    d = df.select(F.col(user_col), _ts_us(ts_col).alias("__us")).select(
        F.col(user_col),
        _floor_bucket("__us", bucket_us).cast("bigint").alias("__bk"),
    )
    first = (
        d.groupBy(user_col)
        .agg(F.min("__bk").alias("cohort_bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = first.groupBy("cohort_bucket").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    act = (
        d.join(first, user_col)
        .select(
            "cohort_bucket",
            (F.col("__bk") - F.col("cohort_bucket")).alias("offset"),
            F.col(user_col),
        )
        .distinct()
    )
    ret = act.groupBy("cohort_bucket", "offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return ret.join(F.broadcast(sizes), "cohort_bucket").select(
        "cohort_bucket",
        "offset",
        "n_active",
        "cohort_n",
        F.expr("n_active * 1000 div cohort_n").cast("bigint").alias(
            "retention_permille"
        ),
    )


def cohort_sql(
    *, events: str, user_col: str, ts_col: str, bucket_s: int = 604_800
) -> str:
    """DuckDB twin of :func:`cohort_retention`."""
    bucket_us = int(bucket_s) * _US
    bk = _floor_bucket_sql("us", bucket_us)
    return f"""
        with raw as (
          select {user_col}, epoch_us({ts_col}) as us from {events}
        ),
        d as (
          select {user_col}, {bk} as bk from raw
        ),
        firstseen as (
          select {user_col}, min(bk) as cohort_bucket from d group by 1
        ),
        sizes as (
          select cohort_bucket, count(*)::BIGINT as cohort_n
          from firstseen group by 1
        ),
        act as (
          select distinct f.cohort_bucket,
                 d.bk - f.cohort_bucket as "offset", d.{user_col}
          from d join firstseen f using ({user_col})
        ),
        ret as (
          select cohort_bucket, "offset", count(*)::BIGINT as n_active
          from act group by 1, 2
        )
        select r.cohort_bucket, r."offset", r.n_active, s.cohort_n,
               (r.n_active * 1000 // s.cohort_n)::BIGINT as retention_permille
        from ret r join sizes s using (cohort_bucket)
    """


def burst_hours(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    *,
    bucket_s: int = 3600,
    trail: int = 24,
    mult: int = 2,
    min_periods: int = 12,
    min_count: int = 5,
) -> DataFrame:
    """Trailing-window burst detection on per-(type, time-bucket)
    counts: a bucket is a burst when its count exceeds ``mult`` times
    the trailing ``trail``-bucket mean — tested as the exact integer
    cross-multiplication ``n * wn > mult * wsum`` (no float mean), and
    only once ``wn >= min_periods`` trailing buckets exist (warm-up)
    and ``n >= min_count`` (absolute floor against tiny baselines).

    The trailing frame is a RANGE frame over the integer bucket index,
    so gaps (empty buckets) shrink ``wn`` rather than silently
    stretching the window over missing time.

    Output: every (event_type, bucket_idx) with ``(n, wn, wsum,
    is_burst)`` — the full scored series, not just the alarms, so the
    oracle checks the negative class too.

    One partially-aggregable groupBy down to (type, bucket) — thousands
    of rows however large the stream — then a per-type window on the
    tiny aggregated frame.
    """
    if bucket_s <= 0 or trail <= 0 or mult <= 0:
        raise ValueError("bucket_s, trail, mult must be positive")
    if not (0 < min_periods <= trail):
        raise ValueError("min_periods must be in 1..trail")
    bucket_us = int(bucket_s) * _US
    hourly = (
        df.select(F.col(type_col).alias("event_type"), _ts_us(ts_col).alias("__us"))
        .groupBy(
            "event_type",
            _floor_bucket("__us", bucket_us).cast("bigint").alias("bucket_idx"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_idx")
        .rangeBetween(-int(trail), -1)
    )
    return hourly.select(
        "event_type",
        "bucket_idx",
        "n",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("bigint").alias("wsum"),
    ).withColumn(
        "is_burst",
        (F.col("wn") >= min_periods)
        & (F.col("n") >= min_count)
        & (F.col("n") * F.col("wn") > mult * F.col("wsum")),
    )


def burst_sql(
    *,
    events: str,
    ts_col: str,
    type_col: str,
    bucket_s: int = 3600,
    trail: int = 24,
    mult: int = 2,
    min_periods: int = 12,
    min_count: int = 5,
) -> str:
    """DuckDB twin of :func:`burst_hours`."""
    bucket_us = int(bucket_s) * _US
    bk = _floor_bucket_sql("us", bucket_us)
    return f"""
        with raw as (
          select {type_col} as event_type, epoch_us({ts_col}) as us
          from {events}
        ),
        hourly as (
          select event_type, {bk} as bucket_idx, count(*)::BIGINT as n
          from raw group by 1, 2
        ),
        scored as (
          select event_type, bucket_idx, n,
                 count(*) over w as wn,
                 coalesce(sum(n) over w, 0)::BIGINT as wsum
          from hourly
          window w as (partition by event_type order by bucket_idx
                       range between {trail} preceding and 1 preceding)
        )
        select event_type, bucket_idx, n, wn, wsum,
               (wn >= {min_periods} and n >= {min_count}
                and n * wn > {mult} * wsum) as is_burst
        from scored
    """


# ---------------------------------------------------------------------------
# driver-side Python references (differential tests)
# ---------------------------------------------------------------------------


def funnel_py(
    rows: Sequence[tuple], steps: Sequence[str], window_s: int
) -> list[tuple]:
    """Reference for :func:`funnel_counts` over ``(user, ts_us, type)``
    tuples (ts already in epoch micros)."""
    steps = list(steps)
    win_us = int(window_s) * _US
    anchors: dict = {}
    for u, t, ty in rows:
        if ty == steps[0] and (u not in anchors or t < anchors[u]):
            anchors[u] = t
    counts = [len(anchors)]
    prev = anchors
    for s in steps[1:]:
        nxt: dict = {}
        for u, t, ty in rows:
            if ty == s and u in prev and prev[u] < t <= prev[u] + win_us:
                if u not in nxt or t < nxt[u]:
                    nxt[u] = t
        counts.append(len(nxt))
        prev = nxt
    out = []
    for i, (s, n) in enumerate(zip(steps, counts)):
        if i == 0:
            p = 1000 if n > 0 else 0
        else:
            p = counts[i] * 1000 // counts[i - 1] if counts[i - 1] > 0 else 0
        out.append((i + 1, s, n, p))
    return out


def transitions_py(rows: Sequence[tuple]) -> list[tuple]:
    """Reference for :func:`event_transitions` over
    ``(user, ts_us, type, order_key)`` tuples."""
    by_user: dict = {}
    for u, t, ty, o in rows:
        by_user.setdefault(u, []).append((t, o, ty))
    pairs: dict = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    tot: dict = {}
    for (a, _), n in pairs.items():
        tot[a] = tot.get(a, 0) + n
    return sorted(
        (a, b, n, n * 1000 // tot[a]) for (a, b), n in pairs.items()
    )


def cohort_py(rows: Sequence[tuple], bucket_s: int = 604_800) -> list[tuple]:
    """Reference for :func:`cohort_retention` over ``(user, ts_us)``."""
    bucket_us = int(bucket_s) * _US
    buckets: dict = {}
    for u, t in rows:
        buckets.setdefault(u, set()).add(t // bucket_us)
    first = {u: min(bs) for u, bs in buckets.items()}
    sizes: dict = {}
    for u, c in first.items():
        sizes[c] = sizes.get(c, 0) + 1
    ret: dict = {}
    for u, bs in buckets.items():
        c = first[u]
        for b in bs:
            ret[(c, b - c)] = ret.get((c, b - c), 0) + 1
    return sorted(
        (c, o, n, sizes[c], n * 1000 // sizes[c])
        for (c, o), n in ret.items()
    )


def burst_py(
    rows: Sequence[tuple],
    *,
    bucket_s: int = 3600,
    trail: int = 24,
    mult: int = 2,
    min_periods: int = 12,
    min_count: int = 5,
) -> list[tuple]:
    """Reference for :func:`burst_hours` over ``(ts_us, type)``."""
    bucket_us = int(bucket_s) * _US
    counts: dict = {}
    for t, ty in rows:
        counts[(ty, t // bucket_us)] = counts.get((ty, t // bucket_us), 0) + 1
    out = []
    for (ty, b), n in counts.items():
        win = [
            counts[(ty, x)]
            for x in range(b - trail, b)
            if (ty, x) in counts
        ]
        wn, wsum = len(win), sum(win)
        out.append(
            (ty, b, n, wn, wsum,
             wn >= min_periods and n >= min_count and n * wn > mult * wsum)
        )
    return sorted(out)
