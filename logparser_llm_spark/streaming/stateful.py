"""Custom stateful streaming operators via ``applyInPandasWithState``.

``foreachBatch`` (incremental.py) re-runs the batch pipeline per
micro-batch; the operators here instead keep PER-KEY STATE inside the
streaming engine itself — the Spark-native shape for running aggregates
whose state must survive across triggers and restarts (state lives in
the stream's checkpoint, not in driver memory).

Scale notes: state is partitioned by the grouping key across executors;
per-key state here is a single bigint (or two), so 10^8 distinct
templates cost ~GBs spread over the cluster — bounded by key cardinality,
never by stream length. Use watermark-based ``EventTimeTimeout`` for
key spaces that churn (session keys), as ``expiring_user_sessions`` does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_template_counts(assigned: DataFrame, template_col: str = "template_id") -> DataFrame:
    """Streaming running totals per template: each trigger emits
    (template_id, total_count, batch_count) with total_count accumulated
    in engine-managed state across ALL triggers (and restarts — the
    state store lives in the checkpointLocation).

    Input: a STREAMING DataFrame that already has ``template_col``
    (assign_templates against a stable broadcast pool works on streams —
    it is a pure map + broadcast join)."""
    out_schema = f"{template_col} string, total_count bigint, batch_count bigint"
    state_schema = "count bigint"

    def update(key, pdfs, state: GroupState):
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        (prev,) = state.get if state.exists else (0,)
        total = prev + batch
        state.update((total,))
        yield pd.DataFrame(
            {template_col: [key[0]], "total_count": [total], "batch_count": [batch]}
        )

    return assigned.groupBy(template_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def expiring_user_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization with state expiry: per user, accumulate
    an open session (n_events, start, last seen); when the event-time
    watermark passes last_seen + gap the state TIMES OUT and the closed
    session is emitted. State is bounded by the set of users active
    within the watermark horizon — the churn-safe shape for unbounded
    key spaces."""
    # derive the key column's type from the input (same convention as
    # knn_join_topk_blocked) — hardcoding bigint would miscast or fail on
    # string/int32 user ids (ADVICE r2)
    user_type = dict(events.dtypes)[user_col]
    out_schema = (
        f"{user_col} {user_type}, session_start timestamp, session_end timestamp, "
        "n_events bigint"
    )
    state_schema = "start_us bigint, last_us bigint, n bigint"
    # pandas dtype for emitting the key column with a stable type even in
    # empty frames (Arrow casts exact-width ints; object works for strings)
    _pd_key_dtype = {
        "tinyint": "int8", "smallint": "int16", "int": "int32",
        "bigint": "int64", "string": "object",
    }.get(user_type, "object")

    gap_us = gap_seconds * 1_000_000
    # Arrow hands the UDF tz-NAIVE timestamps rendered in the session
    # timezone, while setTimeoutTimestamp compares against the true-UTC
    # event-time watermark — localize with the session tz (captured on
    # the driver) so expiry math is correct for any session timezone.
    session_tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"

    def _emit(sessions):
        # emit naive timestamps back in the session tz (the inverse of
        # the localization above, so round-trips are identity)
        def _naive(us: int):
            return (
                pd.Timestamp(us, unit="us", tz="UTC").tz_convert(session_tz).tz_localize(None)
            )

        return pd.DataFrame(
            {
                user_col: pd.Series([s_key for s_key, *_ in sessions], dtype=_pd_key_dtype),
                "session_start": pd.Series(
                    [_naive(s) for _, s, _, _ in sessions], dtype="datetime64[ns]"
                ),
                "session_end": pd.Series(
                    [_naive(e) for _, _, e, _ in sessions], dtype="datetime64[ns]"
                ),
                "n_events": pd.Series([n for *_, n in sessions], dtype="int64"),
            }
        )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit([(key[0], start_us, last_us, n)])
            return
        # gather + sort this trigger's event times so gaps INSIDE a batch
        # (or across triggers) split sessions exactly like the batch
        # 30-min-gap sessionization; only the trailing open session stays
        # in state (late data beyond the watermark is dropped upstream)
        times: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts = pd.to_datetime(pdf[ts_col])
                if ts.dt.tz is None:
                    ts = ts.dt.tz_localize(session_tz)
                times.extend(int(v) // 1000 for v in ts.astype("int64"))
        times.sort()
        closed: list[tuple] = []
        cur = list(state.get) if state.exists else None  # [start, last, n]
        for t in times:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_us:
                closed.append((key[0], cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
            else:
                cur[0] = min(cur[0], t)
                cur[1] = max(cur[1], t)
                cur[2] += 1
        if cur is not None:
            state.update((cur[0], cur[1], cur[2]))
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        yield _emit(closed)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
