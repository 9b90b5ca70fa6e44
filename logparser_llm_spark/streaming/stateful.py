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
    out_schema = (
        f"{user_col} bigint, session_start timestamp, session_end timestamp, "
        "n_events bigint"
    )
    state_schema = "start_us bigint, last_us bigint, n bigint"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        batch_min = batch_max = None
        n_new = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pd.to_datetime(pdf[ts_col])
            lo, hi = ts.min().value // 1000, ts.max().value // 1000
            batch_min = lo if batch_min is None else min(batch_min, lo)
            batch_max = hi if batch_max is None else max(batch_max, hi)
            n_new += len(pdf)
        if n_new:
            if state.exists:
                start_us, last_us, n = state.get
                state.update((min(start_us, batch_min), max(last_us, batch_max), n + n_new))
            else:
                state.update((batch_min, batch_max, n_new))
        if state.exists:
            _, last_us, _ = state.get
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(
            {
                user_col: pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[ns]"),
                "session_end": pd.Series([], dtype="datetime64[ns]"),
                "n_events": pd.Series([], dtype="int64"),
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
