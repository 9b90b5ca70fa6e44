"""Table profiling: per-column null counts, exact distinct counts, and
min/max — the data-quality summary every ingestion pipeline runs before
trusting a new drop of crawl data (row counts drifting, a column going
all-NULL, a timestamp range outside the crawl window).

Contract: the input frame must be staged to **string and bigint
columns only** (the caller casts doubles to integer micro-units and
timestamps to epoch micros first, per the repo-wide integerization
convention). That makes every statistic exact and engine-portable:
bigint and ASCII-string min/max render identically on Spark and
DuckDB, and distinct counts are exact integers — no float formatting,
no collation surprises.

Scale shape: ONE aggregation pass. The multi-column exact distinct
counts compile to Spark's Expand strategy (input replicated once per
distinct-aggregate — k× map-side fan-out, still a single shuffle whose
output is one row); the per-column rows are then unpivoted driver-side
from that single row via an explode over a k-element array. At
extreme scale swap the exact distinct counts for the mergeable HLL
sketch in ``operators/sketch.py`` (hll_distinct) — exactness is chosen
here because the profile IS the oracle surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALLOWED = {"string", "bigint"}
_OUT = ("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def table_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all columns) of a staged frame.

    Output: one row per column —
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with min/max rendered as strings (NULL when the column is
    all-NULL). ``n_distinct`` excludes NULLs (both engines' count
    distinct semantics).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    types = dict(df.dtypes)
    for c in cols:
        if c not in types:
            raise ValueError(f"unknown column: {c}")
        if types[c] not in _ALLOWED:
            raise ValueError(
                f"column {c} has type {types[c]}; stage to string/bigint "
                "first (integer micro-units / epoch micros)"
            )
    if set(_OUT) & set(cols):
        raise ValueError(
            f"reserved output column name(s): {sorted(set(_OUT) & set(cols))}"
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def table_profile_sql(*, rel: str, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`table_profile` — a per-column UNION ALL
    over the same staged relation, generated here so the spellings
    cannot drift."""
    cols = list(cols)
    if not cols:
        raise ValueError("no columns to profile")
    parts = [
        f"""select '{c}' as column,
               count(*)::BIGINT as n_rows,
               (count(*) - count({c}))::BIGINT as n_nulls,
               count(distinct {c})::BIGINT as n_distinct,
               min({c})::VARCHAR as min_value,
               max({c})::VARCHAR as max_value
        from {rel}"""
        for c in cols
    ]
    return " union all ".join(parts)


def table_profile_py(rows: list[dict], cols: Sequence[str]) -> list[tuple]:
    """Driver-side reference for :func:`table_profile` (differential
    tests) over dict rows of string/int values."""
    out = []
    n = len(rows)
    for c in cols:
        vals = [r.get(c) for r in rows]
        nn = [v for v in vals if v is not None]
        out.append(
            (
                c,
                n,
                n - len(nn),
                len(set(nn)),
                str(min(nn)) if nn else None,
                str(max(nn)) if nn else None,
            )
        )
    return out
