"""Bucketed-table layout: pre-shuffled-on-disk joins.

Big fact×fact joins shuffle both sides on the join key every query. When
the same join recurs (events×users, lineitem×orders, routed-sinks×pool
audits), bucketing amortizes that shuffle into the WRITE: both tables are
hash-partitioned into the same number of buckets on the join key (and
sorted within buckets), so the join plan has NO Exchange at read time —
each task joins bucket i against bucket i. This is the disk analogue of
co-partitioning and the standard 100 TB answer for repeated joins; the
plan-quality test asserts the Exchange-free join.

Bucketing requires the session catalog (``saveAsTable``); pass a
``database`` created over an explicit LOCATION to control where files
land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_location_db(spark: SparkSession, name: str, location: str) -> str:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")
    return name


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (+ optionally sorted) managed table.
    Same ``n_buckets`` + same key on both sides of a future join =
    shuffle-free (and with ``sort=True``, sort-free) sort-merge join."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)
