"""Table-format sink abstraction: Iceberg when a catalog is configured,
parquet otherwise.

The north rule targets per-sink **Iceberg** tables; this container ships no
Iceberg runtime jars, so the writer negotiates: ``writeTo`` against an
Iceberg catalog when one is configured on the session
(``spark.sql.catalog.<name>``), else a Hive-partitioned parquet layout with
the same logical shape (partition column ``sink_id``, append/overwrite
semantics). Production deployment only needs
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` + a catalog
conf; no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_catalog(spark: SparkSession, name: str = "local") -> bool:
    """True iff an Iceberg catalog with this name is configured AND the
    Iceberg runtime is on the classpath."""
    conf = spark.conf
    try:
        impl = conf.get(f"spark.sql.catalog.{name}")
    except Exception:
        return False
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_sink_table(
    df: DataFrame,
    target: str,
    partition_by: list[str] | None = None,
    mode: str = "append",
    catalog: str = "local",
) -> str:
    """Write to ``catalog.db.table`` (Iceberg) or ``<target>`` path
    (parquet fallback). Returns the format used ('iceberg'|'parquet').

    One partitioned single-pass write either way (never K filtered scans).
    """
    spark = df.sparkSession
    partition_by = partition_by or ["sink_id"]
    if iceberg_catalog(spark, catalog):
        writer = df.writeTo(f"{catalog}.{target}")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return "iceberg"
    df.write.mode(mode).partitionBy(*partition_by).parquet(target)
    return "parquet"


def read_sink_table(spark: SparkSession, target: str, catalog: str = "local") -> DataFrame:
    if iceberg_catalog(spark, catalog):
        return spark.read.table(f"{catalog}.{target}")
    return spark.read.parquet(target)
