"""File sources (S1-S4 in SURVEY.md §2.1).

The reference reads CSV/JSON/plain-text and iterates chunks
(reference core/parser.py:241-281); Spark's readers subsume the chunking
(S4) via input-split partitioning (``spark.sql.files.maxPartitionBytes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_logs(spark: SparkSession, path: str, log_column: str = "log") -> DataFrame:
    """S1 (parser.py:264-265): CSV scan projecting the log column."""
    return spark.read.csv(path, header=True).select(F.col(log_column).alias("text"))


def read_json_logs(spark: SparkSession, path: str, log_column: str = "log") -> DataFrame:
    """S2 (parser.py:267-268): JSON-lines scan projecting the log column."""
    return spark.read.json(path).select(F.col(log_column).alias("text"))


def read_text_logs(spark: SparkSession, path: str) -> DataFrame:
    """S3 (parser.py:271-274): line-per-row, stripped, blanks dropped."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("text"))
        .filter(F.length("text") > 0)
    )


def read_logs(spark: SparkSession, path: str, log_column: str = "log") -> DataFrame:
    """Suffix-dispatching reader (parse_file semantics, parser.py:262-274)."""
    if path.endswith(".csv"):
        return read_csv_logs(spark, path, log_column)
    if path.endswith(".json") or path.endswith(".jsonl"):
        return read_json_logs(spark, path, log_column)
    if path.endswith(".parquet"):
        return spark.read.parquet(path)
    return read_text_logs(spark, path)


def write_csv_results(df: DataFrame, path: str) -> None:
    """S5 (parser.py:300-302): CSV sink."""
    df.write.mode("overwrite").option("header", True).csv(path)
