"""Parity tests for the vectorized extractor vs reference LogCleaner
semantics (reference preprocessor/cleaner.py:39-206)."""

import pandas as pd
import pytest

from logparser_llm_spark.config import PreprocessingConfig
from logparser_llm_spark.functions.cleaning import (
    clean_col,
    clean_pandas,
    clean_text,
    extract_log_level,
    extract_timestamp,
    is_valid_log,
    is_valid_log_col,
)

ALL_ON = PreprocessingConfig(
    remove_timestamps=True,
    remove_ip_addresses=True,
    normalize_numbers=True,
    normalize_paths=True,
    lowercase=True,
)
DEFAULTS = PreprocessingConfig()

SAMPLE_LOGS = [
    "2024-01-01 10:00:00 INFO User 12345 logged in from 192.168.1.1",
    "2024-01-01 10:05:00 ERROR Failed to connect to database on port 5432",
    "2024-01-01 10:10:00 DEBUG Reading file /var/log/app.log",
    "Jan  5 03:02:01 sshd[123]: Accepted password for root",
    "12/31/2024 23:59:59 WARN disk usage at 95.5 percent",
    "response time 3.14 ms for request 98765",
    "   leading and trailing   whitespace   ",
    "C:\\Users\\admin\\file.txt was modified",
    "",
    "short",
    "!!!???...",
    "fe80:0000:0000:0000:0202:b3ff:fe1e:8329 ipv6 host unreachable",
]


def reference_clean(log: str, cfg: PreprocessingConfig) -> str:
    """Literal transcription of reference cleaner.py:39-77 for oracle use."""
    import re

    if not log or not log.strip():
        return ""
    cleaned = log.strip()
    if cfg.remove_timestamps:
        for p in [
            r"\d{4}-\d{2}-\d{2}[T\s]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
            r"\d{2}/\d{2}/\d{4}\s\d{2}:\d{2}:\d{2}",
            r"\w{3}\s+\d{1,2}\s\d{2}:\d{2}:\d{2}",
        ]:
            cleaned = re.sub(p, "", cleaned)
    if cfg.remove_ip_addresses:
        cleaned = re.sub(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "", cleaned)
        cleaned = re.sub(r"(?:[0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}", "", cleaned)
    if cfg.normalize_numbers:
        cleaned = re.sub(r"\b\d+\.\d+\b", "<NUM>", cleaned)
        cleaned = re.sub(r"\b\d{4,}\b", "<NUM>", cleaned)
    if cfg.normalize_paths:
        cleaned = re.sub(r"/(?:[a-zA-Z0-9._-]+/)+[a-zA-Z0-9._-]+", "<PATH>", cleaned)
        cleaned = re.sub(r"[A-Z]:\\(?:[^\\]+\\)+[^\\]+", "<PATH>", cleaned)
    if cfg.lowercase:
        cleaned = cleaned.lower()
    return re.sub(r"\s+", " ", cleaned).strip()


@pytest.mark.parametrize("cfg", [DEFAULTS, ALL_ON], ids=["defaults", "all_on"])
def test_clean_text_matches_reference(cfg):
    for log in SAMPLE_LOGS:
        assert clean_text(log, cfg) == reference_clean(log, cfg), log


@pytest.mark.parametrize("cfg", [DEFAULTS, ALL_ON], ids=["defaults", "all_on"])
def test_clean_pandas_matches_scalar(cfg):
    out = clean_pandas(pd.Series(SAMPLE_LOGS), cfg).tolist()
    assert out == [clean_text(log, cfg) for log in SAMPLE_LOGS]


@pytest.mark.parametrize("cfg", [DEFAULTS, ALL_ON], ids=["defaults", "all_on"])
def test_clean_col_matches_python(spark, cfg):
    """JVM regexp_replace chain agrees with Python re on the fixture corpus."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(log,) for log in SAMPLE_LOGS], "raw string")
    got = [r[0] for r in df.select(clean_col(F.col("raw"), cfg)).collect()]
    assert got == [clean_text(log, cfg) for log in SAMPLE_LOGS]


def test_is_valid_log():
    assert not is_valid_log("")
    assert not is_valid_log("   ")
    assert not is_valid_log("short")
    assert not is_valid_log("!!!???...___")
    assert is_valid_log("User john logged in at 10:00")


def test_is_valid_log_col(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(log,) for log in SAMPLE_LOGS], "raw string")
    got = [r[0] for r in df.select(is_valid_log_col(F.col("raw"))).collect()]
    assert got == [is_valid_log(log) for log in SAMPLE_LOGS]


def test_extract_timestamp_and_level():
    assert extract_timestamp("2024-01-01 10:00:00 INFO x") == "2024-01-01 10:00:00"
    assert extract_timestamp("12/31/2024 23:59:59 boot") == "12/31/2024 23:59:59"
    assert extract_timestamp("Jan  5 03:02:01 sshd") == "Jan  5 03:02:01"
    assert extract_timestamp("no time here") is None
    assert extract_log_level("2024 info user logged in") == "INFO"
    assert extract_log_level("fatal: disk died") == "FATAL"
    assert extract_log_level("all quiet") is None


def test_extract_cols_match_scalar(spark):
    import pyspark.sql.functions as F

    from logparser_llm_spark.functions.cleaning import (
        extract_log_level_col,
        extract_timestamp_col,
    )

    df = spark.createDataFrame([(log,) for log in SAMPLE_LOGS if log], "raw string")
    rows = df.select(
        "raw",
        extract_timestamp_col(F.col("raw")).alias("ts"),
        extract_log_level_col(F.col("raw")).alias("lvl"),
    ).collect()
    for r in rows:
        assert r["ts"] == extract_timestamp(r["raw"]), r["raw"]
        assert r["lvl"] == extract_log_level(r["raw"]), r["raw"]
