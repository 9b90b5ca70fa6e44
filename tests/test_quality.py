"""PII redaction and repetition-signal functions."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.functions.quality import (
    dup_token_fraction,
    pii_count_col,
    redact_pii_col,
    top_token_fraction,
)
from logparser_llm_spark.functions.text import ws_tokens


def _redact(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(redact_pii_col(F.col("t")).alias("r")).collect()[0]["r"]


def test_pii_redaction_kinds(spark):
    assert _redact(spark, "mail me at bob.smith+x@corp.example.co today") == \
        "mail me at <EMAIL> today"
    assert _redact(spark, "srv at 192.168.0.1 down") == "srv at <IP> down"
    assert _redact(spark, "call 555-123-4567 now") == "call <PHONE> now"
    assert _redact(spark, "call +1 (555) 123-4567 now") == "call <PHONE> now"
    # chain order: the IP rule wins over phone-ish digit runs
    assert _redact(spark, "a@b.io 10.0.0.1 555-123-4567") == "<EMAIL> <IP> <PHONE>"
    assert _redact(spark, "no pii here") == "no pii here"


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [("a@b.io c@d.io from 10.0.0.1",)], "t string"
    )
    row = df.select(
        pii_count_col(F.col("t"), "email").alias("e"),
        pii_count_col(F.col("t"), "ip").alias("i"),
        pii_count_col(F.col("t"), "phone").alias("p"),
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (2, 1, 0)


def test_repetition_signals(spark):
    rows = [
        (1, "a a a a"),          # one token repeated: dup 0.75, top 1.0
        (2, "w x y z"),          # all distinct: dup 0, top 0.25
        (3, ""),                 # empty → zeros
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, t string")
    toks = ws_tokens(F.col("t"))
    got = {
        r["doc_id"]: (r["d"], r["top"])
        for r in df.select(
            "doc_id",
            dup_token_fraction(toks).alias("d"),
            top_token_fraction(toks).alias("top"),
        ).collect()
    }
    assert got[1] == (pytest.approx(0.75), pytest.approx(1.0))
    assert got[2] == (pytest.approx(0.0), pytest.approx(0.25))
    assert got[3] == (0.0, 0.0)
