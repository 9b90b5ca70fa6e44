"""Structured Streaming tests: rate-limited file stream through the
foreachBatch parser, and watermarked windowed counts."""

import time

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.streaming.incremental import (
    StreamingParser,
    windowed_template_counts,
)
from logparser_llm_spark.sources.synth import generate_pages


def test_foreach_batch_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # two waves of files → two micro-batches (maxFilesPerTrigger=1)
    generate_pages(spark, 60, seed=31).coalesce(1).write.parquet(src)
    generate_pages(spark, 40, seed=32).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, html binary, text string, lang string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    parser = StreamingParser(out)
    q = (
        stream.writeStream.foreachBatch(parser.process_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert not q.isActive

    written = spark.read.parquet(f"{out}/sinks")
    assert written.count() == 100
    assert written.select("_batch_id").distinct().count() >= 2
    assert parser.pool  # pool survived across micro-batches
    ids = [t["template_id"] for t in parser.pool]
    assert ids == [f"tmpl_{i:04d}" for i in range(len(ids))]  # stable ids
    # per-sink counts equal a batch run over the union
    assert written.filter(F.col("template_id") == "unknown").count() == 0


def test_windowed_counts_batch_semantics(spark):
    """The windowed aggregate shape validated in batch mode (same plan
    Structured Streaming executes incrementally)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "template_id", F.col("event_type")
    )
    out = windowed_template_counts(ev, "ts", "60 minutes", "120 minutes")
    rows = out.collect()
    assert rows
    total = sum(r["doc_count"] for r in rows)
    assert total == ev.count()
    for r in rows:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 3600


def test_stream_restart_keeps_template_ids_stable(spark, tmp_path):
    """Pool persisted per micro-batch + reloaded on construction: a
    restarted stream must assign the SAME template ids to patterns it
    already knows (ADVICE r1: memory-only pool broke the contract)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    pool_ck = str(tmp_path / "pool_ck")

    def run_wave(stream_ckpt: str):
        stream = (
            spark.readStream.schema(
                "url string, warc_ts timestamp, html binary, text string, lang string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        parser = StreamingParser(out, checkpoint_dir=pool_ck)
        q = (
            stream.writeStream.foreachBatch(parser.process_batch)
            .option("checkpointLocation", stream_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        return parser.pool

    generate_pages(spark, 50, seed=33).coalesce(1).write.parquet(src)
    pool1 = run_wave(str(tmp_path / "sck"))
    ids1 = {t["pattern"]: t["template_id"] for t in pool1}
    assert ids1

    # "restart": fresh parser instance + same checkpoints, new data wave
    generate_pages(spark, 30, seed=34).coalesce(1).write.mode("append").parquet(src)
    pool2 = run_wave(str(tmp_path / "sck"))
    ids2 = {t["pattern"]: t["template_id"] for t in pool2}
    for pattern, tid in ids1.items():
        assert ids2[pattern] == tid  # stable across restart
    assert len(ids2) >= len(ids1)
