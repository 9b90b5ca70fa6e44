"""Multimodal plumbing tests: binary columns through mapInPandas with the
deterministic fake codecs (real codecs are stubbed — no image libs here)."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.multimodal import (
    frame_sample,
    image_features,
)
from logparser_llm_spark.sources.synth import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 50, seed=9).cache()


def test_image_features_schema_and_determinism(spark, pages):
    feats = image_features(pages.withColumn("doc_id", F.monotonically_increasing_id()),
                           id_col="doc_id", binary_col="html", dim=16)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["feature"]) == 16
        assert r["width"] >= 64 and r["height"] >= 64
        assert r["format"] in ("jpeg", "png", "webp")
        norm = sum(v * v for v in r["feature"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-3)
    # determinism across partitionings
    again = image_features(
        pages.withColumn("doc_id", F.monotonically_increasing_id()).repartition(7),
        id_col="doc_id", binary_col="html", dim=16,
    ).collect()
    assert {r["doc_id"]: r["feature"] for r in rows} == {r["doc_id"]: r["feature"] for r in again}


def test_image_features_null_binary(spark):
    df = spark.createDataFrame([(1, None), (2, b"abc")], "doc_id bigint, html binary")
    rows = image_features(df, dim=8).collect()
    assert len(rows) == 2  # nulls don't crash; deterministic fallback


def test_real_decoder_is_clearly_stubbed(spark):
    df = spark.createDataFrame([(1, b"xyz")], "doc_id bigint, html binary")
    with pytest.raises(Exception) as exc_info:
        image_features(df, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling(spark, pages):
    frames = frame_sample(
        pages.withColumn("doc_id", F.monotonically_increasing_id()),
        id_col="doc_id", binary_col="html", every_n=2, max_frames=3,
    )
    rows = frames.collect()
    assert len(rows) > 50  # 1→N explode shape
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    for nos in by_doc.values():
        assert nos == sorted(nos) or sorted(nos) == nos
        assert all(n % 2 == 0 for n in nos)
        assert len(nos) <= 3
