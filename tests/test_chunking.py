"""Content-defined chunking: three-way parity (python reference / JVM
expression path / Arrow path), the reassembly property, the
edit-realignment property that is CDC's whole point, short/empty/NULL
inputs, and validation contracts. DuckDB parity for the registered
``cdc_dedup`` query runs via test_queries_oracle."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.chunking import (
    cdc_chunks,
    cdc_chunks_py,
    _check_cdc,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
        .cache()
    )


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r[0], []).append((r["chunk_idx"], r["chunk"]))
    return {k: [c for _, c in sorted(v)] for k, v in out.items()}


def test_three_way_parity_on_corpus(spark, docs):
    expr = _collect(cdc_chunks(docs, "doc_id", "text", impl="expr"))
    arrow = _collect(cdc_chunks(docs, "doc_id", "text", impl="arrow"))
    assert expr == arrow
    for r in docs.collect():
        assert expr[r["doc_id"]] == cdc_chunks_py(r["text"]), r["doc_id"]


def test_reassembly_property(spark, docs):
    got = _collect(cdc_chunks(docs, "doc_id", "text"))
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(want)
    for did, chunks in got.items():
        assert "".join(chunks) == want[did]
        assert all(chunks), f"empty chunk in doc {did}"


def test_edit_realignment(spark):
    """The CDC property: after an edit, boundaries realign once the
    window is fully inside shared content — the two versions share
    their tail chunks, which fixed-size chunking never does."""
    shared = (
        "the quick brown fox jumps over the lazy dog while the storage "
        "system deduplicates every shared chunk of this long common tail "
        "that both versions of the document carry verbatim to the very end "
        "so the chunker has hundreds of identical windows to realign inside"
    )
    a = cdc_chunks_py("version one intro " + shared)
    b = cdc_chunks_py("a completely different and much longer preamble " + shared)
    # common suffix of whole chunks
    k = 0
    while k < min(len(a), len(b)) and a[-1 - k] == b[-1 - k]:
        k += 1
    assert k >= 1, (a, b)
    assert sum(len(c) for c in a[-k:]) > len(shared) // 2


def test_short_empty_null(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, None)], "doc_id bigint, text string"
    )
    for impl in ("expr", "arrow"):
        got = _collect(cdc_chunks(df, "doc_id", "text", impl=impl))
        assert got == {1: ["abc"]}, impl  # < w chars -> one chunk; 2/3 dropped
    assert cdc_chunks_py("") == []
    assert cdc_chunks_py("ab") == ["ab"]


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="ints >= 2"):
        cdc_chunks(df, "doc_id", "text", w=1)
    with pytest.raises(ValueError, match="must not exceed"):
        _check_cdc(8, 31, 64, 128)
    with pytest.raises(ValueError, match="impl"):
        cdc_chunks(df, "doc_id", "text", impl="pandas")


def test_registered_query_top_row_is_the_footer_chunk(spark):
    """The seeded footer's interior chunk must appear once per document
    — the demonstration row that makes the dedup mass visible."""
    from logparser_llm_spark.plans.queries import QUERIES

    top = QUERIES["cdc_dedup"][0](spark, SF).first()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert top["n_occ"] == n_docs and top["n_docs"] == n_docs
    assert top["chunk_len"] > 50
