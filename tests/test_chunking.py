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


# --- token-window chunking ----------------------------------------------

TW_CORPUS = [
    (0, "a b c d e f g h i j"),    # 10 tokens
    (1, "one two three"),          # shorter than a window
    (2, ""),                       # zero tokens -> no rows
    (3, None),                     # NULL -> no rows
    (4, "  x   y  "),              # whitespace runs collapse
    (5, " ".join(f"t{i}" for i in range(25))),  # several windows + tail
]


def _tw_df(spark):
    return spark.createDataFrame(TW_CORPUS, "doc_id bigint, text string")


def test_token_windows_match_python(spark):
    from logparser_llm_spark.operators.chunking import (
        token_window_chunks,
        token_window_py,
    )

    out = token_window_chunks(
        _tw_df(spark), "doc_id", "text", chunk_tokens=4, stride_tokens=3
    ).collect()
    got = sorted((r["doc_id"], r["chunk_idx"], r["start_tok"],
                  r["n_tokens"], r["chunk_text"]) for r in out)
    expect = sorted(
        (i, *row)
        for i, text in TW_CORPUS
        for row in token_window_py(text, chunk_tokens=4, stride_tokens=3)
    )
    assert got == expect
    # zero-token docs emit no rows by contract
    assert {r[0] for r in got} == {0, 1, 4, 5}


def test_token_windows_match_duckdb(spark):
    import duckdb

    from logparser_llm_spark.operators.chunking import (
        token_window_chunks,
        token_window_sql,
    )

    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", TW_CORPUS)
    orows = sorted(map(tuple, con.execute(token_window_sql(
        src="docs", id_col="doc_id", text_col="text",
        chunk_tokens=4, stride_tokens=3,
    )).fetchall()))
    srows = sorted(map(tuple, token_window_chunks(
        _tw_df(spark), "doc_id", "text", chunk_tokens=4, stride_tokens=3
    ).collect()))
    assert srows == orows


def test_token_windows_tail_and_coverage(spark):
    """Every token position is covered by >=1 window; the tail window is
    partial iff n mod stride leaves a remainder shorter than chunk."""
    from logparser_llm_spark.operators.chunking import token_window_py

    rows = token_window_py(" ".join(f"t{i}" for i in range(25)),
                           chunk_tokens=8, stride_tokens=5)
    covered = set()
    for _, st, n, _ in rows:
        covered.update(range(st, st + n))
    assert covered == set(range(25))
    assert rows[-1] == (4, 20, 5, "t20 t21 t22 t23 t24")


def test_token_windows_no_shuffle_no_python(spark):
    """Scan-bound map stage: zero exchanges, nothing in Python."""
    from logparser_llm_spark.operators.chunking import token_window_chunks
    from logparser_llm_spark.plans.inspect import plan_facts

    facts = plan_facts(token_window_chunks(
        _tw_df(spark), "doc_id", "text", chunk_tokens=16, stride_tokens=12
    ))
    assert facts["exchanges"] == 0
    assert not facts["python_udf"] and not facts["map_in_pandas"]


def test_token_windows_validation(spark):
    from logparser_llm_spark.operators.chunking import (
        token_window_chunks,
        token_window_py,
        token_window_sql,
    )

    df = _tw_df(spark)
    with pytest.raises(ValueError, match="ints >= 1"):
        token_window_chunks(df, "doc_id", "text",
                            chunk_tokens=0, stride_tokens=1)
    with pytest.raises(ValueError, match="ints >= 1"):
        token_window_sql(src="d", id_col="i", text_col="t",
                         chunk_tokens=4, stride_tokens=0)
    with pytest.raises(ValueError, match="ints >= 1"):
        token_window_py("a b", chunk_tokens=2, stride_tokens=-1)


def test_registered_chunk_windows_has_multiwindow_docs(spark):
    """At sf0.01 the corpus must produce both multi-window docs and
    partial tails, or the registered query degenerates."""
    from logparser_llm_spark.plans.queries import CHUNK_TOKENS, QUERIES

    out = QUERIES["chunk_windows"][0](spark, "/root/testdata/sf0.01")
    agg = out.groupBy("doc_id").count().agg(
        F.max("count").alias("mx"), F.min("count").alias("mn")).collect()[0]
    assert agg["mx"] >= 3
    tails = out.where(F.col("n_tokens") < CHUNK_TOKENS).count()
    assert tails > 0


def test_token_windows_reserved_id_rejected(spark):
    from logparser_llm_spark.operators.chunking import token_window_chunks

    df = spark.createDataFrame([("a b", 1)], "text string, chunk_idx bigint")
    with pytest.raises(ValueError, match="collides"):
        token_window_chunks(df, "chunk_idx", "text",
                            chunk_tokens=2, stride_tokens=1)
