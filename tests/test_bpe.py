"""Distributed BPE tokenizer training: three-way differential (Spark vs
the classic driver-side trainer vs the generated DuckDB unroll), merge
semantics pins, encoder parity, and the registered query's no-early-stop
guarantee at both driver scales."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_py,
    bpe_sql,
    bpe_train,
    bpe_train_py,
    word_counts,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the theme of the thesis is the theory of the throne",
    "low lower lowest newer newest wider widest 123 1234",
    "banana bandana banana anthem theater theater the the the",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_doubled_separator_replace_is_greedy_left_to_right():
    """The merge-application pin: overlapping runs resolve like
    reference BPE's left-to-right scan, in all three engines' plain
    replace (Python here; DuckDB below; Spark via the differential)."""
    assert " a  a  a ".replace(" a  a ", " aa ") == " aa  a "
    assert " a  a  a  a ".replace(" a  a ", " aa ") == " aa  aa "
    assert " b  a  a ".replace(" a  a ", " aa ") == " b  aa "
    con = duckdb.connect()
    assert con.execute("select replace(' a  a  a ', ' a  a ', ' aa ')").fetchone()[0] == " aa  a "


def test_train_spark_matches_python(spark, corpus):
    merges = bpe_train(corpus, "text", num_merges=10, min_pair_count=1)
    wc = {r["word"]: r["cnt"] for r in word_counts(corpus, "text").collect()}
    assert merges == bpe_train_py(wc, num_merges=10, min_pair_count=1)
    # sanity: it actually learns multi-char subwords in order
    assert any(len(m["merged"]) >= 3 for m in merges)
    assert [m["rank"] for m in merges] == list(range(1, len(merges) + 1))


def test_train_matches_duckdb_unroll(spark, corpus):
    merges = bpe_train(corpus, "text", num_merges=8, min_pair_count=1)
    con = duckdb.connect()
    con.execute("create table t (text varchar)")
    for t in TEXTS:
        con.execute("insert into t values (?)", [t])
    rows = con.execute(
        f"with {bpe_sql('t', 'text', num_merges=8)} "
        "select * from bpe_merges order by rank"
    ).fetchall()
    assert rows == [
        (m["rank"], m["lhs"], m["rhs"], m["merged"], m["pair_count"]) for m in merges
    ]


def test_early_stop_and_validation(spark):
    tiny = spark.createDataFrame([("ab zz",)], "text string")
    # pairs: (a,b) x1, (z,z) x1 — min_pair_count=2 stops before any merge
    assert bpe_train(tiny, "text", num_merges=5, min_pair_count=2) == []
    assert bpe_train_py({"ab": 1, "zz": 1}, num_merges=5, min_pair_count=2) == []
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(tiny, "text", num_merges=0)
    with pytest.raises(ValueError, match="min_pair_count"):
        bpe_train_py({"a": 1}, num_merges=1, min_pair_count=0)


def test_tiebreak_is_lexicographic(spark):
    """Equal-count pairs must resolve (l asc, r asc) — the cross-engine
    determinism contract."""
    df = spark.createDataFrame([("xy xy za za",)], "text string")
    merges = bpe_train(df, "text", num_merges=1, min_pair_count=1)
    assert (merges[0]["lhs"], merges[0]["rhs"]) == ("x", "y")  # 'x' < 'z'


def test_encode_matches_python_and_counts(spark, corpus):
    merges = bpe_train(corpus, "text", num_merges=10, min_pair_count=1)
    out = bpe_encode(corpus, "text", merges).collect()
    for r in out:
        exp = bpe_encode_py(r["text"], merges)
        assert r["bpe_tokens"] == exp
        assert r["n_bpe_tokens"] == len(exp)
    # encoding with zero merges = plain character tokens
    chars = bpe_encode(corpus, "text", []).collect()[0]
    assert all(len(t) == 1 for t in chars["bpe_tokens"])


def test_encode_stays_jvm(spark, corpus):
    from logparser_llm_spark.plans.inspect import plan_facts

    merges = bpe_train(corpus, "text", num_merges=4, min_pair_count=1)
    facts = plan_facts(bpe_encode(corpus, "text", merges))
    assert not facts["python_udf"] and not facts["map_in_pandas"]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_never_early_stops(spark, sf):
    """The unrolled DuckDB oracle has no early stop, so the registered
    corpus must support all BPE_QUERY_MERGES merges above the
    threshold — asserted at both driver scales."""
    from logparser_llm_spark.plans.queries import BPE_QUERY_MERGES, QUERIES

    rows = QUERIES["bpe_merges"][0](spark, sf).collect()
    assert len(rows) == BPE_QUERY_MERGES
    assert all(r["pair_count"] >= 2 for r in rows)
