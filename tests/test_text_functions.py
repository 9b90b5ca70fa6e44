"""Tests for text-analysis functions, cross-checked against DuckDB where
the driver's oracle will run the same semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.functions.text import (
    BPE_TOKEN_PATTERN,
    fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    shingles,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "der hund ist nicht zu hause und die katze auch nicht",
    "le chat est sur la table et il dort pour une heure",
    "el perro es un animal que vive en la casa",
    "xyzzy qwerty plugh",
    "a b",
    "",
    "hello,   world!! 42 times",
]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "id int, text string")


def test_token_counts(spark, tdf):
    rows = tdf.select(
        "id", token_count_ws(F.col("text")).alias("ws"), token_count_bpe(F.col("text")).alias("bpe")
    ).collect()
    got = {r["id"]: (r["ws"], r["bpe"]) for r in rows}
    assert got[0] == (9, 9)
    assert got[6] == (0, 0)
    # "hello,   world!! 42 times" → ws splits on single spaces; bpe:
    # hello , world ! ! 42 times = 7
    assert got[7][1] == 7


def test_lang_id(spark, tdf):
    rows = tdf.select("id", lang_id(F.col("text")).alias("lang")).collect()
    got = {r["id"]: r["lang"] for r in rows}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"
    assert got[6] == "und"


def test_quality_and_ratios_bounds(spark, tdf):
    rows = tdf.select(
        quality_score(F.col("text")).alias("q"),
        punct_ratio(F.col("text")).alias("p"),
        stopword_ratio(F.col("text")).alias("s"),
        mean_word_length(F.col("text")).alias("m"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0
        assert 0.0 <= r["p"] <= 1.0
        assert 0.0 <= r["s"] <= 1.0
    # stopword-rich English sentence scores higher than gibberish
    q = [r["q"] for r in rows]
    assert q[0] > q[4]


def test_shingles_and_fingerprint(spark, tdf):
    rows = tdf.select(
        "id", shingles(F.col("text"), 3).alias("sh"), fingerprint(F.col("text"), 3).alias("fp")
    ).collect()
    got = {r["id"]: r for r in rows}
    assert got[0]["sh"][0] == "the quick brown"
    assert len(got[0]["sh"]) == 7  # 9 tokens → 7 trigrams
    assert got[5]["sh"] == []  # 2 tokens < 3
    assert got[5]["fp"] is not None  # falls back to md5(text)
    assert len(got[0]["fp"]) == 32


def test_fingerprint_matches_duckdb(spark, tdf):
    """The exact portable formulation the oracle uses."""
    spark_rows = {
        r["id"]: r["fp"]
        for r in tdf.select("id", fingerprint(F.col("text"), 3).alias("fp")).collect()
    }
    con = duckdb.connect()
    con.execute("create table t(id int, text varchar)")
    con.executemany("insert into t values (?, ?)", [(i, t) for i, t in enumerate(TEXTS)])
    duck_rows = dict(
        con.execute(
            """
            with toks as (
              select id, text, list_filter(string_split(trim(text), ' '), x -> x <> '') as tk
              from t
            )
            select id,
              case when len(tk) >= 3 then
                list_min(list_transform(range(1, len(tk) - 1),
                         i -> md5(array_to_string(tk[i:i+2], ' '))))
              else md5(text) end as fp
            from toks
            """
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_token_count_matches_duckdb(spark, tdf):
    spark_rows = {
        r["id"]: (r["ws"], r["bpe"])
        for r in tdf.select(
            "id",
            token_count_ws(F.col("text")).alias("ws"),
            token_count_bpe(F.col("text")).alias("bpe"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("create table t(id int, text varchar)")
    con.executemany("insert into t values (?, ?)", [(i, t) for i, t in enumerate(TEXTS)])
    duck = dict(
        (i, (a, b))
        for i, a, b in con.execute(
            f"""
            select id,
              len(list_filter(string_split(trim(text), ' '), x -> x <> '')),
              len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}'))
            from t
            """
        ).fetchall()
    )
    assert spark_rows == duck


# --- lang_fertility query ----------------------------------------------------


def test_lang_fertility_staged_de_dominates_and_exact_division(spark):
    """The hyphen-compound staging gives de one ws word per doc with
    the bpe count unchanged — its fertility must dwarf every natural
    language; the division is the exact floor of the sums."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = {r["lang"]: r for r in QUERIES["lang_fertility"][0](
        spark, "/root/testdata/sf0.001").collect()}
    de = rows["de"]
    assert de["sum_words"] == de["n_docs"]  # one hyphen-word per doc
    assert de["fertility_e3"] == de["sum_tokens"] * 1000 // de["sum_words"]
    others = [r["fertility_e3"] for lang, r in rows.items() if lang != "de"]
    assert de["fertility_e3"] > 10 * max(others)
    for r in rows.values():
        assert r["fertility_e3"] == r["sum_tokens"] * 1000 // r["sum_words"]
