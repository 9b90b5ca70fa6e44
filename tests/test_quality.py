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


# --- Gopher A1.1 rules ------------------------------------------------------


def _gopher(spark, text):
    from logparser_llm_spark.functions.quality import (
        gopher_rule_cols,
        gopher_signal_cols,
    )

    df = spark.createDataFrame([(text,)], "t string")
    sig = gopher_signal_cols(F.col("t"))
    named = {**sig, **gopher_rule_cols(sig)}
    return df.select(*[v.alias(k) for k, v in named.items()]).collect()[0].asDict()


def test_gopher_all_rules_pass_on_clean_doc(spark):
    text = " ".join(["word"] * 58 + ["the", "of"])
    r = _gopher(spark, text)
    assert r["n_words"] == 60 and r["n_stop_distinct"] == 2
    assert r["keep"] and all(v for k, v in r.items() if k.startswith("ok_"))


def test_gopher_each_rule_trips_alone(spark):
    base = " ".join(["word"] * 58 + ["the", "of"])
    # too few words
    assert not _gopher(spark, "the of tiny doc here")["ok_words"]
    # symbol ratio: 7 hashes over 60 words → 70 > 60
    r = _gopher(spark, base + " # # # # # # #")
    assert not r["ok_symbol"] and r["n_hash"] == 7
    # >90% bullet lines (10 of 11)
    r = _gopher(spark, "• a b\n" * 10 + base)
    assert not r["ok_bullet"] and r["n_bullet_lines"] == 10 and r["n_lines"] == 11
    # >30% ellipsis-ended lines (1 of 2), and '...' counts as symbols too
    r = _gopher(spark, "to be continued...\n" + base)
    assert not r["ok_ellipsis_end"] and r["n_ellipsis_end"] == 1
    assert r["n_ellipsis"] == 1
    # <80% alphabetic words
    r = _gopher(spark, base + " " + " ".join(str(i) for i in range(20)))
    assert not r["ok_alpha"]
    # mean word length out of [3, 10] both ways
    assert not _gopher(spark, "a b " * 30)["ok_mean_len"]
    assert not _gopher(spark, "abcdefghijklmnopqrstu " * 60)["ok_mean_len"]
    # fewer than 2 distinct stop words (repeats don't count twice)
    assert not _gopher(spark, " ".join(["word"] * 59 + ["the"]))["ok_stop"]
    assert _gopher(spark, " ".join(["word"] * 58 + ["the", "the"]))["n_stop_distinct"] == 1


def test_gopher_newlines_split_words_blank_lines_dropped(spark):
    r = _gopher(spark, "alpha\nbeta\n\n   \ngamma delta")
    assert r["n_words"] == 4
    assert r["n_lines"] == 3  # blank / whitespace-only lines don't count


def test_gopher_query_flags_vary_at_sf001(spark):
    """Every rule flag must carry BOTH verdicts on the seeded corpus —
    otherwise a flipped comparison could hide behind a constant column
    (the 100k max-words bound excepted: unreachable at sf scale)."""
    from logparser_llm_spark.plans.queries import q_gopher_rules

    rows = q_gopher_rules(spark, "/root/testdata/sf0.01").collect()
    for c in [k for k in rows[0].asDict() if k.startswith("ok_")] + ["keep"]:
        assert {r[c] for r in rows} == {True, False}, c


# --- C4 line/page cleaning --------------------------------------------------


def _c4(spark, text):
    from logparser_llm_spark.functions.quality import c4_stats_cols

    df = spark.createDataFrame([(text,)], "t string")
    stats = c4_stats_cols(F.col("t"))
    return df.select(*[v.alias(k) for k, v in stats.items()]).collect()[0].asDict()


def _c4_clean_text(spark, text):
    from logparser_llm_spark.functions.quality import c4_kept_lines

    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        F.array_join(c4_kept_lines(F.col("t")), "\n").alias("c")
    ).collect()[0]["c"]


def test_c4_line_rules(spark):
    keep1 = "One two three four five."
    keep2 = 'He said "all five words fit here."'
    page = "\n".join(
        [
            keep1,
            "Too short.",                                 # <5 words
            "no terminal punctuation here at all okay",   # no terminal punct
            "Enable JavaScript for this site now.",       # javascript (any case)
            keep2,
            "Third full sentence stays right here.",
        ]
    )
    r = _c4(spark, page)
    assert (r["n_lines"], r["n_kept_lines"], r["n_sentences"]) == (6, 3, 3)
    assert r["page_kept"]
    # retained text preserves original line ORDER (md5 is order-exact)
    assert _c4_clean_text(spark, page) == "\n".join(
        [keep1, keep2, "Third full sentence stays right here."]
    )


def test_c4_page_rules_read_the_raw_page(spark):
    three = (
        "First sentence has five good words.\n"
        "Second sentence has five good words.\n"
        "Third sentence has five good words."
    )
    assert _c4(spark, three)["page_kept"]
    # lorem ipsum anywhere kills the page even though every line is valid
    r = _c4(spark, three + "\nThis page is lorem ipsum filler content honestly.")
    assert not r["page_kept"] and r["n_kept_lines"] == 4
    # a curly brace kills the page even on a line the filter already drops
    assert not _c4(spark, three + "\nvar x = { a: 1 };")["page_kept"]
    # fewer than 3 sentences retained → page dropped
    assert not _c4(spark, "Only one good sentence lives here.")["page_kept"]


def test_c4_query_verdicts_vary_at_sf001(spark):
    from logparser_llm_spark.plans.queries import q_c4_clean

    rows = q_c4_clean(spark, "/root/testdata/sf0.01").collect()
    assert {r["page_kept"] for r in rows} == {True, False}
    assert len({r["n_kept_lines"] for r in rows}) >= 2


# --- Gopher A1.2 repetition rules --------------------------------------------


def _rep(spark, text):
    from logparser_llm_spark.functions.quality import gopher_repetition

    df = spark.createDataFrame([(1, text)], "doc_id bigint, t string")
    return gopher_repetition(df, "doc_id", "t").collect()[0].asDict()


def test_repetition_dup_lines_count_all_members(spark):
    # [a, a, b]: 2 duplicate lines (both members), not 1
    r = _rep(spark, "same line here\nsame line here\nunique line")
    assert (r["n_lines"], r["dup_lines"]) == (3, 2)
    assert r["dup_line_chars"] == 2 * len("same line here")
    assert not r["ok_dup_lines"]          # 20 > 3*3
    assert not r["ok_dup_line_chars"]     # 280 > 2*(14+14+11)
    # no duplicate paragraphs (single paragraph)
    assert r["n_paras"] == 1 and r["dup_paras"] == 0 and r["ok_dup_paras"]


def test_repetition_dup_paragraphs(spark):
    r = _rep(spark, "para one body\n\npara two body\n\npara one body")
    assert (r["n_paras"], r["dup_paras"]) == (3, 2)
    assert r["dup_para_chars"] == 2 * len("para one body")
    assert not r["ok_dup_paras"]
    # lines: all three lines distinct? no — 'para one body' twice
    assert r["dup_lines"] == 2


def test_repetition_top_ngram_mass(spark):
    # tokens [x, y, x, y, x, y]: 'x y' occurs 3×, len 3 → mass 9 of 6 word chars
    r = _rep(spark, "x y x y x y")
    assert r["word_chars"] == 6 and r["top2_chars"] == 9
    assert not r["ok_top2"]               # 900 > 120
    # 'x y x' occurs 2×, len 5 → mass 10
    assert r["top3_chars"] == 10 and not r["ok_top3"]
    # a LONG diverse text passes both gram rules (on a short doc ANY
    # single 2-gram exceeds 20% of the chars — the rule presumes
    # Gopher-scale documents, which is faithful to the paper)
    ok = _rep(spark, " ".join(f"word{i:03d}" for i in range(40)))
    assert ok["ok_top2"] and ok["ok_top3"] and ok["keep"]


def test_repetition_short_and_empty_docs(spark):
    r = _rep(spark, "one")
    assert r["top2_chars"] == 0 and r["top3_chars"] == 0 and r["keep"]
    r = _rep(spark, "")
    assert r["n_lines"] == 0 and r["keep"]


def test_gopher_repetition_query_flags_vary_at_sf001(spark):
    from logparser_llm_spark.plans.queries import q_gopher_repetition

    rows = q_gopher_repetition(spark, "/root/testdata/sf0.01").collect()
    for c in [k for k in rows[0].asDict() if k.startswith("ok_")] + ["keep"]:
        assert {r[c] for r in rows} == {True, False}, c


def test_c4_sql_fully_dropped_page_matches_spark_empties(spark):
    """Review r5: DuckDB's array_to_string([]) is NULL while Spark's
    array_join([]) is '' — a page with zero kept lines must yield
    md5('')/0/false on BOTH sides."""
    import hashlib

    import duckdb

    from logparser_llm_spark.functions.quality import c4_sql, c4_stats_cols

    page = "no terminal punctuation here\nToo short."
    con = duckdb.connect()
    sql = c4_sql(f"select 1 as doc_id, '{page.replace(chr(10), chr(39)+' || chr(10) || '+chr(39))}' as t")
    n_lines, n_kept, n_sent, kept, md5 = con.execute(sql).fetchall()[0][1:]
    df = spark.createDataFrame([(page,)], "t string")
    stats = c4_stats_cols(F.col("t"))
    r = df.select(*[v.alias(k) for k, v in stats.items()]).collect()[0]
    assert (r["n_lines"], r["n_kept_lines"], r["n_sentences"], r["page_kept"]) == (
        n_lines, n_kept, n_sent, kept
    ) == (2, 0, 0, False)
    assert r["clean_md5"] == md5 == hashlib.md5(b"").hexdigest()


def test_c4_clean_frame_equals_stats_cols(spark):
    """The staged hot-path form must be row-identical to the semantic
    single-projection definition on every seed class."""
    from logparser_llm_spark.functions.quality import c4_clean_frame, c4_stats_cols
    from logparser_llm_spark.plans.queries import _c4_seed_col

    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), _c4_seed_col().alias("t"))
    )
    staged = {tuple(r) for r in c4_clean_frame(d, "doc_id", "t").collect()}
    stats = c4_stats_cols(F.col("t"))
    plain = {
        tuple(r)
        for r in d.select("doc_id", *[v.alias(k) for k, v in stats.items()]).collect()
    }
    assert staged == plain


# --- C4 badwords filter ---------------------------------------------------

def test_badwords_token_boundary_case_and_counts(spark):
    from logparser_llm_spark.functions.quality import badwords_cols

    rows = [
        (0, "clean text only"),
        (1, "so badwordx happened"),            # plain token hit
        (2, "so badwordx, happened"),           # punctuation-adjacent hit
        (3, "BADWORDX shouted"),                # case-folded hit
        (4, "xbadwordx is a different token"),  # substring must NOT match
        (5, "badwordx badwordx nastyterm"),     # three occurrences
        (6, "a forbidden phrase and a FORBIDDEN PHRASE"),  # 2 phrase hits
        (7, ""),
        (8, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, t string")
    sig = badwords_cols(
        F.col("t"), words=("badwordx", "nastyterm"),
        phrases=("forbidden phrase",),
    )
    got = {
        r["doc_id"]: (r["n_bad_words"], r["n_bad_phrases"], r["ok_badwords"])
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in sig.items()]
        ).collect()
    }
    assert got[0] == (0, 0, True)
    assert got[1] == (1, 0, False)
    assert got[2] == (1, 0, False)
    assert got[3] == (1, 0, False)
    assert got[4] == (0, 0, True)
    assert got[5] == (3, 0, False)
    assert got[6] == (0, 2, False)
    assert got[7] == (0, 0, True)
    assert got[8] == (0, 0, True)  # NULL text reads as empty: no hits


def test_badwords_matches_duckdb(spark):
    import duckdb

    from logparser_llm_spark.functions.quality import badwords_cols, badwords_sql

    rows = [(i, t) for i, t in enumerate([
        "clean", "badwordx", "two badwordx badwordx", "FORBIDDEN phrase",
        "a forbidden phrase twice forbidden phrase", "", None,
        "nastyterm, and badwordx.",
    ])]
    df = spark.createDataFrame(rows, "doc_id bigint, t string")
    sig = badwords_cols(F.col("t"), words=("badwordx", "nastyterm"),
                        phrases=("forbidden phrase",))
    srows = sorted(
        (r["doc_id"], r["n_bad_words"], r["n_bad_phrases"], r["ok_badwords"])
        for r in df.select("doc_id", *[v.alias(k) for k, v in sig.items()]).collect()
    )
    con = duckdb.connect()
    con.execute("create table src (doc_id bigint, t varchar)")
    con.executemany("insert into src values (?, ?)", rows)
    orows = sorted(map(tuple, con.execute(badwords_sql(
        "select doc_id, t from src", words=("badwordx", "nastyterm"),
        phrases=("forbidden phrase",),
    )).fetchall()))
    assert srows == orows


def test_badwords_validation(spark):
    from logparser_llm_spark.functions.quality import badwords_cols, badwords_sql

    with pytest.raises(ValueError, match="empty"):
        badwords_cols(F.col("t"), words=())
    with pytest.raises(ValueError, match="single tokens"):
        badwords_cols(F.col("t"), words=("BadWord",))
    with pytest.raises(ValueError, match="single tokens"):
        badwords_cols(F.col("t"), words=("two words",))
    with pytest.raises(ValueError, match="lowercase"):
        badwords_sql("select 1", words=("ok",), phrases=("Mixed Case",))
    with pytest.raises(ValueError, match="single tokens"):
        badwords_cols(F.col("t"), words=("don't",))
    with pytest.raises(ValueError, match="single tokens"):
        # a hyphenated word could never match any [a-z0-9]+ token —
        # must be rejected loudly, not silently never fire
        badwords_cols(F.col("t"), words=("bad-word",))
    with pytest.raises(ValueError, match="quote-free"):
        badwords_sql("select 1", words=("ok",), phrases=("o'clock phrase",))


def test_badwords_plan_is_scan_bound(spark):
    from logparser_llm_spark.plans.inspect import plan_facts
    from logparser_llm_spark.plans.queries import QUERIES

    df = QUERIES["c4_badwords"][0](spark, "/root/testdata/sf0.01")
    facts = plan_facts(df)
    assert facts["exchanges"] == 0
    assert not facts["python_udf"] and not facts["map_in_pandas"]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_badwords_query_has_both_verdicts(spark, sf):
    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["c4_badwords"][0](spark, sf)
    classes = {r["ok_badwords"] for r in out.select("ok_badwords").distinct().collect()}
    assert classes == {True, False}
    # word AND phrase signals must both fire somewhere
    agg = out.agg(F.max("n_bad_words").alias("w"),
                  F.max("n_bad_phrases").alias("p")).collect()[0]
    assert agg["w"] >= 2 and agg["p"] >= 1


# --- readability (functions/quality.py, r5 fifteenth arc) ------------------


def test_readability_matches_python_reference(spark):
    from logparser_llm_spark.functions.quality import (
        readability_frame,
        readability_py,
    )

    rows = [
        (0, "The cat sat. The dog ran. It is fun."),
        (1, "Extraordinary incomprehensibility demonstrating terminology"),
        (2, ""), (3, None),
        (4, "123 456 789."),                 # vowel-less words count 1 each
        (5, "no terminal punctuation here"),  # sentence clamp to 1
        (6, "Mixed CASE Vowels! And... ellipses?? plus 42 numbers."),
        (7, "..."),                           # punctuation-only "word"
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(tuple(r) for r in readability_frame(df, "id", "text").collect())
    assert got == sorted((i,) + readability_py(t) for i, t in rows)
    by_id = {g[0]: g for g in got}
    assert by_id[2][1:] == (0, 0, 0, None, None)   # empty → NULL scores
    assert by_id[3][1:] == (0, 0, 0, None, None)   # NULL → NULL scores
    assert by_id[4][3] == 3                        # one syllable per number
    assert by_id[5][2] == 1                        # clamped sentence count


def test_readability_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.functions.quality import (
        readability_frame,
        readability_sql,
    )

    rows = [(0, "Simple words are easy to read. Yes."),
            (1, "Overqualification notwithstanding, bureaucratization persists."),
            (2, None), (3, "one"), (4, "Y y Y y."), (5, "rhythm myth gym.")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(tuple(r) for r in readability_frame(df, "id", "text").collect())
    con = duckdb.connect()
    con.execute("create table t (id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    sql = readability_sql("select id as doc_id, text from t",
                          text_col="text", id_col="doc_id")
    assert got == sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_readability_plan_is_scan_bound(spark):
    from logparser_llm_spark.plans.inspect import plan_facts
    from logparser_llm_spark.plans.queries import QUERIES

    df = QUERIES["readability"][0](spark, "/root/testdata/sf0.01")
    facts = plan_facts(df)
    assert facts["exchanges"] == 0
    assert not facts["python_udf"] and not facts["map_in_pandas"]


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_readability_query_class_contrast(spark, sf):
    """Seeded classes: the polysyllabic sentence (%13=1) must out-grade
    the simple sentences (%13=0) and read harder (lower ease); both
    seeded classes are constant strings so they score constant; raw
    text scores non-NULL wherever it has words."""
    from logparser_llm_spark.functions.quality import readability_py
    from logparser_llm_spark.plans.queries import (
        _RD_COMPLEX,
        _RD_SIMPLE,
        QUERIES,
    )

    rows = QUERIES["readability"][0](spark, sf).collect()
    simple = {tuple(r)[1:] for r in rows if r["doc_id"] % 13 == 0}
    complex_ = {tuple(r)[1:] for r in rows if r["doc_id"] % 13 == 1}
    assert simple == {readability_py(_RD_SIMPLE)}, sf
    assert complex_ == {readability_py(_RD_COMPLEX)}, sf
    (s,), (c,) = simple, complex_
    assert c[3] > s[3] and c[4] < s[4], sf  # fk higher, ease lower
    text = [r for r in rows if r["doc_id"] % 13 > 1]
    assert text and all(r["fk_grade_e6"] is not None for r in text
                        if r["n_words"] > 0), sf


# --- wilson_lower_e6 (host quality ranking) ---------------------------------


def test_wilson_known_values_and_small_sample_honesty(spark):
    """The canonical sort-by-best property: 180/200 outranks 2/2; the
    bound is 0 exactly at k=0 and strictly below the raw proportion."""
    from logparser_llm_spark.functions.quality import wilson_lower_e6_py

    import math

    def textbook(k, n, z=1.96):  # the classic p-hat spelling
        p = k / n
        return (p + z * z / (2 * n)
                - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) \
            / (1 + z * z / n)

    big = wilson_lower_e6_py(180, 200)
    tiny = wilson_lower_e6_py(2, 2)
    assert big > tiny, (big, tiny)
    assert abs(big - round(1e6 * textbook(180, 200))) <= 2
    assert abs(tiny - round(1e6 * textbook(2, 2))) <= 2
    assert wilson_lower_e6_py(0, 7) == 0
    assert 0 < wilson_lower_e6_py(7, 7) < 1_000_000
    assert wilson_lower_e6_py(90, 100) < 900_000


def test_wilson_spark_duckdb_python_trilateral(spark):
    """All three spellings of the one-sqrt-two-division expression are
    bit-identical across a (k, n) grid — sqrt/div are correctly
    rounded, so zero tolerance."""
    import duckdb

    from logparser_llm_spark.functions.quality import (
        wilson_lower_e6,
        wilson_lower_e6_py,
        wilson_lower_e6_sql,
    )

    grid = [(k, n) for n in (1, 2, 3, 7, 20, 60, 199, 10_000, 10**9, 4 * 10**9)
            for k in {0, 1, n // 3, n // 2, n - 1, n} if 0 <= k <= n]
    df = spark.createDataFrame(grid, "k long, n long")
    got = {(r["k"], r["n"]): r["w"] for r in df.select(
        "k", "n", wilson_lower_e6(F.col("k"), F.col("n")).alias("w")
    ).collect()}
    con = duckdb.connect()
    con.execute("create table t (k bigint, n bigint)")
    con.executemany("insert into t values (?, ?)", grid)
    duck = {(k, n): w for k, n, w in con.execute(
        f"select k, n, {wilson_lower_e6_sql('k', 'n')} from t").fetchall()}
    for k, n in grid:
        assert got[(k, n)] == duck[(k, n)] == wilson_lower_e6_py(k, n), (k, n)
    # monotone in k at fixed n
    ws = [wilson_lower_e6_py(k, 60) for k in range(61)]
    assert ws == sorted(ws) and ws[0] == 0


def test_wilson_validation(spark):
    import pytest as _pytest

    from logparser_llm_spark.functions.quality import (
        wilson_lower_e6,
        wilson_lower_e6_sql,
    )

    with _pytest.raises(ValueError, match="rational"):
        wilson_lower_e6(F.lit(1), F.lit(2), z_num=-1, z_den=25)
    with _pytest.raises(ValueError, match="rational"):
        wilson_lower_e6_sql("k", "n", z_num=49, z_den=0)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_host_wilson_registered_classes(spark, sf):
    """src0 is 100% one blob family (n_kept = 1) and must rank LAST;
    every wilson value equals the python reference recomputed from the
    row's own (n_kept, n_docs); rank is the exact (wilson desc, source)
    permutation of 1..20."""
    from logparser_llm_spark.functions.quality import wilson_lower_e6_py
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["host_wilson"][0](spark, sf).collect()
    assert len(rows) == 20, sf
    by_src = {r["source"]: r for r in rows}
    assert by_src["src0"]["n_kept"] == 1, sf
    assert by_src["src0"]["rank"] == 20, sf
    for r in rows:
        assert r["wilson_e6"] == wilson_lower_e6_py(r["n_kept"], r["n_docs"]), r
    order = sorted(rows, key=lambda r: (-r["wilson_e6"], r["source"]))
    assert [r["rank"] for r in order] == list(range(1, 21)), sf
    # dup mass descends with host index: a high host keeps more than src1
    assert by_src["src19"]["wilson_e6"] > by_src["src1"]["wilson_e6"], sf
