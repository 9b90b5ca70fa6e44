"""Bigram-LM perplexity scoring: Spark vs driver-side Python reference,
DuckDB-regenerated oracle parity at unit scale, the exact normalization
identity, validation contracts, partition invariance, and the
registered query's both-classes invariant at sf0.01 and sf0.1."""

import duckdb
import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.operators.lm import (
    lm_score_bigram,
    lm_score_py,
    lm_score_sql,
    lm_train_bigram,
    lm_train_py,
)

# OOV words, unseen contexts, repeated bigrams, <2-token docs, empty and
# NULL text, punctuation-only, case folding
CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox sat on the mat"),
    (2, "The QUICK brown dog jumps over the quick fox"),
    (3, "a completely different sentence about spark shuffles"),
    (4, "the the the the the"),
    (5, "zzz unseen words qqq everywhere xxx"),   # OOV-heavy
    (6, "singleton"),                              # 1 token -> 0 bigrams
    (7, ""),                                       # empty
    (8, None),                                     # NULL
    (9, "!!! ... ???"),                            # punctuation-only
    (10, "fox the"),                               # seen words, unseen bigram
]
TRAIN_IDS = {0, 1, 2, 3, 4}


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    train = df.where(F.col("doc_id").isin(*TRAIN_IDS))
    bigrams, contexts, v = lm_train_bigram(train, "text")
    return df, bigrams, contexts, v


def test_train_matches_python(model):
    df, bigrams, contexts, v = model
    pb, pc, pv = lm_train_py([t for i, t in CORPUS if i in TRAIN_IDS])
    got_b = {(r["w1"], r["w2"]): r["c12"] for r in bigrams.collect()}
    got_c = {r["w1"]: r["c1"] for r in contexts.collect()}
    assert got_b == dict(pb)
    assert got_c == dict(pc)
    assert v == pv


def test_normalization_identity_exact_integers(model):
    """Σ_{w2∈V} (c12·kd + kn) == c1·kd + kn·V per context, in exact
    integers — the property that makes c1 = Σ_w2 c12 (bigram-context
    counts, not raw unigram counts) the right denominator."""
    _, bigrams, contexts, v = model
    kd, kn = 10, 1
    sums = {r["w1"]: r["s"] for r in (
        bigrams.groupBy("w1").agg(F.sum(F.col("c12") * kd).alias("s")).collect()
    )}
    for r in contexts.collect():
        present = sums[r["w1"]]
        n_present = bigrams.where(F.col("w1") == r["w1"]).count()
        total = present + kn * n_present + kn * (v - n_present)
        assert total == r["c1"] * kd + kn * v


def test_score_matches_python(model):
    df, bigrams, contexts, v = model
    pb, pc, pv = lm_train_py([t for i, t in CORPUS if i in TRAIN_IDS])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_e6"], r["nll_per_gram_e6"])
        for r in lm_score_bigram(df, "doc_id", "text", bigrams, contexts, v).collect()
    }
    assert set(got) == {i for i, _ in CORPUS}, "every doc must survive scoring"
    for i, t in CORPUS:
        assert got[i] == lm_score_py(t or "", pb, pc, pv), f"doc {i}"


def test_score_matches_duckdb_unit_scale(model, spark):
    df, bigrams, contexts, v = model
    sdf = lm_score_bigram(df, "doc_id", "text", bigrams, contexts, v)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "create table documents(doc_id bigint, text varchar)"
    )
    con.executemany("insert into documents values (?, ?)", CORPUS)
    sql = lm_score_sql(
        train_where="doc_id in (0, 1, 2, 3, 4)", score_from="documents",
        id_col="doc_id", text_col="text",
    )
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == drows


def test_partition_invariance(model, spark):
    df, bigrams, contexts, v = model
    one = lm_score_bigram(
        df.repartition(1), "doc_id", "text", bigrams, contexts, v
    ).collect()
    eight = lm_score_bigram(
        df.repartition(8), "doc_id", "text", bigrams, contexts, v
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, eight))


def test_validation_contracts(model, spark):
    df, bigrams, contexts, v = model
    with pytest.raises(ValueError, match="positive rational"):
        lm_score_bigram(df, "doc_id", "text", bigrams, contexts, v, k_num=0)
    with pytest.raises(ValueError, match="positive rational"):
        lm_score_sql(train_where="1=1", score_from="documents",
                     id_col="doc_id", text_col="text", k_den=-1)
    empty = spark.createDataFrame([(0, "!!!")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm_train_bigram(empty, "text")


def test_scoring_stays_jvm(model):
    """No Python UDF anywhere in the scoring plan."""
    df, bigrams, contexts, v = model
    plan = lm_score_bigram(
        df, "doc_id", "text", bigrams, contexts, v
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_registered_query_keeps_both_classes(spark, sf):
    """The keep cutoff must actually split the corpus at BOTH driver
    scales, or the registered query degenerates to a constant column."""
    from logparser_llm_spark.plans.queries import QUERIES

    out = QUERIES["lm_quality"][0](spark, sf)
    classes = {r["keep"] for r in out.select("keep").distinct().collect()}
    assert classes == {True, False}


# --- Stupid Backoff (r5 sixteenth arc) ---------------------------------------


def test_sb_matches_python_reference_all_branches(spark):
    from logparser_llm_spark.operators.lm import (
        sb_score_py,
        sb_score_trigram,
        sb_train_py,
        sb_train_trigram,
    )

    train = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat sleeps",
        "alpha beta gamma delta",
    ]
    score = [
        (0, "the quick brown fox"),          # all trigrams seen → branch 0
        (1, "zzz quick brown fox"),          # unseen tri, seen bigram → 1
        (2, "quick brown qqqunknown"),       # unseen tri+bi, unseen uni → 2
        (3, "alpha beta gamma"),             # branch 0 from second doc
        (4, "xy"),                           # <3 tokens → zero row
        (5, None),                           # NULL → zero row
        (6, "the quick brown fox zzz quick brown qqqunknown"),  # mixed
    ]
    tdf = spark.createDataFrame([(t,) for t in train], "text string")
    grams, n = sb_train_trigram(tdf, "text")
    sdf = spark.createDataFrame(score, "id long, text string")
    got = {r["id"]: tuple(r)[1:]
           for r in sb_score_trigram(sdf, "id", "text", grams, n).collect()}
    tri, big, uni, n_py = sb_train_py(train)
    assert n == n_py
    want = {i: sb_score_py(t or "", tri, big, uni, n_py) for i, t in score}
    assert got == want
    assert got[0][3:] == (2, 0, 0)   # (n_tri, n_bi, n_uni)
    assert got[1][3:] == (1, 1, 0)
    assert got[2][4:] == (0, 1)      # last position is the unknown-uni branch
    assert got[4] == (0, 0, 0, 0, 0, 0)
    assert got[5] == (0, 0, 0, 0, 0, 0)


def test_sb_train_empty_corpus_raises(spark):
    from logparser_llm_spark.operators.lm import sb_train_trigram

    df = spark.createDataFrame([("",), (None,)], "text string")
    with pytest.raises(ValueError, match="no tokens"):
        sb_train_trigram(df, "text")


def test_sb_score_plan_reuses_persisted_grams(spark):
    from logparser_llm_spark.plans.inspect import physical_plan
    from logparser_llm_spark.plans.queries import QUERIES

    plan = physical_plan(
        QUERIES["sb_quality"][0](spark, "/root/testdata/sf0.01")
    )
    assert plan.count("InMemoryTableScan") >= 3  # tri / big / uni consumers
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_sb_quality_branch_classes(spark, sf):
    """The seeded corpus pins every backoff branch: in-train docs are
    pure branch 0 (their trigrams ARE the model); %10=8 docs hit the
    trained bigram backoff; %10=9 docs hit the unknown-unigram clamp."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["sb_quality"][0](spark, sf).collect()
    intrain = [r for r in rows if r["doc_id"] % 10 < 8]
    b8 = [r for r in rows if r["doc_id"] % 10 == 8]
    b9 = [r for r in rows if r["doc_id"] % 10 == 9]
    assert intrain and b8 and b9, sf
    for r in intrain:
        assert r["n_bi"] == 0 and r["n_uni"] == 0, (sf, r)
        assert r["n_terms"] == r["n_tri"], (sf, r)
    for r in b8:
        assert (r["n_tri"], r["n_bi"], r["n_uni"]) == (0, 1, 0), (sf, r)
    for r in b9:
        assert (r["n_tri"], r["n_bi"], r["n_uni"]) == (0, 0, 1), (sf, r)
        # the clamp branch scores the hapax at exactly ln(25N/4) e6 —
        # reproduce it from the model size
        assert r["sb_nll_e6"] > 0, (sf, r)


# --- ppl_buckets (CCNet head/middle/tail terciles) ---------------------------


def test_ppl_buckets_exact_tercile_law_and_ties(spark):
    """Scores 1..9 with one doc each split cleanly 3/3/3; a tie group
    straddling the head boundary moves WHOLESALE to middle (the cut is
    a score VALUE, never a row index), leaving head legitimately
    empty."""
    from logparser_llm_spark.operators.lm import ppl_buckets

    clean = spark.createDataFrame(
        [(i, "g", i) for i in range(1, 10)], "id long, g string, s long"
    )
    got = {r["id"]: r["bucket"] for r in ppl_buckets(clean, "g", "s").collect()}
    assert got == {1: "head", 2: "head", 3: "head",
                   4: "middle", 5: "middle", 6: "middle",
                   7: "tail", 8: "tail", 9: "tail"}

    tied = spark.createDataFrame(
        [(0, "g", 1), (1, "g", 1), (2, "g", 1), (3, "g", 1),
         (4, "g", 2), (5, "g", 3)],
        "id long, g string, s long",
    )  # cum(1)=4, 4*3 > 6 → the whole tie block lands in middle
    gt = {r["id"]: r["bucket"] for r in ppl_buckets(tied, "g", "s").collect()}
    assert gt == {0: "middle", 1: "middle", 2: "middle", 3: "middle",
                  4: "tail", 5: "tail"}


def test_ppl_buckets_groups_are_independent(spark):
    """Each language is cut against ITS OWN distribution — the same
    score can be head in a slow language and tail in a fast one."""
    from logparser_llm_spark.operators.lm import ppl_buckets

    rows = [(i, "hi", 100 + i) for i in range(9)] + \
           [(100 + i, "lo", 92 + i) for i in range(9)]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    got = {r["id"]: r["bucket"] for r in ppl_buckets(df, "g", "s").collect()}
    assert got[100] == "head" and got[108] == "tail"
    assert got[0] == "head" and got[8] == "tail"
    # score 100: head within 'hi' (its lowest), tail within 'lo'
    assert got[0] == "head" and got[100 + 8] == "tail"


def test_ppl_buckets_matches_duckdb_unit_scale(spark):
    import duckdb

    from logparser_llm_spark.operators.lm import ppl_buckets, ppl_buckets_sql

    rows = [(i, f"g{i % 3}", (i * 7) % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    got = sorted(map(tuple, ppl_buckets(df, "g", "s")
                     .select("id", "g", "s", "bucket").collect()))
    con = duckdb.connect()
    con.execute("create table t (id bigint, g varchar, s bigint)")
    con.executemany("insert into t values (?, ?, ?)", rows)
    sql = ppl_buckets_sql(rel="t", group_col="g", score_col="s",
                          cols="r.id, r.g, r.s")
    assert got == sorted(map(tuple, con.execute(sql).fetchall()))


def test_ppl_buckets_partition_invariance(spark):
    from logparser_llm_spark.operators.lm import ppl_buckets

    rows = [(i, f"g{i % 4}", (i * 13) % 23) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    a = sorted(map(tuple, ppl_buckets(df.repartition(1), "g", "s").collect()))
    b = sorted(map(tuple, ppl_buckets(df.repartition(11), "g", "s").collect()))
    assert a == b


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_ccnet_buckets_registered_laws(spark, sf):
    """Per language: buckets are score-monotone (head < middle < tail
    by VALUE — ties never split), sizes obey the inclusive integer law
    AND its maximality (adding the next score group would break the
    bound), and the %41 solo docs land in 'none' with zero bigrams."""
    from collections import defaultdict

    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["ccnet_buckets"][0](spark, sf).collect()
    assert {r["bucket"] for r in rows} == {"head", "middle", "tail", "none"}, sf
    for r in rows:
        assert (r["bucket"] == "none") == (r["n_bigrams"] == 0), r
        if r["doc_id"] % 41 == 0:
            assert r["bucket"] == "none", r
    by_lang = defaultdict(lambda: defaultdict(list))
    for r in rows:
        if r["bucket"] != "none":
            by_lang[r["lang"]][r["bucket"]].append(r["nll_per_gram_e6"])
    assert len(by_lang) == 5, sf
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, (sf, lang)
        assert max(b["head"]) < min(b["middle"]), (sf, lang)
        assert max(b["middle"]) < min(b["tail"]), (sf, lang)
        n = sum(len(v) for v in b.values())
        h, m = len(b["head"]), len(b["middle"])
        assert 3 * h <= n and 3 * (h + m) <= 2 * n, (sf, lang)
        # maximality: the next score group would overflow the bucket
        next_mid = sum(1 for s in b["middle"] if s == min(b["middle"]))
        next_tail = sum(1 for s in b["tail"] if s == min(b["tail"]))
        assert 3 * (h + next_mid) > n, (sf, lang)
        assert 3 * (h + m + next_tail) > 2 * n, (sf, lang)
