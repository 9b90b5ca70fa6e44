"""Prefix-filtering set-similarity join (operators/setjoin.py):
differential three-way parity (Spark / DuckDB / brute-force Python),
threshold guards, seed-corpus engine parity, and the registered-query
class pins at sf0.01 and sf0.1."""

import random

import duckdb
import pytest

from logparser_llm_spark.operators.setjoin import (
    prefix_filter_pairs,
    prefix_filter_pairs_py,
    prefix_filter_pairs_sql,
)

THRESHOLDS = [(1, 2), (2, 3), (9, 10), (1, 1)]


def _corpus():
    """Deterministic mixed corpus: random small token sets (including
    empty / punctuation-only / stopword-only docs) plus planted
    near-dup families straddling the thresholds, plus a
    case/punctuation variant that must normalize to an exact dup."""
    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(60)]
    rows = []
    for i in range(40):
        k = rng.randint(0, 12)
        rows.append((i, " ".join(rng.sample(vocab, k)) if k else ""))
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (102, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (103, "Alpha, BETA! gamma; delta epsilon zeta eta theta iota kappa"),
        (104, "!!! ..."),
        (105, "the the the"),
        (106, "the"),
    ]
    return rows


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.fixture(scope="module")
def duck_corpus(corpus):
    con = duckdb.connect()
    con.execute("create table docs(id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", corpus)
    return con


@pytest.mark.parametrize("t", THRESHOLDS)
def test_spark_matches_bruteforce(spark, corpus, t):
    """The prefix join must find EXACTLY the brute-force pair set —
    the candidate rule is complete (module lemma), the verify exact."""
    num, den = t
    py = prefix_filter_pairs_py(corpus, t_num=num, t_den=den)
    df = spark.createDataFrame(corpus, "id long, text string")
    got = sorted(
        tuple(r)
        for r in prefix_filter_pairs(
            df, "id", "text", t_num=num, t_den=den
        ).collect()
    )
    assert got == py
    assert py, t  # the corpus must actually exercise this threshold


@pytest.mark.parametrize("t", THRESHOLDS)
def test_oracle_sql_matches_bruteforce(duck_corpus, corpus, t):
    """Drift gate: the module-generated naive-candidate DuckDB oracle
    agrees with the brute-force reference on the same corpus."""
    num, den = t
    sql = prefix_filter_pairs_sql("docs", "id", "text", t_num=num, t_den=den)
    got = sorted(tuple(r) for r in duck_corpus.execute(sql).fetchall())
    assert got == prefix_filter_pairs_py(corpus, t_num=num, t_den=den)


def test_exact_dup_and_normalized_dup_score_e6(corpus):
    """Exact dups (100,102) and the case/punct variant (100,103) both
    report jaccard_e6 = 1_000_000; the one-token-swapped pair (100,101)
    reports the exact floor of 1e6*9/11."""
    py = {(a, b): j for a, b, *_rest, j in prefix_filter_pairs_py(
        corpus, t_num=1, t_den=2)}
    assert py[(100, 102)] == 1_000_000
    assert py[(100, 103)] == 1_000_000
    assert py[(100, 101)] == 1_000_000 * 9 // 11


@pytest.mark.parametrize("bad", [(0, 1), (3, 2), (-1, 10), (1, 0)])
def test_threshold_guard(spark, bad):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError, match="t_num/t_den"):
        prefix_filter_pairs(df, "id", "text", t_num=bad[0], t_den=bad[1])
    with pytest.raises(ValueError, match="t_num/t_den"):
        prefix_filter_pairs_sql("docs", "id", "text", t_num=bad[0], t_den=bad[1])


def test_float_threshold_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError, match="rational"):
        prefix_filter_pairs(df, "id", "text", t_num=0.9, t_den=1)


def test_seed_corpus_identical_across_engines(spark):
    """The registered query's seeded corpus must be byte-identical in
    Spark and DuckDB (any drift breaks every downstream hash)."""
    from logparser_llm_spark.plans.queries import (
        _SETJOIN_SEED_SQL,
        _setjoin_seed_spark,
    )

    sf = "/root/testdata/sf0.001"
    stexts = {
        r["doc_id"]: r["text"]
        for r in _setjoin_seed_spark(
            spark.read.parquet(f"{sf}/documents.parquet").select("doc_id")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf}/documents.parquet'"
    )
    assert stexts == dict(con.execute(_SETJOIN_SEED_SQL).fetchall())


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_registered_classes_present_both_sf(spark, sf):
    """Both verdict classes at every sf: exactly 2 qualifying pairs per
    5-doc family — member shapes (0,1) at 950000 and the
    boundary-tight (0,2) at floor(1e6*19/21) — and nothing else (the
    near-miss (1,2) and all cross-family pairs must be absent)."""
    from logparser_llm_spark.plans.queries import QUERIES

    fn, _ = QUERIES["set_jaccard_join"]
    rows = fn(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(rows) == 2 * n_docs // 5
    shapes = {}
    for r in rows:
        assert r["id_b"] - r["id_a"] in (1, 2)  # same family only
        assert r["id_a"] % 5 == 0
        shapes.setdefault((r["id_a"] % 5, r["id_b"] % 5), set()).add(
            r["jaccard_e6"]
        )
    assert shapes == {
        (0, 1): {1_000_000 * 19 // 20},
        (0, 2): {1_000_000 * 19 // 21},
    }


# --- containment join (the asymmetric sibling) -----------------------------


def test_containment_spark_matches_bruteforce(spark, corpus):
    """The one-sided prefix rule must find EXACTLY the brute-force
    ordered-pair set at several thresholds — completeness of the
    contained-side-prefix × container-full-tokens candidate join."""
    from logparser_llm_spark.operators.setjoin import (
        containment_pairs,
        containment_pairs_py,
    )

    df = spark.createDataFrame(corpus, "id long, text string")
    for num, den in [(1, 2), (9, 10), (1, 1)]:
        got = sorted(
            tuple(r)
            for r in containment_pairs(
                df, "id", "text", t_num=num, t_den=den
            ).collect()
        )
        assert got == containment_pairs_py(corpus, t_num=num, t_den=den), (
            num, den)


def test_containment_oracle_sql_matches_bruteforce(duck_corpus, corpus):
    from logparser_llm_spark.operators.setjoin import (
        containment_pairs_py,
        containment_pairs_sql,
    )

    for num, den in [(1, 2), (9, 10), (1, 1)]:
        sql = containment_pairs_sql("docs", "id", "text", t_num=num, t_den=den)
        got = sorted(tuple(r) for r in duck_corpus.execute(sql).fetchall())
        assert got == containment_pairs_py(corpus, t_num=num, t_den=den)


def test_containment_asymmetry_and_jaccard_blindness(spark):
    """The defining case: a 5-token quote inside a 10-token container —
    C(quote→container) = 1 qualifies, the reverse direction is 0.5 and
    fails, and J = 0.5 means every Jaccard-threshold operator at
    t >= 0.9 is structurally blind to the pair."""
    from logparser_llm_spark.operators.setjoin import (
        containment_pairs,
        prefix_filter_pairs,
    )

    rows = [
        (1, "a b c d e"),
        (2, "a b c d e f g h i j"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment_e6"]
        for r in containment_pairs(df, "id", "text", t_num=9, t_den=10).collect()
    }
    assert got == {(1, 2): 1_000_000}
    assert (
        prefix_filter_pairs(df, "id", "text", t_num=9, t_den=10).count() == 0
    )


def test_containment_boundary_is_exact(spark):
    """9 of 10 tokens shared = exactly 0.9: the cross-multiplication
    must pass with zero slack; 8 of 10 must fail."""
    from logparser_llm_spark.operators.setjoin import containment_pairs

    rows = [
        (0, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        (1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 x1"),   # 9/10 vs 0
        (2, "w0 w1 w2 w3 w4 w5 w6 w7 y1 y2"),   # 8/10 vs 0
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment_e6"]
        for r in containment_pairs(df, "id", "text", t_num=9, t_den=10).collect()
    }
    assert got == {(0, 1): 900_000, (1, 0): 900_000}


def test_containment_threshold_guards(spark):
    from logparser_llm_spark.operators.setjoin import containment_pairs

    df = spark.createDataFrame([(1, "a")], "id long, text string")
    for num, den in [(0, 1), (11, 10), (-1, 2)]:
        with pytest.raises(ValueError):
            containment_pairs(df, "id", "text", t_num=num, t_den=den)
    with pytest.raises(ValueError):
        containment_pairs(df, "id", "text", t_num=0.9, t_den=1)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_containment_registered_classes_present(spark, sf):
    """Per complete 4-id group: 1→0 at exactly 1.0 (the Jaccard-blind
    quote-in-container pair, size_b = 2·size_a), 2→0 / 1→2 / 2→1 at
    exactly the 0.9 boundary, and nothing else — in particular 0→1
    must NOT appear (asymmetry) and class 3 never qualifies."""
    from logparser_llm_spark.plans.queries import QUERIES

    rows = QUERIES["containment_join"][0](spark, sf).collect()
    assert rows, sf
    scores = {r["containment_e6"] for r in rows}
    assert scores == {1_000_000, 900_000}, sf
    for r in rows:
        ma, mb = r["id_a"] % 4, r["id_b"] % 4
        assert (ma, mb) in {(1, 0), (2, 0), (1, 2), (2, 1)}, (sf, r)
        assert r["id_a"] // 4 == r["id_b"] // 4, (sf, r)  # never crosses groups
        if (ma, mb) == (1, 0):
            assert r["containment_e6"] == 1_000_000
            assert r["size_b"] == 2 * r["size_a"]  # J = 0.5: Jaccard-blind
    full = [r for r in rows if (r["id_a"] % 4, r["id_b"] % 4) == (1, 0)]
    boundary = [r for r in rows if r["containment_e6"] == 900_000]
    assert full and boundary, sf
