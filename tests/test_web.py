"""URL canonicalization: adversarial single-URL pins (hand-derived
expected strings — the truth source the seeded-corpus oracle can't
cover), host and registrable-domain extraction. The sf0.01 DuckDB
parity for the registered ``url_canonicalize`` query runs via
test_queries_oracle."""

import pytest

from pyspark.sql import functions as F

from logparser_llm_spark.functions.web import (
    canonicalize_url,
    host_of,
    registrable_domain,
    surt_key,
)

CANON_CASES = [
    # case-fold scheme+authority only; default port; fragment
    ("HTTP://WWW.Example.COM:80/Path/Page?a=1#frag",
     "http://www.example.com/Path/Page?a=1"),
    ("https://Example.com:443/", "https://example.com/"),
    # default port at end-of-string
    ("https://example.com:443", "https://example.com"),
    # non-default port kept; path case kept
    ("https://example.com:8080/X/Y", "https://example.com:8080/X/Y"),
    # :80 is only default for http
    ("https://example.com:80/x", "https://example.com:80/x"),
    # tracking params: leading, middle, trailing, consecutive
    ("https://e.com/p?utm_a=1&b=2&utm_c=3", "https://e.com/p?b=2"),
    ("https://e.com/p?utm_source=x", "https://e.com/p"),
    ("https://e.com/p?utm_a=1&utm_b=2", "https://e.com/p"),
    ("https://e.com/p?ref=abc&x=1", "https://e.com/p?x=1"),
    # 'refresh' must NOT match the bare-'ref' rule
    ("https://e.com/p?refresh=1", "https://e.com/p?refresh=1"),
    ("https://e.com/p?gclid=z&fbclid=y&id=7", "https://e.com/p?id=7"),
    # whitespace trim
    ("  https://e.com/p?a=1  ", "https://e.com/p?a=1"),
    # schemeless input: no case/port step, cleanup still applies
    ("Example.com/Path#f", "Example.com/Path"),
    # other schemes: case-folded, no port logic
    ("FTP://Mirror.Example.ORG/pub", "ftp://mirror.example.org/pub"),
    # userinfo is part of the authority (lowercased, preserved here)
    ("https://User@Example.com/p", "https://user@example.com/p"),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize_pinned(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "u string")
    got = df.select(canonicalize_url(F.col("u")).alias("c")).first()["c"]
    assert got == expected


HOST_CASES = [
    ("https://WWW.Example.COM:8443/p?x=1", "www.example.com"),
    ("http://user:pw@Site.org/x", "site.org"),
    ("https://example.com", "example.com"),
]


@pytest.mark.parametrize("raw,expected", HOST_CASES)
def test_host_of(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "u string")
    assert df.select(host_of(F.col("u")).alias("h")).first()["h"] == expected


DOMAIN_CASES = [
    ("www.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("a.b.co.uk", "b.co.uk"),
    ("x.gov.cn", "x.gov.cn"),
    ("example.com", "example.com"),
    ("co.uk", "co.uk"),
    ("localhost", "localhost"),
]


@pytest.mark.parametrize("host,expected", DOMAIN_CASES)
def test_registrable_domain(spark, host, expected):
    df = spark.createDataFrame([(host,)], "h string")
    got = df.select(registrable_domain(F.col("h")).alias("d")).first()["d"]
    assert got == expected


SURT_CASES = [
    # the docstring example: case fold, www strip, :443 strip, query
    # sort, fragment drop
    ("https://WWW.News.Example.com:443/A/B?b=2&a=1#x",
     "com,example,news)/a/b?a=1&b=2"),
    ("http://example.com/", "com,example)/"),
    # bare authority: empty path after ')'
    ("https://example.com", "com,example)"),
    # only a LEADING www label is stripped
    ("https://sub.www.example.com/p", "com,example,www,sub)/p"),
    # non-default port survives as part of the origin
    ("https://user:pw@Site.org:8080/X?b&a=2", "org,site:8080)/x?a=2&b"),
    # :80 is default for http only
    ("http://e.com:80/p", "com,e)/p"),
    ("https://e.com:80/p", "com,e:80)/p"),
    # tracking params removed before the sort
    ("https://e.com/p?utm_source=x&z=9&a=1", "com,e)/p?a=1&z=9"),
    # schemeless input: total, empty host part
    ("example.com/no-scheme", ")example.com/no-scheme"),
    # tracking strip must fire on CASE-VARIANT spellings too (the key
    # lowercases before canonicalizing)
    ("https://e.com/a?UTM_SOURCE=x&q=1", "com,e)/a?q=1"),
]


@pytest.mark.parametrize("raw,expected", SURT_CASES)
def test_surt_key(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "u string")
    assert df.select(surt_key(F.col("u")).alias("k")).first()["k"] == expected


def test_surt_key_collapses_equivalent_spellings(spark):
    """Every spelling of one capture must map to ONE urlkey — the
    property the CDX index relies on."""
    spellings = [
        "https://www.example.com/a?x=1&y=2",
        "HTTPS://WWW.EXAMPLE.COM:443/A?y=2&x=1",
        "https://example.com/a?y=2&utm_campaign=c&x=1#frag",
    ]
    df = spark.createDataFrame([(s,) for s in spellings], "u string")
    keys = {r["k"] for r in df.select(surt_key(F.col("u")).alias("k")).collect()}
    assert keys == {"com,example)/a?x=1&y=2"}


def test_canonical_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) for every pin
    case — the property that makes it safe to key dedup on."""
    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(
        F.col("c"), canonicalize_url(F.col("c")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c2"] == r["c"]


def test_crawl_diff_null_text_doc_stays_classified(spark, tmp_path):
    """A NULL-text page present in both snapshots must classify by the
    text rule (changed when id%5==0, else unchanged) — presence rides
    explicit flags, not digest nullability."""
    from logparser_llm_spark.plans.queries import q_crawl_diff

    rows = [(2, None, "srcx"), (5, None, "srcx"), (3, "same words", "srcx")]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["status"]): r["n"]
        for r in q_crawl_diff(spark, str(tmp_path)).collect()
    }
    # id2: null text, in both, %5!=0 -> unchanged; id5: null text, %5==0
    # -> changed; id3: non-null, %5!=0 -> unchanged
    assert got == {"unchanged": 2, "changed": 1}
