"""robots.txt (RFC 9309): parser pins, precedence rules, distributed
filter vs a local reference evaluation. The sf0.01 DuckDB-oracle parity
for the registered ``robots_filter`` query runs via
test_queries_oracle."""

import re

import pytest

from logparser_llm_spark.functions.robots import (
    _pattern_to_regex,
    parse_robots,
    robots_allowed,
    robots_rules,
)

TXT = """
# comment line
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/public*
Disallow: /tmp/*.bak$
Disallow:
"""


def _allowed(rules, path):
    m = [(rl, al) for al, rl, rx in rules if re.match(rx, path)]
    if not m:
        return True
    return sorted(m)[-1][1]  # longest wins; Allow wins length ties


def test_group_selection_and_precedence():
    rules = parse_robots(TXT, agent="sparkbot/1.0")
    assert _allowed(rules, "/articles/1") is True
    assert _allowed(rules, "/private/x") is False
    assert _allowed(rules, "/private/public/x") is True  # longer Allow wins
    assert _allowed(rules, "/tmp/a.bak") is False
    assert _allowed(rules, "/tmp/a.bakup") is True  # $ anchor respected
    # the decoy group applies only to agents matching its token
    assert parse_robots(TXT, agent="BadBot/2.0") == [(False, 1, "^/")]


def test_longest_ua_token_wins():
    txt = (
        "User-agent: spark\nDisallow: /a\n\n"
        "User-agent: sparkbot\nDisallow: /b\n\n"
        "User-agent: *\nDisallow: /c\n"
    )
    rules = parse_robots(txt, agent="sparkbot/1.0")
    assert [rx for _, _, rx in rules] == ["^/b"]


def test_rules_outside_groups_and_empty_disallow():
    assert parse_robots("Disallow: /x", "bot") == []  # no group → ignored
    assert parse_robots("User-agent: *\nDisallow:", "bot") == []  # allow-all
    assert parse_robots("", "bot") == []


def test_shared_group_consecutive_ua_lines():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(txt, agent="a/1") == parse_robots(txt, agent="b/1")
    assert parse_robots(txt, agent="c/1") == []


def test_pattern_regex_escapes_metachars():
    rx = _pattern_to_regex("/p(1)?.x*y$")
    assert re.match(rx, "/p(1)?.xZZy")
    assert not re.match(rx, "/p1.xy")


def test_allow_wins_equal_length_tie():
    txt = "User-agent: *\nDisallow: /dir/\nAllow: /dirX/"[:0] + (
        "User-agent: *\nDisallow: /samepp\nAllow: /samepp\n"
    )
    rules = parse_robots(txt, agent="x")
    assert _allowed(rules, "/samepp/x") is True


def test_distributed_filter_matches_local_reference(spark):
    rdf = spark.createDataFrame(
        [("h1.com", TXT), ("h2.com", None), ("h3.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    rules_df = robots_rules(rdf, agent="sparkbot/1.0")
    cases = [
        ("u1", "https://h1.com/private/x", False),
        ("u2", "https://h1.com/private/public/1", True),
        ("u3", "https://h1.com/tmp/a.bak", False),
        ("u4", "https://h2.com/anything", True),  # robots missing → allowed
        ("u5", "https://nohost.com/x", True),  # host absent from dim
        ("u6", "https://h1.com", True),  # bare host → path "/"
        ("u7", "https://h3.com/", False),  # blanket Disallow: /
        ("u8", "https://H1.COM/private/x", False),  # host case-folded
    ]
    urls = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "id string, url string"
    )
    got = {r.id: r.allowed for r in robots_allowed(urls, rules_df).collect()}
    assert got == {i: exp for i, _, exp in cases}


def test_distributed_output_keeps_url_columns(spark):
    rdf = spark.createDataFrame([("h.com", "User-agent: *\nDisallow: /no\n")],
                                "host string, robots_txt string")
    urls = spark.createDataFrame(
        [(1, "https://h.com/no/x", "extra")], "k int, url string, meta string"
    )
    [r] = robots_allowed(urls, robots_rules(rdf, agent="b")).collect()
    assert (r.k, r.meta, r.allowed) == (1, "extra", False)


# --- sitemap_directives ------------------------------------------------------


def test_sitemap_directives_classes_and_duckdb(spark):
    """Case-insensitive multiline anchor; duplicate lines counted in
    n_decls but collapsed in n_distinct; no-directive, NULL-body and
    mid-line imposters all yield honest zero rows; DuckDB parity."""
    import duckdb

    from logparser_llm_spark.operators.frontier import (
        sitemap_directives,
        sitemap_directives_sql,
    )

    rows = [
        ("h1", "User-agent: *\nDisallow: /x\nSitemap: http://h1/s.xml\n"
               "sitemap: http://h1/s.xml\n SiteMap:\thttp://h1/t.xml"),
        ("h2", "User-agent: *\nAllow: /"),
        ("h3", None),
        ("h4", "notasitemap: http://x\n#Sitemap: http://no\n"
               "Sitemap: http://h4/a"),
    ]
    df = spark.createDataFrame(rows, "h string, r string")
    got = sorted(map(tuple, sitemap_directives(df, "h", "r").collect()))
    con = duckdb.connect()
    con.execute("create table t (h varchar, r varchar)")
    con.executemany("insert into t values (?,?)", rows)
    want = sorted(map(tuple, con.execute(sitemap_directives_sql(
        rel="t", host_col="h", robots_col="r")).fetchall()))
    assert got == want
    d = {r[0]: r for r in got}
    assert d["h1"] == ("h1", 3, 2, "http://h1/s.xml")
    assert d["h2"] == ("h2", 0, 0, None)
    assert d["h3"] == ("h3", 0, 0, None)
    assert d["h4"] == ("h4", 1, 1, "http://h4/a")
