"""robots.txt (RFC 9309) parsing and distributed crawl-permission
filtering.

A polite crawler must evaluate every candidate url against its host's
robots.txt before fetching — at 10^11 frontier urls that is a JOIN, not
a per-url library call. The split here keeps the slow part bounded and
the hot part declarative:

- **Parse once per host** (:func:`parse_robots`, pure Python): group
  selection per RFC 9309 (the group whose ``User-agent`` token is the
  LONGEST case-insensitive substring match for our product token wins;
  the ``*`` group is the fallback; consecutive UA lines share a group),
  and each Allow/Disallow path pattern is compiled to an anchored Java
  regex at parse time (``*`` → ``.*``, trailing ``$`` → ``$``, all
  other chars escaped). The robots side is one row per (host, rule) —
  a DIM table, millions of rows at full crawl scale, broadcast-able.
- **Evaluate per url in the JVM** (:func:`robots_allowed`): urls derive
  (host, path), broadcast-join the rule table, match with per-row
  ``regexp_like``, and the RFC's longest-match-wins / Allow-wins-ties
  rule is one ``max_by`` over a struct ordering — no Python anywhere
  in the url-volume path, and a host with no robots.txt (or no
  matching rule) defaults to allowed, as the RFC requires.

Rule precedence encoding: RFC 9309 §2.2.2 — the matching rule with the
longest PATTERN wins; if an Allow and a Disallow match at equal length,
Allow wins. Both keys pack into one orderable struct
``(pattern_length, is_allow)`` so ``max_by`` implements the spec
exactly.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

RULE_SCHEMA = "host string, allow boolean, rule_len int, pattern string"


def _pattern_to_regex(pattern: str) -> str:
    """Anchored Java/RE2-style regex for a robots path pattern:
    prefix-match semantics, ``*`` wildcard, ``$`` end anchor."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = "^"
    for ch in body:
        out += ".*" if ch == "*" else re.escape(ch)
    return out + ("$" if anchored_end else "")


def parse_robots(txt: str, agent: str = "*") -> list[tuple[bool, int, str]]:
    """Rules of the group governing ``agent``: list of
    ``(allow, rule_len, anchored_regex)``. Empty list = everything
    allowed (no matching group, or the group has no rules). Comments
    (``#``), blank lines, unknown directives and case variation are
    handled per RFC 9309; an empty Disallow value means allow-all and
    contributes no rule."""
    groups: list[tuple[list[str], list[tuple[bool, int, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, int, str]] = []
    in_agents = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            in_agents = True
        elif key in ("allow", "disallow"):
            in_agents = False
            if cur_agents and value:
                cur_rules.append(
                    (key == "allow", len(value), _pattern_to_regex(value))
                )
            elif cur_agents and key == "disallow":
                pass  # empty Disallow: explicit allow-all, no rule needed
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    tok = agent.lower()
    best: tuple[int, list] | None = None  # (ua match length, rules)
    for agents, rules in groups:
        for ua in agents:
            if ua == "*":
                score = 0
            elif ua and ua in tok:
                score = len(ua)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules)
    return best[1] if best else []


def robots_rules(
    robots_df: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    *,
    agent: str = "*",
) -> DataFrame:
    """Parse a (host, robots.txt) dim frame into the per-host rule
    table ``RULE_SCHEMA`` (hosts whose group has no rules emit no
    rows — absent host = allowed). mapInPandas: parsing is per-host
    work over the SMALL side of the eventual join."""

    def run(batches):
        for pdf in batches:
            out = []
            for h, t in zip(pdf[host_col], pdf[txt_col]):
                for allow, rl, rx in parse_robots(t or "", agent):
                    out.append((h, allow, rl, rx))
            yield pd.DataFrame(
                out, columns=["host", "allow", "rule_len", "pattern"]
            )

    return robots_df.select(host_col, txt_col).mapInPandas(run, RULE_SCHEMA)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """``urls`` plus an ``allowed`` boolean column, evaluated per RFC
    9309 against the ``rules`` table (output of :func:`robots_rules`).
    The rule side is broadcast (a dim even at crawl scale); matching
    and the longest-match/Allow-tie resolution are pure JVM."""
    from .web import host_of

    u = urls.withColumn("__host", host_of(F.col(url_col))).withColumn(
        "__path",
        F.coalesce(
            F.nullif(F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^#?]*)", 1), F.lit("")),
            F.lit("/"),
        ),
    )
    j = u.join(
        F.broadcast(rules),
        (u["__host"] == rules["host"])
        & F.regexp_like(u["__path"], rules["pattern"]),
        "left",
    )
    # RFC precedence: longest pattern wins, Allow wins length ties —
    # one orderable struct; no match at all (nulls) = allowed
    verdict = F.max_by(
        F.col("allow"), F.struct(F.col("rule_len"), F.col("allow"))
    )
    group_cols = [urls[c] for c in urls.columns]
    return (
        j.groupBy(*group_cols)
        .agg(verdict.alias("__verdict"))
        .withColumn("allowed", F.coalesce(F.col("__verdict"), F.lit(True)))
        .drop("__verdict")
    )
