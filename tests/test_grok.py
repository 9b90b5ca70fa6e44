"""Grok pattern compiler + distributed parse."""

import re

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.functions.grok import (
    GROK_BASE,
    compile_grok,
    grok_parse,
)


def test_compile_basic():
    regex, fields = compile_grok("%{WORD:verb} id=%{INT:n}")
    assert fields == ["verb", "n"]
    m = re.match(regex, "start id=-42")
    assert m and m.group(1) == "start" and m.group(2) == "-42"


def test_compile_literal_escaping_and_unnamed():
    regex, fields = compile_grok("cost ($) %{NUMBER:amt} %{WORD}")
    assert fields == ["amt"]
    m = re.match(regex, "cost ($) 3.50 usd")
    assert m and m.group(1) == "3.50"


def test_nested_pattern_resolution():
    regex, fields = compile_grok("%{IPORHOST:host}")
    assert re.fullmatch(regex, "10.1.2.3")
    assert re.fullmatch(regex, "api.example-svc.co")


def test_cycle_and_unknown_errors():
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")
    with pytest.raises(ValueError):
        compile_grok("%{A:x}", extra_patterns={"A": "%{B}", "B": "%{A}"})


def test_extra_patterns_override():
    regex, _ = compile_grok("%{WORD:w}", extra_patterns={"WORD": r"[a-z]+"})
    assert re.fullmatch(regex, "abc") and not re.fullmatch(regex, "ABC")


def test_grok_parse_distributed(spark):
    lines = [
        (1, "2024-03-01 10:00:00 ERROR user=77 login value=12.5 from 10.0.0.9 tail"),
        (2, "not a log line"),
    ]
    df = spark.createDataFrame(lines, "id bigint, line string")
    expr = (
        "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} user=%{INT:user} "
        "%{WORD:action} value=%{NUMBER:val} from %{IP:ip}"
    )
    rows = {r["id"]: r for r in grok_parse(df, "line", expr).collect()}
    r1 = rows[1]
    assert (r1["ts"], r1["level"], r1["user"], r1["action"], r1["val"], r1["ip"]) == (
        "2024-03-01 10:00:00", "ERROR", "77", "login", "12.5", "10.0.0.9"
    )
    # no-match rows yield empty strings (regexp_extract semantics)
    assert all(rows[2][f] == "" for f in ("ts", "level", "user", "action", "val", "ip"))


def test_grok_base_is_re2_safe():
    """No backrefs/lookaround anywhere — the DuckDB-parity guarantee."""
    for name, body in GROK_BASE.items():
        assert "(?=" not in body and "(?!" not in body and "(?<" not in body, name
        assert not re.search(r"\\[1-9]", body), name


def test_grok_field_collision_raises(spark):
    """A grok field name colliding with an input column must raise, not
    silently produce duplicate column names (ADVICE r2)."""
    import pytest

    from logparser_llm_spark.functions.grok import grok_parse

    df = spark.createDataFrame([("INFO boot", "x")], "line string, level string")
    with pytest.raises(ValueError, match="collide"):
        grok_parse(df, "line", "%{LOGLEVEL:level} %{GREEDYDATA:msg}")
    # dropping the clashing input column via keep= succeeds
    out = grok_parse(df, "line", "%{LOGLEVEL:level} %{GREEDYDATA:msg}", keep=["line"])
    assert out.columns == ["line", "level", "msg"]
    row = out.collect()[0]
    assert row["level"] == "INFO" and row["msg"] == "boot"
