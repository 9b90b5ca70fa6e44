"""Grok-style pattern parsing — the "grok/regex parse" half of the north
rule's parse stage.

A grok expression interleaves literal text with ``%{PATTERN:field}``
captures (``%{PATTERN}`` for match-only). It compiles to ONE regex whose
capture groups are extracted with per-field ``regexp_extract`` Column
expressions — pure JVM, whole-stage codegen, one regex evaluation per
field (Catalyst CSE collapses the shared match). All base patterns are
RE2-compatible (no backrefs/lookaround) so DuckDB oracles replicate the
extraction bit-for-bit with the same compiled pattern and group indexes.

Base library: the standard grok names a log pipeline actually uses;
``extra_patterns`` extends/overrides per call. Definitions may reference
other definitions with ``%{NAME}`` (resolved recursively, cycle-checked).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GROK_BASE: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "HOSTNAME": r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[A-Za-z0-9._-]+",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "LOGLEVEL": r"TRACE|DEBUG|INFO|WARN|WARNING|ERROR|FATAL|CRITICAL",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPMETHOD": r"GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH",
    "URIPATH": r"/[^\s?#]*",
    "QS": r"\"[^\"]*\"",
}

_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def _resolve(name: str, library: dict[str, str], seen: tuple[str, ...] = ()) -> str:
    if name in seen:
        raise ValueError(f"grok pattern cycle: {' -> '.join(seen + (name,))}")
    body = library[name]
    return _TOKEN.sub(
        lambda m: "(?:" + _resolve(m.group(1), library, seen + (name,)) + ")", body
    )


def compile_grok(
    expr: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """grok expression → (regex with one capture group per named field,
    field names in group order). Literal text between captures is
    regex-escaped; ``%{NAME}`` without a field matches non-capturing."""
    library = {**GROK_BASE, **(extra_patterns or {})}
    fields: list[str] = []
    out: list[str] = []
    pos = 0
    for m in _TOKEN.finditer(expr):
        out.append(re.escape(expr[pos : m.start()]))
        name, field = m.group(1), m.group(2)
        if name not in library:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        body = _resolve(name, library)
        if field:
            fields.append(field)
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(re.escape(expr[pos:]))
    return "".join(out), fields


def grok_columns(
    col: Column, expr: str, extra_patterns: dict[str, str] | None = None
) -> list[Column]:
    """One string Column per named field (empty string on no-match —
    ``regexp_extract`` semantics, identical in Spark and DuckDB)."""
    regex, fields = compile_grok(expr, extra_patterns)
    return [
        F.regexp_extract(col, regex, i + 1).alias(field)
        for i, field in enumerate(fields)
    ]


def grok_parse(
    df: DataFrame,
    text_col: str,
    expr: str,
    extra_patterns: dict[str, str] | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Append the grok captures of ``expr`` over ``text_col``. ``keep``
    restricts the carried-through input columns (default: all).

    Raises on a grok field name colliding with a carried input column —
    otherwise the frame would silently gain duplicate column names and
    later by-name references become ambiguous (ADVICE r2)."""
    base = df.select(*(keep or df.columns))
    regex, fields = compile_grok(expr, extra_patterns)  # compiled once
    clash = sorted(set(fields) & set(base.columns))
    if clash:
        raise ValueError(
            f"grok field(s) {clash} collide with input column(s); rename the "
            f"grok capture or drop the input column via keep="
        )
    captures = [
        F.regexp_extract(F.col(text_col), regex, i + 1).alias(field)
        for i, field in enumerate(fields)
    ]
    return base.select("*", *captures)


def grok_sql(expr: str, col_expr: str, extra_patterns: dict[str, str] | None = None) -> str:
    """DuckDB select-list fragment for the same captures (same compiled
    regex, same group indexes)."""
    regex, fields = compile_grok(expr, extra_patterns)
    quoted = regex.replace("'", "''")
    return ", ".join(
        f"regexp_extract({col_expr}, '{quoted}', {i + 1}) as {field}"
        for i, field in enumerate(fields)
    )
