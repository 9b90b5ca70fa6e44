"""Training-data hygiene functions: PII redaction and repetition
signals (the Gopher-rules family) — pure Column expressions (JVM,
codegen) with md5-checkable outputs so DuckDB oracles can replicate
them byte-for-byte.

PII patterns are deliberately RE2-compatible (no backrefs/lookaround)
so the exact same pattern strings run in Spark (Java regex) and DuckDB
(RE2) with identical match sets — the cross-engine redaction hash is
the correctness anchor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: specific → general (an IP inside a phone-ish digit run
# must be taken by the IP rule first); applied as a chain in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,2}[ .-]?\(\d{3}\)[ .-]?\d{3}[ .-]?\d{4}|\b\d{3}[.-]\d{3}[.-]\d{4}\b", "<PHONE>"),
]


def redact_pii_col(col: Column) -> Column:
    """Chained redaction, fixed order (email → ip → phone)."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count_col(col: Column, kind: str) -> Column:
    """Match count for one PII kind (on the ORIGINAL text)."""
    pattern = next(p for name, p, _ in PII_PATTERNS if name == kind)
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")


def pii_redact_sql(expr: str) -> str:
    """DuckDB rendering of the same chain (same patterns, same order)."""
    out = expr
    for _, pattern, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out


def pii_count_sql(expr: str, kind: str) -> str:
    pattern = next(p for name, p, _ in PII_PATTERNS if name == kind)
    return f"cast(len(regexp_extract_all({expr}, '{pattern}')) as bigint)"


# --- repetition signals (Gopher-style) ------------------------------------

def dup_token_fraction(tokens: Column) -> Column:
    """1 − distinct/total: how much of the doc is repeated tokens."""
    n = F.size(tokens)
    return F.when(
        n > 0, 1.0 - F.size(F.array_distinct(tokens)) / n.cast("double")
    ).otherwise(F.lit(0.0))


def top_token_fraction(tokens: Column) -> Column:
    """Frequency share of the single most common token — the word-level
    analogue of Gopher's top-n-gram fraction. Interpreted higher-order
    expression (O(distinct×n) per row): fine for profiling passes; for a
    full-corpus hot path use the Arrow text-profile UDF pattern."""
    n = F.size(tokens)
    counts = F.transform(
        F.array_distinct(tokens),
        lambda t: F.size(F.filter(tokens, lambda x: x == t)),
    )
    return F.when(n > 0, F.array_max(counts) / n.cast("double")).otherwise(F.lit(0.0))
