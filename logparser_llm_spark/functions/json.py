"""Semi-structured JSON payload extraction — the log-pipeline surface
every telemetry stack needs: event `props`, API payloads and crawler
metadata arrive as JSON strings, and the pipeline must pull typed
fields out of them WITHOUT a Python parser in the hot path.

Spark side: ``get_json_object`` (JVM codegen, JSONPath-lite `$.a.b` /
`$.arr[i]`) returns NULL for a missing path, a NULL document, or
MALFORMED JSON — the tolerant semantics a dirty event stream needs.
DuckDB side: ``json_extract_string`` ERRORS on malformed input, so
every generated SQL guards with ``json_valid`` first; the two
spellings then agree row-for-row, including on garbage (asserted over
staged malformed classes in tests and the registered queries).

The path grammar used here is the INTERSECTION both engines implement
identically: dotted object fields and non-negative array indices
(``$.meta.k``, ``$.tags[0]``). Anything fancier (wildcards, slices,
recursive descent) is outside the contract — validated away.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# dotted fields + non-negative array indices only — the cross-engine
# intersection (identifiers: no dots/brackets/quotes inside)
_PATH_RE = re.compile(
    r"^\$(\.[A-Za-z_][A-Za-z0-9_]*(\[[0-9]+\])?)+$"
)


def _check_path(path: str) -> str:
    if not _PATH_RE.match(path):
        raise ValueError(
            f"unsupported JSON path {path!r}: only $.field.sub[idx] "
            "chains are in the cross-engine contract"
        )
    return path


def json_field(col: Column, path: str) -> Column:
    """String value at ``path`` (NULL for missing/invalid/NULL docs)."""
    return F.get_json_object(col, _check_path(path))


def json_field_bigint(col: Column, path: str) -> Column:
    """BIGINT value at ``path`` — NULL when missing/invalid/non-numeric
    (``try_cast``: the NULL-on-bad-cast escape from ANSI raising)."""
    return F.get_json_object(col, _check_path(path)).try_cast("bigint")


def json_valid(col: Column) -> Column:
    """True iff the document parses — spelled as `json_object_keys IS
    NOT NULL OR json_array_length IS NOT NULL` (objects or arrays;
    scalars are not documents in this contract)."""
    return (
        F.json_object_keys(col).isNotNull()
        | F.json_array_length(col).isNotNull()
    )


def json_field_sql(col_expr: str, path: str, *, as_bigint: bool = False) -> str:
    """DuckDB twin of :func:`json_field`/:func:`json_field_bigint` —
    json_valid-guarded so malformed docs yield NULL instead of an
    error, matching Spark's tolerant semantics."""
    _check_path(path)
    # NOT a CASE guard: DuckDB casts the whole input vector
    # VARCHAR->JSON before CASE filters rows, so malformed rows error
    # anyway — try_cast to JSON yields NULL per-row instead
    inner = (
        f"json_extract_string(try_cast({col_expr} as json), '{path}')"
    )
    return f"try_cast(({inner}) as bigint)" if as_bigint else inner


def json_valid_sql(col_expr: str) -> str:
    """DuckDB twin of :func:`json_valid` (same object-or-array rule).
    coalesce: DuckDB json_valid(NULL) is NULL while the Spark spelling
    yields false — the guard must be a real boolean either way."""
    return (
        f"coalesce(json_type(try_cast({col_expr} as json)) "
        f"in ('OBJECT', 'ARRAY'), false)"
    )
