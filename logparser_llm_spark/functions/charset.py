"""Charset sniffing and transcode for crawl payloads: binary HTML in,
string out, never a job-killing decode error.

Real crawls are not UTF-8: legacy servers send Latin-1/Windows-1252,
some send UTF-16 with a BOM, and `Content-Type` headers routinely lie —
so the byte→text step needs WHATWG-style sniffing, and it must be
TOTAL: Spark 4's ``decode`` raises ``MALFORMED_CHARACTER_CODING`` on
invalid input, which on a 10^12-page corpus means one mojibake page
kills an executor stage. Everything here is a pure JVM expression chain
(binary prefix compares, ``is_valid_utf8``, lazy CASE so a decode only
runs on rows its guard admits) with ISO-8859-1 — the one charset under
which every byte sequence is valid — as the terminal fallback.

Sniff order (``sniff_charset``), per the WHATWG encoding sniff:

1. BOM wins: ``FF FE`` → UTF-16LE, ``FE FF`` → UTF-16BE,
   ``EF BB BF`` → UTF-8;
2. a ``<meta charset=...>`` / ``http-equiv`` ``charset=`` token inside
   the first 1024 bytes (scanned via a lossless Latin-1 view), with
   the usual aliases normalized — ``latin-1``/``windows-1252``/
   ``cp1252`` map to ISO-8859-1 (the 32 C1 positions where 1252
   differs are outside Spark's supported charset set; the mapping is
   the standard crawl approximation and is documented here rather than
   hidden), ``ascii`` to US-ASCII;
3. otherwise content sniff: valid UTF-8 → UTF-8, else ISO-8859-1.

``decode_page`` then decodes by the sniffed charset, strips the BOM,
and — because meta tags lie — re-guards the UTF-8 path with
``is_valid_utf8`` so a page DECLARING utf-8 while shipping Latin-1
bytes degrades to Latin-1 instead of raising.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# alias → canonical (only charsets Spark's decode supports; see module
# docstring for the windows-1252 approximation)
_ALIASES = {
    "utf-8": "UTF-8",
    "utf8": "UTF-8",
    "iso-8859-1": "ISO-8859-1",
    "iso8859-1": "ISO-8859-1",
    "latin-1": "ISO-8859-1",
    "latin1": "ISO-8859-1",
    "windows-1252": "ISO-8859-1",
    "cp1252": "ISO-8859-1",
    "us-ascii": "US-ASCII",
    "ascii": "US-ASCII",
}

_META_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?\s*([a-zA-Z0-9_-]+)"""

_MAX_LEN = (1 << 31) - 1  # substring length for "rest of the payload"


def _prefix_is(data: Column, hex_bytes: str) -> Column:
    raw = bytes.fromhex(hex_bytes)
    return F.substring(data, 1, len(raw)) == F.lit(raw)


def _valid_utf8(data: Column) -> Column:
    return F.call_function("is_valid_utf8", data)


def _meta_charset(data: Column) -> Column:
    """Normalized charset token from a meta tag in the first 1024
    bytes; empty string when absent or unrecognized."""
    head = F.decode(F.substring(data, 1, 1024), "ISO-8859-1")
    tok = F.lower(F.regexp_extract(head, _META_RE, 1))
    out = F.lit("")
    for alias, canon in _ALIASES.items():
        out = F.when(tok == alias, F.lit(canon)).otherwise(out)
    return out


def sniff_charset(data: Column) -> Column:
    """Sniffed charset name of a binary payload (see module docstring
    for the order): one of UTF-16LE, UTF-16BE, UTF-8, US-ASCII,
    ISO-8859-1."""
    meta = _meta_charset(data)
    return (
        F.when(_prefix_is(data, "FFFE"), F.lit("UTF-16LE"))
        .when(_prefix_is(data, "FEFF"), F.lit("UTF-16BE"))
        .when(_prefix_is(data, "EFBBBF"), F.lit("UTF-8"))
        .when(meta != "", meta)
        .when(_valid_utf8(data), F.lit("UTF-8"))
        .otherwise(F.lit("ISO-8859-1"))
    )


def decode_page(data: Column) -> Column:
    """Decode a binary payload to string by its sniffed charset — BOM
    stripped, total (a lying utf-8 meta degrades to Latin-1 rather
    than raising; Latin-1 itself never fails)."""
    cs = sniff_charset(data)
    return (
        F.when(
            _prefix_is(data, "FFFE"),
            F.decode(F.substring(data, 3, _MAX_LEN), "UTF-16LE"),
        )
        .when(
            _prefix_is(data, "FEFF"),
            F.decode(F.substring(data, 3, _MAX_LEN), "UTF-16BE"),
        )
        .when(
            _prefix_is(data, "EFBBBF"),
            F.decode(F.substring(data, 4, _MAX_LEN), "UTF-8"),
        )
        .when((cs == "UTF-8") & _valid_utf8(data), F.decode(data, "UTF-8"))
        # US-ASCII decodes via its Latin-1 superset: identical on true
        # ASCII, total when the label lied about high bytes
        .otherwise(F.decode(data, "ISO-8859-1"))
    )
