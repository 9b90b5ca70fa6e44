"""WARC (ISO 28500 Web ARChive) container support: record writer,
stream parser, HTTP-response payload codec, and the distributed explode
of WARC files into page rows.

Common Crawl — the corpus the north-rule input table models — ships as
WARC files: a concatenation of records, each a ``WARC/1.0`` version
line, CRLF-separated named headers (``WARC-Type``, ``WARC-Target-URI``,
``Content-Length``, ...), a blank line, ``Content-Length`` payload
bytes, and a ``\\r\\n\\r\\n`` terminator. Response records carry a full
HTTP/1.1 response (status line + headers + body) as their payload. In
the compressed form each RECORD is its own gzip member (the spec's
unit of random access), so a reader must iterate members, not gunzip
the file once.

Everything here is stdlib + numpy-free pure Python on the record path:

- :func:`write_warc_record` / :func:`build_http_response` — the writer
  half (used by the deterministic corpus synthesizer and tests);
- :func:`parse_warc` / :func:`parse_http_response` — the strict reader
  half (corrupt input → ``ValueError`` with a root cause, never a slice
  crash);
- :func:`warc_records` — the Spark operator: ``mapInPandas`` over
  ``(file_id, warc: binary)`` rows exploding every file into one row
  per record. The FILE is the unit of parallelism, exactly as on a real
  cluster (each executor task walks whole ~1 GB WARC files; the record
  walk inside a file is inherently sequential because each record's
  length prefix is discovered by parsing, but files parse in parallel
  across the fleet and a 100 TB crawl is ~100k files);
- :func:`synth_warc_corpus` — deterministic WARC bytes from the
  ``documents`` table (``applyInPandas`` per ``file_id`` group), used
  by the registered query and benchmarks. Even ``file_id``s are written
  gzip-per-record, odd ones uncompressed, so both read paths stay hot.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

WARC_VERSION = b"WARC/1.0"

RECORD_SCHEMA = (
    "file_id long, rec_index int, warc_type string, target_uri string, "
    "warc_date string, content_type string, payload binary"
)


# ---------------------------------------------------------------------------
# writer half


def write_warc_record(
    rec_type: str,
    payload: bytes,
    *,
    target_uri: str | None = None,
    warc_date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/octet-stream",
    record_id: str | None = None,
    gzip_member: bool = False,
) -> bytes:
    """One serialized WARC record; with ``gzip_member`` the record is
    compressed as its own gzip member (mtime pinned to 0 so output is
    deterministic)."""
    headers = [("WARC-Type", rec_type)]
    if target_uri is not None:
        headers.append(("WARC-Target-URI", target_uri))
    headers.append(("WARC-Date", warc_date))
    if record_id is not None:
        headers.append(("WARC-Record-ID", record_id))
    headers.append(("Content-Type", content_type))
    headers.append(("Content-Length", str(len(payload))))
    head = b"\r\n".join(
        [WARC_VERSION] + [f"{k}: {v}".encode() for k, v in headers]
    )
    rec = head + b"\r\n\r\n" + payload + b"\r\n\r\n"
    if gzip_member:
        return gzip.compress(rec, mtime=0)
    return rec


def build_http_response(
    body: bytes,
    *,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Serialized HTTP/1.1 response (the payload of a WARC ``response``
    record)."""
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


# ---------------------------------------------------------------------------
# reader half (strict: every corrupt shape is a ValueError with a cause)


def _split_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        k, sep, v = line.partition(b":")
        if not sep:
            raise ValueError(f"warc: malformed header line {line[:40]!r}")
        out[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
            "utf-8", "replace"
        )
    return out


def _parse_one(data: bytes, off: int) -> tuple[dict, int]:
    end_head = data.find(b"\r\n\r\n", off)
    if end_head < 0:
        raise ValueError("warc: record header block not terminated")
    head = data[off:end_head]
    ver, _, header_block = head.partition(b"\r\n")
    if not ver.startswith(b"WARC/"):
        raise ValueError(f"warc: bad version line {ver[:20]!r}")
    if not header_block:
        raise ValueError("warc: record has no headers")
    headers = _split_headers(header_block)
    try:
        n = int(headers["content-length"])
    except KeyError:
        raise ValueError("warc: record missing Content-Length") from None
    except ValueError:
        raise ValueError("warc: non-integer Content-Length") from None
    body_start = end_head + 4
    body_end = body_start + n
    if data[body_end : body_end + 4] != b"\r\n\r\n":
        raise ValueError("warc: record payload not terminated (truncated?)")
    rec = {
        "warc_type": headers.get("warc-type", ""),
        "target_uri": headers.get("warc-target-uri", ""),
        "warc_date": headers.get("warc-date", ""),
        "content_type": headers.get("content-type", ""),
        "headers": headers,
        "payload": data[body_start:body_end],
    }
    return rec, body_end + 4


def iter_warc(data: bytes) -> Iterator[dict]:
    """Iterate records of a WARC byte string; handles the
    gzip-member-per-record form (mixed with plain records) transparently
    by detecting the gzip magic at each record boundary."""
    off = 0
    while off < len(data):
        if data[off : off + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            try:
                member = d.decompress(data[off:])
            except zlib.error as e:
                raise ValueError(f"warc: corrupt gzip member: {e}") from None
            if not d.eof:
                raise ValueError("warc: truncated gzip member")
            rec, end = _parse_one(member, 0)
            if end != len(member):
                raise ValueError("warc: gzip member holds more than one record")
            yield rec
            off = len(data) - len(d.unused_data)
        else:
            rec, off = _parse_one(data, off)
            yield rec


def parse_warc(data: bytes) -> list[dict]:
    """All records of a WARC byte string (see :func:`iter_warc`)."""
    return list(iter_warc(data))


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) of a serialized HTTP response. The body
    is everything after the blank line (Content-Length, when present,
    is VERIFIED, not trusted)."""
    end_head = payload.find(b"\r\n\r\n")
    if end_head < 0:
        raise ValueError("http: header block not terminated")
    status_line, _, header_block = payload[:end_head].partition(b"\r\n")
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/") or not parts[1].isdigit():
        raise ValueError(f"http: bad status line {status_line[:40]!r}")
    headers = _split_headers(header_block) if header_block else {}
    body = payload[end_head + 4 :]
    if "content-length" in headers and int(headers["content-length"]) != len(body):
        raise ValueError("http: Content-Length does not match body size")
    return int(parts[1]), headers, body


# ---------------------------------------------------------------------------
# Spark operators


def warc_records(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """Explode WARC files into records: one output row per record of
    every input row's ``warc_col`` bytes → ``RECORD_SCHEMA``. Pure
    mapInPandas (no shuffle): each task walks its files sequentially,
    files parse in parallel across tasks — repartition the input by
    file when upstream file sizes are skewed."""
    cols = [c for c in df.columns if c != warc_col]
    if "file_id" not in cols:
        raise ValueError("warc_records input needs a file_id column")

    def walk(batches):
        for pdf in batches:
            out = []
            for fid, blob in zip(pdf["file_id"], pdf[warc_col]):
                for i, rec in enumerate(iter_warc(bytes(blob))):
                    out.append(
                        (
                            int(fid),
                            i,
                            rec["warc_type"],
                            rec["target_uri"],
                            rec["warc_date"],
                            rec["content_type"],
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "file_id",
                    "rec_index",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "payload",
                ],
            )

    return df.select("file_id", warc_col).mapInPandas(walk, RECORD_SCHEMA)


def synth_warc_corpus(
    docs: DataFrame, docs_per_file: int = 25, partitions: int = 32
) -> DataFrame:
    """Deterministic WARC files from a ``documents``-shaped frame
    (doc_id, text, source) → (file_id, warc: binary). Each file holds a
    ``warcinfo`` record plus one HTTP ``response`` record per member
    doc: url ``https://{source}.example.com/p/{doc_id}``, status 404
    when ``doc_id % 10 == 7`` else 200, body
    ``<html><body><p>{text}</p></body></html>``, date
    ``2024-01-{1 + doc_id % 28:02d}T00:00:00Z``. Even ``file_id``s are
    gzip-per-record, odd plain — both reader paths exercised. All
    fields are closed-form in (doc_id, text, source), which is what
    lets the registered query carry a full DuckDB oracle."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        gz = fid % 2 == 0
        parts = [
            write_warc_record(
                "warcinfo",
                b"software: logparser-llm-spark\r\n",
                content_type="application/warc-fields",
                gzip_member=gz,
            )
        ]
        for _, r in pdf.iterrows():
            did = int(r["doc_id"])
            body = f"<html><body><p>{r['text']}</p></body></html>".encode()
            status, reason = (404, "Not Found") if did % 10 == 7 else (200, "OK")
            parts.append(
                write_warc_record(
                    "response",
                    build_http_response(body, status=status, reason=reason),
                    target_uri=f"https://{r['source']}.example.com/p/{did}",
                    warc_date=f"2024-01-{1 + did % 28:02d}T00:00:00Z",
                    content_type="application/http;msgtype=response",
                    gzip_member=gz,
                )
            )
        return pd.DataFrame({"file_id": [fid], "warc": [b"".join(parts)]})

    with_fid = docs.select(
        F.expr(f"cast(doc_id as long) div {int(docs_per_file)}").alias("file_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        "source",
    ).repartition(partitions, "file_id")
    return with_fid.groupBy("file_id").applyInPandas(
        build, "file_id long, warc binary"
    )
