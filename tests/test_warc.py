"""WARC container: byte-level format pins, reader/writer round trips
(plain, gzip-per-record, mixed), corrupt-input contracts, HTTP payload
codec, and the distributed explode vs the local parser. The sf0.01
DuckDB-oracle parity for the registered ``warc_extract`` query runs via
test_queries_oracle."""

import gzip

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.sources.warc import (
    build_http_response,
    parse_http_response,
    parse_warc,
    synth_warc_corpus,
    warc_records,
    write_warc_record,
)


def test_record_bytes_pinned():
    rec = write_warc_record(
        "response",
        b"BODY",
        target_uri="https://x.com/",
        warc_date="2024-01-02T00:00:00Z",
        content_type="text/plain",
    )
    assert rec == (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.com/\r\n"
        b"WARC-Date: 2024-01-02T00:00:00Z\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: 4\r\n\r\n"
        b"BODY\r\n\r\n"
    )


def test_round_trip_plain_gzip_and_mixed():
    r1 = write_warc_record("warcinfo", b"software: t\r\n")
    r2 = write_warc_record("response", b"hello", target_uri="u1", gzip_member=True)
    r3 = write_warc_record("response", b"", target_uri="u2")
    recs = parse_warc(r1 + r2 + r3)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1]["payload"] == b"hello" and recs[1]["target_uri"] == "u1"
    assert recs[2]["payload"] == b""


def test_gzip_writer_is_deterministic():
    a = write_warc_record("response", b"x", gzip_member=True)
    b = write_warc_record("response", b"x", gzip_member=True)
    assert a == b


def test_corrupt_contracts():
    good = write_warc_record("response", b"hello", target_uri="u")
    with pytest.raises(ValueError, match="not terminated"):
        parse_warc(good[:-3])  # truncated terminator
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8b" + b"\x00" * 10)
    gz = write_warc_record("response", b"hello", gzip_member=True)
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(gz[:-4])
    two = gzip.compress(
        write_warc_record("a", b"1") + write_warc_record("b", b"2"), mtime=0
    )
    with pytest.raises(ValueError, match="more than one record"):
        parse_warc(two)


def test_payload_containing_crlf_crlf_survives():
    body = b"a\r\n\r\nb"  # framing must trust Content-Length, not search
    rec = parse_warc(write_warc_record("resource", body))
    assert rec[0]["payload"] == body


def test_http_response_codec():
    body = "<p>ok</p>".encode()
    raw = build_http_response(body, status=404, reason="Not Found")
    status, headers, out = parse_http_response(raw)
    assert (status, out) == (404, body)
    assert headers["content-type"].startswith("text/html")
    with pytest.raises(ValueError, match="status line"):
        parse_http_response(b"nonsense\r\n\r\nx")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_http_response(raw[:-1])  # body shorter than declared


def test_distributed_explode_matches_local(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i} " * (1 + i % 3), f"src{i % 4}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    files = synth_warc_corpus(docs, docs_per_file=10, partitions=4)
    blobs = {r.file_id: bytes(r.warc) for r in files.collect()}
    assert sorted(blobs) == list(range(6))

    rows = warc_records(files).collect()
    for fid, blob in blobs.items():
        local = parse_warc(blob)
        mine = sorted(
            (r for r in rows if r.file_id == fid), key=lambda r: r.rec_index
        )
        assert [r.warc_type for r in mine] == [r["warc_type"] for r in local]
        assert [bytes(r.payload) for r in mine] == [r["payload"] for r in local]
        assert mine[0].warc_type == "warcinfo"

    resp = [r for r in rows if r.warc_type == "response"]
    assert len(resp) == 60
    st7 = next(r for r in resp if r.target_uri.endswith("/p/7"))
    status, _, body = parse_http_response(bytes(st7.payload))
    assert status == 404
    assert body.decode().startswith("<html><body><p>text 7 ")


def test_warc_records_requires_file_id(spark):
    df = spark.createDataFrame([(b"x",)], "warc binary")
    with pytest.raises(ValueError, match="file_id"):
        warc_records(df)
