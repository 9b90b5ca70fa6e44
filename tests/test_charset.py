"""Charset sniff/transcode pins: BOM precedence, meta aliases, lying
meta degradation, invalid-UTF-8 fallback totality. The sf0.01
DuckDB-oracle parity for the registered ``charset_decode`` query runs
via test_queries_oracle."""

from pyspark.sql import functions as F

from logparser_llm_spark.functions.charset import decode_page, sniff_charset

CASES = [
    # (payload bytes, expected charset, expected decoded text)
    ("café utf8".encode("utf-8"), "UTF-8", "café utf8"),
    (b"\xef\xbb\xbf" + "café bom".encode("utf-8"), "UTF-8", "café bom"),
    (b"\xff\xfe" + "café 16le".encode("utf-16-le"), "UTF-16LE", "café 16le"),
    (b"\xfe\xff" + "café 16be".encode("utf-16-be"), "UTF-16BE", "café 16be"),
    (
        '<meta charset="iso-8859-1">café'.encode("latin-1"),
        "ISO-8859-1",
        '<meta charset="iso-8859-1">café',
    ),
    (
        "<META CHARSET='Windows-1252'>naïve".encode("latin-1"),
        "ISO-8859-1",
        "<META CHARSET='Windows-1252'>naïve",
    ),
    # no meta, invalid utf-8 → content-sniffed latin-1 (totality)
    ("résumé no meta".encode("latin-1"), "ISO-8859-1", "résumé no meta"),
    # LYING meta: declares utf-8, ships latin-1 bytes → degrade, don't raise
    (
        '<meta charset="utf-8">caf\xe9'.encode("latin-1"),
        "UTF-8",
        '<meta charset="utf-8">café',
    ),
    ("plain ascii".encode(), "UTF-8", "plain ascii"),
    (
        '<meta http-equiv="Content-Type" content="text/html; charset=ascii">ok'.encode(),
        "US-ASCII",
        '<meta http-equiv="Content-Type" content="text/html; charset=ascii">ok',
    ),
    # BOM beats a contradicting meta tag (WHATWG order)
    (
        b"\xef\xbb\xbf" + '<meta charset="iso-8859-1">x'.encode(),
        "UTF-8",
        '<meta charset="iso-8859-1">x',
    ),
    # unknown meta value falls through to the content sniff
    ('<meta charset="klingon">hé'.encode("utf-8"), "UTF-8", '<meta charset="klingon">hé'),
    (b"", "UTF-8", ""),
]


def test_sniff_and_decode_pins(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "i int, b binary"
    )
    rows = {
        r.i: r
        for r in df.select(
            "i",
            sniff_charset(F.col("b")).alias("cs"),
            decode_page(F.col("b")).alias("t"),
        ).collect()
    }
    for i, (_, exp_cs, exp_t) in enumerate(CASES):
        assert (rows[i].cs, rows[i].t) == (exp_cs, exp_t), (i, rows[i])


def test_meta_only_scanned_in_first_kb(spark):
    # a charset declaration buried past 1024 bytes is ignored (WHATWG
    # prescan window) — content sniff decides instead
    late = b"x" * 1500 + '<meta charset="iso-8859-1">'.encode()
    df = spark.createDataFrame([(late,)], "b binary")
    [r] = df.select(sniff_charset(F.col("b")).alias("cs")).collect()
    assert r.cs == "UTF-8"  # valid utf-8 bytes, meta out of window


def test_null_payload_yields_nulls(spark):
    df = spark.createDataFrame([(None,)], "b binary")
    [r] = df.select(
        sniff_charset(F.col("b")).alias("cs"), decode_page(F.col("b")).alias("t")
    ).collect()
    assert r.t is None
