"""Deterministic synthetic Common-Crawl-style corpus (the input_hint shape).

Generates the exact input-table shape from BASELINE.json.input_hint —
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
— fully seeded and *per-row deterministic*: row i's content depends only on
(seed, i), never on partitioning, so any parallelism produces the same
table. Scales via ``spark.range`` + ``mapInPandas`` (no driver-side
materialization; generating 10^12 rows is the same code path).

The ``text`` column carries Loghub-style log lines (web-server / syslog /
app-log shapes) drawn from a fixed template bank with variable slots, so
the Drain pipeline has realistic clustering structure: a few boilerplate
templates dominate (the skew the north rule requires us to handle).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

LANGS = ["en", "de", "fr", "es", "zh"]
DOMAINS = [
    "example.com", "logs.acme.io", "srv.foobar.net", "app.widgets.org",
    "cdn.bigsite.com", "shop.retail.biz", "api.cloudy.dev", "blog.writer.me",
]

# Template bank: (weight, template with {} slots). Weights are skewed —
# boilerplate dominates, mirroring real web/log corpora.
TEMPLATE_BANK: list[tuple[int, str]] = [
    (40, "GET {path} HTTP/1.1 returned {code} in {ms} ms"),
    (25, "POST {path} HTTP/1.1 returned {code} in {ms} ms"),
    (20, "User {user} logged in from {ip} session {hex}"),
    (12, "User {user} logged out after {num} minutes"),
    (10, "Failed to connect to {host} on port {port} retry {num}"),
    (8, "Cache miss for key {hex} fetched from origin in {ms} ms"),
    (8, "Disk usage on {host} at {pct} percent"),
    (6, "Scheduled job {word}-{num} completed with status {code}"),
    (5, "ERROR database query took {ms} ms exceeding threshold"),
    (4, "WARN memory usage {pct} percent on worker {num}"),
    (3, "Payment {hex} processed for account {num} amount {amt}"),
    (3, "DNS lookup for {host} failed after {ms} ms"),
    (2, "TLS handshake with {host} completed using {word} cipher"),
    (2, "Queue {word} depth {num} exceeds watermark {num2}"),
    (1, "Kernel panic recovered on node {host} uptime {num} hours"),
]
WORDS = ["alpha", "bravo", "delta", "gamma", "omega", "sigma", "kappa", "zeta"]
USERS = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]
PATHS = ["/index.html", "/api/v1/items", "/static/app.js", "/login", "/checkout",
         "/images/logo.png", "/health", "/api/v2/users", "/feed.xml", "/admin"]
CODES = ["200", "200", "200", "301", "404", "500", "503"]

_CUM_WEIGHTS: list[int] = []
_total = 0
for w, _ in TEMPLATE_BANK:
    _total += w
    _CUM_WEIGHTS.append(_total)
TOTAL_WEIGHT = _total

EPOCH = datetime(2024, 1, 1)


def _rng_ints(seed: int, row: int, n: int) -> list[int]:
    """n deterministic 32-bit ints from md5(seed, row) — stable across
    Python versions/platforms (unlike random.Random state internals)."""
    out: list[int] = []
    counter = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{row}:{counter}".encode()).digest()
        for i in range(0, 16, 4):
            out.append(int.from_bytes(h[i : i + 4], "big"))
        counter += 1
    return out[:n]


def _fill_template(template: str, ints: list[int], k: int) -> tuple[str, int]:
    out = []
    i = 0
    pos = 0
    while pos < len(template):
        ch = template[pos]
        if ch == "{":
            end = template.index("}", pos)
            slot = template[pos + 1 : end]
            v = ints[k % len(ints)]
            k += 1
            if slot == "path":
                out.append(PATHS[v % len(PATHS)])
            elif slot == "code":
                out.append(CODES[v % len(CODES)])
            elif slot == "ms":
                out.append(str(v % 5000))
            elif slot == "user":
                out.append(USERS[v % len(USERS)])
            elif slot == "ip":
                out.append(f"{10 + v % 240}.{(v >> 8) % 256}.{(v >> 16) % 256}.{1 + v % 254}")
            elif slot == "hex":
                out.append(f"{v:08x}")
            elif slot in ("num", "num2"):
                out.append(str(v % 100000))
            elif slot == "host":
                out.append(f"srv-{v % 50:02d}.internal")
            elif slot == "port":
                out.append(str(1024 + v % 60000))
            elif slot == "pct":
                out.append(str(v % 101))
            elif slot == "word":
                out.append(WORDS[v % len(WORDS)])
            elif slot == "amt":
                out.append(f"{(v % 100000) / 100:.2f}")
            else:
                out.append(slot)
            pos = end + 1
        else:
            out.append(ch)
            pos += 1
        i += 1
    return "".join(out), k


def make_labeled_row(seed: int, row_id: int, lines_per_doc: int = 4) -> tuple:
    """(url, warc_ts, html, text, lang, labels): same deterministic
    generation as :func:`make_row`, additionally returning the
    template-bank index of each line — the seeded GROUND TRUTH for the
    accuracy scorecard (which bank template produced which line)."""
    ints = _rng_ints(seed, row_id, 8 + 4 * lines_per_doc)
    domain = DOMAINS[ints[0] % len(DOMAINS)]
    url = f"https://{domain}/page/{row_id}"
    warc_ts = EPOCH + timedelta(seconds=int(ints[1]) % (365 * 24 * 3600))
    lang = LANGS[ints[2] % len(LANGS)]
    k = 3
    lines = []
    labels: list[int] = []
    n_lines = 1 + ints[k] % lines_per_doc
    k += 1
    for _ in range(n_lines):
        pick = ints[k] % TOTAL_WEIGHT
        k += 1
        idx = next(i for i, cw in enumerate(_CUM_WEIGHTS) if pick < cw)
        line, k = _fill_template(TEMPLATE_BANK[idx][1], ints, k)
        lines.append(line)
        labels.append(idx)
    text = "\n".join(lines)
    html = f"<html><body><pre>{text}</pre></body></html>".encode()
    return (url, warc_ts, html, text, lang, labels)


def make_row(seed: int, row_id: int, lines_per_doc: int = 4) -> tuple:
    return make_labeled_row(seed, row_id, lines_per_doc)[:5]


def generate_pages(
    spark: SparkSession, n_rows: int, seed: int = 42, lines_per_doc: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas, per-row seeded."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [make_row(seed, int(i), lines_per_doc) for i in batch["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    rng = spark.range(n_rows, numPartitions=partitions)
    return rng.mapInPandas(_gen, schema=SCHEMA)


def generate_log_lines(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Exploded variant: one log line per row (url, line_no, text)."""
    from pyspark.sql import functions as F

    pages = generate_pages(spark, n_rows, seed, partitions=partitions)
    return pages.select(
        "url",
        F.posexplode(F.split("text", "\n")).alias("line_no", "text"),
    )


def gt_template(idx: int) -> str:
    """Ground-truth template of bank entry ``idx`` in extractor space:
    every variable slot becomes the ``<*>`` wildcard — the Loghub-style
    target a parser's extracted template is scored against (PA)."""
    import re as _re

    return _re.sub(r"\{\w+\}", "<*>", TEMPLATE_BANK[idx][1])


def generate_labeled_lines(
    spark: SparkSession, n_rows: int, seed: int = 42, lines_per_doc: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Labeled Loghub-style fixture: one line per row with its seeded
    ground truth — (url, line_no, text, gt_id, gt_template). ``gt_id`` is
    the template-bank index that generated the line; ``gt_template`` the
    slot-wildcarded target template. Distributed and per-row
    deterministic like :func:`generate_pages`."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"url": [], "line_no": [], "text": [], "gt_id": [], "gt_template": []}
            for i in batch["id"]:
                url, _ts, _html, text, _lang, labels = make_labeled_row(
                    seed, int(i), lines_per_doc
                )
                for line_no, (line, idx) in enumerate(zip(text.split("\n"), labels)):
                    out["url"].append(url)
                    out["line_no"].append(line_no)
                    out["text"].append(line)
                    out["gt_id"].append(f"gt_{idx:02d}")
                    out["gt_template"].append(gt_template(idx))
            yield pd.DataFrame(out)

    rng = spark.range(n_rows, numPartitions=partitions)
    return rng.mapInPandas(
        _gen,
        schema="url string, line_no int, text string, gt_id string, gt_template string",
    )
