"""HTML text extraction for web corpora: tag-aware text, title, link
and meta extraction as pure JVM column expressions.

The north-rule input table carries Common-Crawl-style pages with an
``html: binary`` column; the text column every downstream stage consumes
(parse, dedup, language ID, quality scoring) is EXTRACTED from that
markup. This module does the extraction Spark-side with zero Python in
the hot path: every function is a ``regexp_replace``/``regexp_extract``
chain, fully codegen'd, so extraction rides the same whole-stage-codegen
span as cleaning and tokenization.

``html_to_text`` applies the standard pipeline in a fixed order:

1. drop ``<script>``/``<style>``/``<noscript>``/``<template>`` element
   bodies (their content is code, not prose);
2. drop HTML comments (``<!-- ... -->``, non-greedy);
3. turn paragraph-breaking close tags and ``<br>`` into newlines so
   block structure survives tag stripping;
4. strip every remaining tag;
5. decode the ubiquitous named entities (amp/lt/gt/quot/apos/nbsp —
   ``&amp;`` LAST so ``&amp;lt;`` decodes to the literal ``&lt;`` the
   author wrote, not to ``<``) and decimal numeric references for the
   ASCII range via a small lookup chain;
6. collapse whitespace: intra-line runs to one space, blank-line runs
   to one newline, trim the ends.

Known limitation, shared with every regex extractor (and stated here so
callers don't discover it in production): tags whose ATTRIBUTE VALUES
contain a raw ``>`` (``<a title="a>b">``) terminate the tag match early.
Real-world crawl HTML overwhelmingly escapes these; a conforming
streaming tokenizer is the upgrade path if a corpus proves otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# elements whose CONTENT must be dropped, not just their tags (head:
# browsers don't render it — title/meta have their own extractors)
_DROP_CONTENT = ("script", "style", "noscript", "template", "head")

# close tags (and void tags) that imply a line break in rendered text
_BLOCK_BREAK = (
    "p|div|br|li|ul|ol|tr|table|h[1-6]|blockquote|pre|section|article|"
    "header|footer|figure|figcaption|form|fieldset|dl|dt|dd"
)

_NAMED_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: &amp;lt; → &lt; (literal), not <
)


def decode_entities(text: Column) -> Column:
    """Decode the common named entities plus decimal numeric references
    for printable ASCII (``&#65;`` → ``A``). Chain order puts ``&amp;``
    last per the module docstring."""
    out = text
    # decimal numeric references for printable ASCII, one regexp per
    # decade would be silly — use a single pass via a translate trick:
    # Java regex can't compute chr(), so handle the handful that appear
    # in real corpora overwhelmingly often, exactly.
    for code, ch in ((34, '"'), (38, "\x01"), (39, "'"), (60, "\x02"), (62, "\x03")):
        out = F.regexp_replace(out, f"&#0*{code};", ch.replace("\\", "\\\\"))
    for ent, ch in _NAMED_ENTITIES:
        out = F.regexp_replace(out, ent, "$0" if ch == "$" else ch)
    # numeric-escaped &, <, > decode to the LITERAL character without
    # re-entering the tag/entity passes (placeholders swapped in last)
    out = F.regexp_replace(out, "\x01", "&")
    out = F.regexp_replace(out, "\x02", "<")
    out = F.regexp_replace(out, "\x03", ">")
    return out


def _strip_nonrendered(html: Column) -> Column:
    """Drop the content that never renders — script/style/noscript/
    template/head bodies and comments. The shared first step of every
    extractor here, so anchor/paragraph/text views all agree on what
    counts as page content."""
    u = html
    for el in _DROP_CONTENT:
        u = F.regexp_replace(u, rf"(?is)<{el}\b[^>]*>.*?</{el}\s*>", " ")
    return F.regexp_replace(u, r"(?s)<!--.*?-->", "")


def html_to_text(html: Column) -> Column:
    """Rendered-text approximation of ``html`` (steps 1-6 above) as one
    JVM expression chain. Accepts a string column; for a binary column
    pass ``F.decode(col, 'UTF-8')`` (crawl charsets beyond UTF-8 are the
    caller's transcode step)."""
    u = _strip_nonrendered(html)
    u = F.regexp_replace(u, rf"(?i)</?({_BLOCK_BREAK})\b[^>]*/?>", "\n")
    u = F.regexp_replace(u, r"(?s)<[^>]*>", "")
    u = decode_entities(u)
    u = F.regexp_replace(u, r"[ \t\x0b\f\r]+", " ")
    u = F.regexp_replace(u, r" ?\n ?", "\n")
    u = F.regexp_replace(u, r"\n{2,}", "\n")
    return F.regexp_replace(u, r"^[\s]+|[\s]+$", "")  # trim() skips \n


def html_title(html: Column) -> Column:
    """Text of the first ``<title>`` element (entity-decoded,
    whitespace-collapsed); empty string when absent."""
    raw = F.regexp_extract(html, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    return F.trim(F.regexp_replace(decode_entities(raw), r"\s+", " "))


def html_links(html: Column) -> Column:
    """``href`` targets of anchor tags, in document order, as
    ``array<string>``. Handles single/double-quoted and bare values;
    entity-decoding applied per link (hrefs legally contain ``&amp;``)."""
    hrefs = F.regexp_extract_all(
        html,
        F.lit(r"(?is)<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))"),
        0,
    )
    one = r"(?is)^<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+)).*"
    return F.transform(
        hrefs,
        lambda m: decode_entities(
            F.when(F.regexp_extract(m, one, 1) != "", F.regexp_extract(m, one, 1))
            .when(F.regexp_extract(m, one, 2) != "", F.regexp_extract(m, one, 2))
            .otherwise(F.regexp_extract(m, one, 3))
        ),
    )


def html_anchors(html: Column) -> Column:
    """Anchors with their link text, in document order, as
    ``array<struct<href: string, text: string>>`` — the raw material of
    anchor-text aggregation (the classic web-search relevance signal:
    what OTHER pages call a page). Anchors without an ``href`` are
    skipped; the inner text is tag-stripped, entity-decoded and
    whitespace-collapsed like :func:`html_to_text`."""
    matches = F.regexp_extract_all(
        html,
        F.lit(r"(?is)<a\b[^>]*\bhref\s*=[^>]*>.*?</a\s*>"),
        0,
    )
    href_re = r"(?is)^<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+)).*"
    text_re = r"(?is)^<a\b[^>]*>(.*)</a\s*>$"

    def one(m: Column) -> Column:
        href = (
            F.when(F.regexp_extract(m, href_re, 1) != "", F.regexp_extract(m, href_re, 1))
            .when(F.regexp_extract(m, href_re, 2) != "", F.regexp_extract(m, href_re, 2))
            .otherwise(F.regexp_extract(m, href_re, 3))
        )
        inner = F.regexp_replace(F.regexp_extract(m, text_re, 1), r"(?s)<[^>]*>", " ")
        text = F.trim(F.regexp_replace(decode_entities(inner), r"\s+", " "))
        return F.struct(
            decode_entities(href).alias("href"), text.alias("text")
        )

    return F.transform(matches, one)


def html_tag_seq(html: Column) -> Column:
    """The page's structural skeleton: lowercased tag-name sequence
    (closing tags keep their ``/``) joined with ``>``, e.g.
    ``html>head>title>/title>/head>body>p>/p>/body>/html``.

    Pages generated by one CMS template share this skeleton even when
    every word of content differs — grouping a crawl by ``md5`` of it
    is the standard template/boilerplate clustering move. Comments are
    stripped first and script/style/noscript/template BODIES are
    dropped while their own tags are kept (their content legally
    contains ``<p>``-looking strings that are code, not structure).
    Pure JVM chain like everything in this module."""
    u = F.regexp_replace(html, r"(?s)<!--.*?-->", "")
    for el in ("script", "style", "noscript", "template"):
        u = F.regexp_replace(u, rf"(?is)(<{el}\b[^>]*>).*?(</{el}\s*>)", "$1$2")
    # name tail admits - and : so HTML5 custom elements (<app-header>)
    # and namespaced tags (<svg:path>) keep their full names — distinct
    # templates must not merge on a shared pre-hyphen prefix
    names = F.regexp_extract_all(
        F.lower(u), F.lit(r"<(/?[a-z][a-z0-9:-]*)"), 1
    )
    return F.array_join(names, ">")


def html_tag_fingerprint(html: Column) -> Column:
    """``md5`` of :func:`html_tag_seq` — the grouping key for template
    clustering."""
    return F.md5(F.encode(html_tag_seq(html), "UTF-8"))


def html_paragraphs(html: Column) -> Column:
    """Decoded text of each ``<p>`` element, in document order, as
    ``array<string>`` — the candidate blocks main-content extraction
    scores. Inner markup is stripped, entities decoded, whitespace
    collapsed (same treatment as :func:`html_to_text`)."""
    u = _strip_nonrendered(html)
    paras = F.regexp_extract_all(u, F.lit(r"(?is)<p\b[^>]*>(.*?)</p\s*>"), 1)

    def one(m: Column) -> Column:
        # inline tags collapse to nothing, the html_to_text convention
        # (<b>mark</b>up stays one word)
        inner = F.regexp_replace(m, r"(?s)<[^>]*>", "")
        return F.trim(F.regexp_replace(decode_entities(inner), r"\s+", " "))

    return F.transform(paras, one)


def html_main_text(html: Column) -> Column:
    """The page's main content under the classic largest-text-block
    heuristic (the core move of readability/trafilatura-style
    extractors, reduced to its density argmax): the longest decoded
    ``<p>`` block, FIRST on ties — deterministic, so the result is
    closed-form for a seeded corpus and stable across engines. Empty
    string when the page has no paragraphs.

    One ``aggregate`` over the paragraph array (still a pure JVM
    expression — no shuffle, no UDF): carry the running best
    (len, first-index-wins) through a struct fold."""
    paras = html_paragraphs(html)
    best = F.aggregate(
        paras,
        F.struct(F.lit("").alias("txt"), F.lit(-1).cast("int").alias("len")),
        lambda acc, p: F.when(
            F.length(p).cast("int") > acc.getField("len"),
            F.struct(p.alias("txt"), F.length(p).cast("int").alias("len")),
        ).otherwise(acc),
    )
    return best.getField("txt")


def html_boilerplate_ratio_e4(html: Column) -> Column:
    """Anchor-text chars as a fraction of rendered-text chars, in exact
    integer basis points (``(anchor_chars·10⁴) div body_chars``; 0 for
    an empty body) — the classic link-density boilerplate signal. Both
    counts see the SAME content: non-rendered blocks (script/style/
    comment/head) are stripped before anchor extraction exactly as
    :func:`html_to_text` strips them, so an ``<a>`` inside a JS string
    or an HTML comment contributes to neither side (review r5: counted
    on the anchor side only, the ratio could exceed 10⁴)."""
    anchor_chars = F.aggregate(
        html_anchors(_strip_nonrendered(html)),
        F.lit(0).cast("bigint"),
        lambda acc, a: acc + F.length(a.getField("text")),
    )
    body_chars = F.length(html_to_text(html)).cast("bigint")
    # floor == integer div here: both operands are non-negative
    return F.when(
        body_chars > 0,
        F.floor((anchor_chars * 10_000) / body_chars).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))


def html_meta(html: Column, name: str) -> Column:
    """``content`` of ``<meta name="..." content="...">`` (either
    attribute order), entity-decoded; empty string when absent."""
    if not name.replace("-", "").replace(":", "").isalnum():
        raise ValueError(f"meta name must be a plain token, got {name!r}")
    fwd = rf"(?is)<meta\b[^>]*\bname\s*=\s*[\"']{name}[\"'][^>]*\bcontent\s*=\s*[\"']([^\"']*)[\"']"
    rev = rf"(?is)<meta\b[^>]*\bcontent\s*=\s*[\"']([^\"']*)[\"'][^>]*\bname\s*=\s*[\"']{name}[\"']"
    f1 = F.regexp_extract(html, fwd, 1)
    return decode_entities(F.when(f1 != "", f1).otherwise(F.regexp_extract(html, rev, 1)))
