"""HTML extraction pins: exact-string behavior on adversarial pages.
The sf0.01 DuckDB-oracle parity for the registered ``html_extract``
query (closed-form rendered text over five seeded variation axes) runs
via test_queries_oracle."""

import pytest
from pyspark.sql import functions as F

from logparser_llm_spark.functions.html import (
    decode_entities,
    html_links,
    html_meta,
    html_title,
    html_to_text,
)


def _one(spark, html, col):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(col(F.col("html")).alias("v")).collect()[0].v


FULL_PAGE = (
    "<html><head><title>Doc &amp; 5</title>"
    '<meta name="author" content="writer 3"></head><body>'
    "<!-- hidden <b>c</b> --><h1>Doc &#38; 5</h1>"
    '<SCRIPT>var x = "<p>not text</p>";</SCRIPT>'
    "<style>body { color: red; }</style>"
    "<p>hello  world</p><p>end of src5</p>"
    '<div><a href="https://a.com/p?x=1&amp;y=2">more</a></div>'
    "<div><a href='https://b.com'>more</a></div>"
    "<div><a href=https://c.com>more</a></div>"
    "</body></html>"
)


def test_full_page_text_exact(spark):
    assert (
        _one(spark, FULL_PAGE, html_to_text)
        == "Doc & 5\nhello world\nend of src5\nmore\nmore\nmore"
    )


def test_title_meta_links(spark):
    assert _one(spark, FULL_PAGE, html_title) == "Doc & 5"
    assert _one(spark, FULL_PAGE, lambda c: html_meta(c, "author")) == "writer 3"
    assert _one(spark, FULL_PAGE, html_links) == [
        "https://a.com/p?x=1&y=2",
        "https://b.com",
        "https://c.com",
    ]


def test_meta_reversed_attribute_order(spark):
    h = '<head><meta content="jane" name="author"></head>'
    assert _one(spark, h, lambda c: html_meta(c, "author")) == "jane"
    assert _one(spark, h, lambda c: html_meta(c, "keywords")) == ""


def test_meta_name_validation():
    with pytest.raises(ValueError):
        html_meta(F.lit("<p>x</p>"), 'a"][x')


def test_double_escaped_entities_stay_literal(spark):
    # &amp;lt; is the AUTHOR writing "&lt;" — it must not decode to "<"
    assert (
        _one(spark, "<p>&amp;lt;tag&amp;gt; &#0038; &#60;b&#62;</p>", html_to_text)
        == "&lt;tag&gt; & <b>"
    )


def test_entity_decode_order_is_amp_last(spark):
    assert _one(spark, "a &amp;amp; b", decode_entities) == "a &amp; b"


def test_script_style_case_insensitive_and_multiline(spark):
    h = "<p>a</p><STYLE>\n.x { }\n</STYLE>\n<Script>\nif (1 < 2) {}\n</script><p>b</p>"
    assert _one(spark, h, html_to_text) == "a\nb"


def test_comment_spanning_lines_dropped(spark):
    assert _one(spark, "x<!-- line1\nline2 -->y", html_to_text) == "xy"


def test_block_tags_break_lines_inline_tags_do_not(spark):
    h = "<ul><li>one</li><li>two</li></ul><p><b>bo</b><i>ld</i></p>"
    assert _one(spark, h, html_to_text) == "one\ntwo\nbold"


def test_whitespace_collapse_crlf_nbsp(spark):
    h = "<p>a \r\n  b&nbsp;&nbsp;c</p>\r\n\r\n<p>d</p>"
    assert _one(spark, h, html_to_text) == "a\nb c\nd"


def test_no_title_no_links(spark):
    assert _one(spark, "<body><p>x</p></body>", html_title) == ""
    assert _one(spark, "<body><p>x</p></body>", html_links) == []


def test_head_content_not_in_body_text(spark):
    h = "<head><title>T</title><meta name='d' content='c'></head><p>body</p>"
    assert _one(spark, h, html_to_text) == "body"


def test_binary_column_round_trip(spark):
    df = spark.createDataFrame([(FULL_PAGE.encode(),)], "html binary")
    v = df.select(
        html_title(F.decode(F.col("html"), "UTF-8")).alias("t")
    ).collect()[0].t
    assert v == "Doc & 5"


def test_attribute_gt_limitation_is_the_documented_one(spark):
    # the documented regex limitation: a raw '>' inside an attribute
    # value ends the tag early — the tail leaks as text
    leaked = _one(spark, '<a title="a>b" href="u">x</a>', html_to_text)
    assert "b\" href=\"u\">x" in leaked


def test_anchors_href_and_text(spark):
    h = ('<p><a href="/a">One &amp; two</a></p>'
         "<a href='/b'><b>bold</b> text</a>"
         "<a href=/c>bare</a>"
         "<a name='no-href'>skipped</a>")
    from logparser_llm_spark.functions.html import html_anchors
    got = _one(spark, h, html_anchors)
    assert [(a.href, a.text) for a in got] == [
        ("/a", "One & two"),
        ("/b", "bold text"),
        ("/c", "bare"),
    ]


def test_anchors_multiline_and_empty(spark):
    from logparser_llm_spark.functions.html import html_anchors
    h = '<A HREF="/x">line1\n  line2</A>'
    got = _one(spark, h, html_anchors)
    assert [(a.href, a.text) for a in got] == [("/x", "line1 line2")]
    assert _one(spark, "<p>no links</p>", html_anchors) == []


def test_tag_seq_skeleton_and_drops(spark):
    """Script/style bodies (which legally contain '<p>'-looking code)
    and comments must not contribute tags; the drop-elements' OWN tags
    must survive; names fold to lowercase."""
    from logparser_llm_spark.functions.html import html_tag_seq
    h = ('<HTML><body><!-- <b>hidden</b> -->'
         '<SCRIPT>var x = "<p>fake</p>";</SCRIPT>'
         '<style>p > a { color: red }</style>'
         '<p>real</p></body></HTML>')
    assert _one(spark, h, html_tag_seq) == (
        "html>body>script>/script>style>/style>p>/p>/body>/html"
    )


def test_tag_fingerprint_ignores_content_and_attributes(spark):
    """Two pages from one template — different text, attributes,
    comments — share a fingerprint; a structural change breaks it."""
    from logparser_llm_spark.functions.html import html_tag_fingerprint
    a = '<html><body class="x"><p id="1">hello world</p></body></html>'
    b = "<html><body><!-- note --><p>entirely different words</p></body></html>"
    c = "<html><body><p>hello</p><p>world</p></body></html>"
    fa, fb, fc = (_one(spark, h, html_tag_fingerprint) for h in (a, b, c))
    assert fa == fb
    assert fa != fc


def test_tag_seq_custom_elements_keep_full_names(spark):
    """HTML5 custom elements and namespaced tags must not truncate at
    the hyphen/colon — templates differing past a shared prefix would
    otherwise merge."""
    from logparser_llm_spark.functions.html import html_tag_fingerprint, html_tag_seq
    h = "<my-element>x</my-element><svg:path/>"
    assert _one(spark, h, html_tag_seq) == "my-element>/my-element>svg:path"
    a = "<app-header>x</app-header>"
    b = "<app-hero>x</app-hero>"
    assert _one(spark, a, html_tag_fingerprint) != _one(spark, b, html_tag_fingerprint)


def test_paragraphs_and_main_text(spark):
    """Script-body decoy paragraphs dropped; argmax-length block wins;
    FIRST wins ties; pages without paragraphs yield ''."""
    from logparser_llm_spark.functions.html import html_main_text, html_paragraphs
    h = ('<body><script>var x = "<p>decoy paragraph wins on length</p>";</script>'
         "<p>short</p><p>the real main block of prose</p>"
         "<p><b>mark</b>up &amp; spaces  collapse</p></body>")
    assert _one(spark, h, html_paragraphs) == [
        "short",
        "the real main block of prose",
        "markup & spaces collapse",
    ]
    assert _one(spark, h, html_main_text) == "the real main block of prose"
    tie = "<p>abc</p><p>xyz</p>"
    assert _one(spark, tie, html_main_text) == "abc"
    assert _one(spark, "<div>no paragraphs</div>", html_main_text) == ""


def test_boilerplate_ratio(spark):
    from logparser_llm_spark.functions.html import html_boilerplate_ratio_e4
    # body text = "menu home about contact" (23 chars), anchor text =
    # home+about+contact = 16 chars
    h = ('<body><p>menu</p><a href="/h">home</a> <a href="/a">about</a> '
         '<a href="/c">contact</a></body>')
    got = _one(spark, h, html_boilerplate_ratio_e4)
    assert got == (16 * 10000) // 23
    assert _one(spark, "<p></p>", html_boilerplate_ratio_e4) == 0
    # anchors inside script strings / comments render nowhere and must
    # count on NEITHER side (review r5: ratio could exceed 10^4)
    hidden = ('<body><script>var a=\'<a href="/x">ten chars!</a>\';</script>'
              '<!-- <a href="/y">commented nav link</a> -->'
              '<p>hi</p><a href="/z">go</a></body>')
    assert _one(spark, hidden, html_boilerplate_ratio_e4) == (2 * 10000) // 5
