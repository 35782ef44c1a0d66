"""HTML extraction: content blocks kept, boilerplate (script/style,
nav link-lists, short fragments) dropped, malformed markup tolerated."""

from mod_reservoir_spark.pipeline.html import extract_html, extract_html_text

PAGE = """
<html><head><title>T</title><style>body{color:red}</style>
<script>var x = "SHOULD NEVER APPEAR";</script></head>
<body>
<div class="nav"><a href="/">Home</a> | <a href="/a">Products</a> |
<a href="/b">About us page</a> | <a href="/c">Contact form</a></div>
<h1>The actual headline of this article right here</h1>
<p>This is the first real paragraph with enough characters to pass the
minimum block length and almost no links at all.</p>
<p>Second paragraph mentions <a href="x">one link</a> inside a lot of
ordinary prose so its link density stays well under the limit.</p>
<p>tiny</p>
<div class="footer"><a href="/tos">Terms of service</a>
<a href="/priv">Privacy and cookies</a></div>
</body></html>
"""


def test_extract_html_semantics():
    text, n_blocks, n_kept = extract_html(PAGE)
    assert "SHOULD NEVER APPEAR" not in text
    assert "color:red" not in text
    assert "first real paragraph" in text
    assert "one link" in text            # low-density inline link kept
    assert "actual headline" in text
    assert "Products" not in text        # link-dense nav dropped
    assert "Terms of service" not in text
    assert "tiny" not in text            # under min_block_chars
    assert n_kept < n_blocks
    # paragraphs are separate blocks
    assert text.count("\n\n") >= 2


def test_extract_html_edge_cases():
    assert extract_html(None) == ("", 0, 0)
    assert extract_html("") == ("", 0, 0)
    assert extract_html("plain text with no markup at all here")[0] == (
        "plain text with no markup at all here"
    )
    # malformed: unclosed tags, bogus entities, nested <a>
    t, _, _ = extract_html(
        "<p>broken &notanentity; markup <b>with <a href=x>nested "
        "<a>anchors</p><div>and a second block long enough to keep</div>"
    )
    assert "and a second block long enough to keep" in t
    # entity decoding
    t2, _, _ = extract_html(
        "<p>fish &amp; chips &mdash; a long enough paragraph here</p>"
    )
    assert "fish & chips —" in t2


def test_extract_html_text_distributed(spark):
    rows = [(0, PAGE), (1, None), (2, "<p>" + "word " * 30 + "</p>")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in extract_html_text(docs).collect()}
    assert got[0].text.startswith("The actual headline")
    assert got[1].text == "" and got[1].n_blocks == 0
    assert got[2].n_kept_blocks == 1
    # per-row results equal the core function (same params)
    for i, h in rows:
        assert got[i].text == extract_html(h)[0]


def test_extract_html_title_dropped_without_head():
    """Crawled pages often omit <head>; the SEO title must still not
    leak into the content."""
    t, _, _ = extract_html(
        "<html><title>Acme Widgets | Best Widget Deals Online</title>"
        "<body><p>the genuine article text long enough to keep here</p>"
    )
    assert "Acme Widgets" not in t
    assert "genuine article text" in t


def test_extract_html_pretty_printed_anchor_density():
    """Whitespace runs inside a pretty-printed anchor must not inflate
    link density and drop a real content paragraph."""
    html = (
        "<p>This sober paragraph carries plenty of ordinary prose and "
        "just one link: click\n" + " " * 41 + "here, nothing more, so "
        "it must comfortably clear the density threshold.</p>"
    )
    wrapped = html.replace("click\n", '<a href="x">click\n').replace(
        "here,", "here</a>,"
    )
    t, _, kept = extract_html(wrapped)
    assert kept == 1 and "sober paragraph" in t
