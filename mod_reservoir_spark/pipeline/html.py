"""HTML → text extraction: the web-curation stage upstream of every
text operator — strip markup, drop script/style/nav noise, and keep
the main content blocks (the jusText/readability-style link-density
heuristic, simplified to stay deterministic and dependency-free).

Spark shape: one Arrow-batched ``mapInPandas`` pass (HTML parsing is
inherently per-document imperative work — exactly the "built-ins
can't express it" case for the Pandas-UDF escape hatch); no shuffle,
no driver involvement, stdlib ``html.parser`` only (lenient on
malformed markup by design). Downstream stages (quality, dedup,
curate) consume the extracted text like any other document column.

Block model: text accumulates into a block per top-level flow
container (p, div, li, headings, td, blockquote, pre, figcaption…);
``script``/``style``/``noscript``/``template``/``iframe`` subtrees are
dropped entirely. Per block the extractor tracks total text length and
the portion inside <a> tags; a block is BOILERPLATE when it is shorter
than ``min_block_chars`` or its link density exceeds
``max_link_density_ppm`` (navigation bars, footers and related-link
lists are short and link-dense — the jusText observation). Kept blocks
join with blank lines.
"""

from __future__ import annotations

from html.parser import HTMLParser
from io import StringIO

from pyspark.sql import DataFrame, functions as F

# elements whose subtree is never content ("title" explicitly: the
# head wrapper is optional in HTML, so SEO titles would otherwise leak
# into the extracted text on crawled pages that omit <head>)
_DROP = {
    "script", "style", "noscript", "template", "iframe", "svg", "head",
    "title",
}
# elements that begin a new text block
_BLOCK = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
    "blockquote", "pre", "figcaption", "article", "section", "aside",
    "summary", "dd", "dt", "caption", "body",
}
_PPM = 1_000_000


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (text, linked_chars)
        self._buf = StringIO()
        self._linked_buf = StringIO()
        self._drop_depth = 0
        self._a_depth = 0

    def _flush(self) -> None:
        text = " ".join(self._buf.getvalue().split())
        if text:
            # normalize the linked portion the same way as the block
            # text — raw anchor data includes pretty-printing
            # whitespace runs that would inflate the density and drop
            # genuine content blocks
            linked = len(" ".join(self._linked_buf.getvalue().split()))
            self.blocks.append((text, linked))
        self._buf = StringIO()
        self._linked_buf = StringIO()
        # browsers implicitly close inline elements at block
        # boundaries; without this an unclosed <a> in malformed markup
        # would count every later block as fully linked
        self._a_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self._drop_depth += 1
        elif tag == "a":
            self._a_depth += 1
        elif tag in _BLOCK or tag == "br":
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP:
            self._drop_depth = max(0, self._drop_depth - 1)
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._buf.write(data)
        if self._a_depth:
            self._linked_buf.write(data)


def extract_html(
    html: str | None,
    min_block_chars: int = 20,
    max_link_density_ppm: int = 300_000,
) -> tuple[str, int, int]:
    """(text, n_blocks, n_kept) for one document — the per-row core,
    exposed for testing and for callers outside Spark."""
    p = _Extractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        # html.parser is lenient, but a pathological document must
        # degrade to "no content", never fail the task
        return "", 0, 0
    p._flush()
    kept = []
    for text, linked in p.blocks:
        density = (linked * _PPM) // max(len(text), 1)
        if len(text) >= min_block_chars and density <= max_link_density_ppm:
            kept.append(text)
    return "\n\n".join(kept), len(p.blocks), len(kept)


def extract_html_text(
    docs: DataFrame,
    html_col: str = "text",
    min_block_chars: int = 20,
    max_link_density_ppm: int = 300_000,
) -> DataFrame:
    """Extract main-content text from an HTML column. Output:
    (doc_id, text, n_blocks, n_kept_blocks) — ``text`` is ''
    (never NULL) when nothing survives, so downstream tokenizers see
    an empty document, not a missing one.

    The parse is pure-Python per document (HTMLParser), the heaviest
    Python-boundary work in the repo — spread a single-split input so
    one worker does not parse the whole corpus (guide §2.5/§4)."""
    from mod_reservoir_spark.pipeline.spread import spread_input

    docs = spread_input(docs)

    def run(iterator):
        import pandas as pd

        for pdf in iterator:
            rows = [
                extract_html(h, min_block_chars, max_link_density_ppm)
                for h in pdf[html_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": [r[0] for r in rows],
                    "n_blocks": pd.Series(
                        [r[1] for r in rows], dtype="int64"
                    ),
                    "n_kept_blocks": pd.Series(
                        [r[2] for r in rows], dtype="int64"
                    ),
                }
            )

    return docs.select("doc_id", html_col).mapInPandas(
        run, "doc_id long, text string, n_blocks long, n_kept_blocks long"
    )
