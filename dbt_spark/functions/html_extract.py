"""REAL HTML text extraction — the web-corpus ingest pass.

A 100 TB web crawl arrives as HTML; the first pipeline stage extracts
visible text and drops boilerplate (scripts, styles, navigation, footers,
comments) — the trafilatura/jusText role. This module implements it with
the stdlib ``html.parser`` state machine (a genuine SGML tokenizer: tags,
attributes, entity/charref unescaping, comments, CDATA-ish script/style
content models), no third-party dependency.

Spark shape: one Arrow-batched ``mapInPandas`` over the binary/string HTML
column — embarrassingly parallel, no shuffle; at scale each task parses one
record batch of pages and nothing passes through the driver. Matching
builder emits genuine HTML pages (entity-escaped body text split across
nested block elements, plus scripted/styled/nav boilerplate), so the
round-trip is value-pinned end-to-end: extracted text must equal the
whitespace-normalized source text EXACTLY (md5-compared in the oracle).

Defined in a factory so cloudpickle serializes the functions by value into
executor closures (module globals pickle by reference and executors may not
have dbt_spark importable).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _make_html_tools():
    import html as _html
    from html.parser import HTMLParser

    # elements whose text content is never page copy
    _DROP = {"script", "style", "nav", "footer", "header", "noscript",
             "template", "head", "title"}
    # void elements never get a closing tag — they must not affect nesting
    _VOID = {"br", "hr", "img", "meta", "link", "input", "area", "base",
             "col", "embed", "source", "track", "wbr"}

    class _Extractor(HTMLParser):
        """Visible-text extractor: collects character data outside DROP
        subtrees; a DROP-depth counter (not a flag) handles nested
        boilerplate (nav inside footer) correctly. convert_charrefs=True
        makes the parser hand over entities already unescaped."""

        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.drop_depth = 0
            self.chunks: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag in _VOID:
                return
            if tag in _DROP:
                self.drop_depth += 1

        def handle_endtag(self, tag):
            if tag in _DROP and self.drop_depth > 0:
                self.drop_depth -= 1

        def handle_data(self, data):
            if self.drop_depth == 0 and data:
                self.chunks.append(data)

        # comments / processing instructions / declarations are never copy
        def handle_comment(self, data):
            pass

    def extract_text(html_doc: str) -> str:
        """Visible text, whitespace-normalized to single spaces — the
        canonical form downstream dedup/quality stages key on."""
        p = _Extractor()
        p.feed(html_doc)
        p.close()
        return " ".join(" ".join(p.chunks).split())

    def build_page(text: str, seed: int) -> str:
        """Genuine HTML page around ``text``: entity-escaped copy split
        across nested block elements at word boundaries, surrounded by the
        boilerplate a real crawl carries (head/title, script with angle
        brackets, style, nav links, comments, footer). Extraction must
        recover exactly the whitespace-normalized input."""
        words = text.split()
        # deterministic split points derived from the seed
        n = len(words)
        a = n // 3 + (seed % 3 if n >= 6 else 0)
        b = 2 * n // 3
        paras = [" ".join(w) for w in (words[:a], words[a:b], words[b:]) if w]
        body = "".join(
            f"<div class=\"c{i}\"><p>{_html.escape(pt)}</p></div>"
            for i, pt in enumerate(paras)
        )
        return (
            "<!DOCTYPE html><html><head><title>Doc {}</title>"
            "<meta charset=\"utf-8\"><style>p {{ color: #000; }}</style>"
            "<script>if (1 < 2 && 3 > 2) {{ var x = \"<p>sneaky</p>\"; }}"
            "</script></head><body>"
            "<nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>"
            "<!-- crawler boilerplate comment -->"
            "{}"
            "<footer>&copy; 2026 example.com <nav>bottom nav</nav></footer>"
            "</body></html>"
        ).format(seed, body)

    return extract_text, build_page


extract_text, build_page = _make_html_tools()


EXTRACT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text_md5", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("n_words", T.LongType()),
])


def extract_visible_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Arrow-batched REAL HTML→text extraction: (doc_id, html) →
    (doc_id, text_md5, n_chars, n_words) of the visible, boilerplate-free,
    whitespace-normalized text. md5 rides along so oracles can pin the
    EXACT extracted string without shipping it."""
    tools = _make_html_tools()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        extract = tools[0]
        for pdf in it:
            texts = [extract(h) for h in pdf[html_col]]
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "text_md5": [hashlib.md5(t.encode("utf-8")).hexdigest()
                             for t in texts],
                "n_chars": [len(t) for t in texts],
                "n_words": [len(t.split()) if t else 0 for t in texts],
            })

    return df.mapInPandas(batches, schema=EXTRACT_SCHEMA)
