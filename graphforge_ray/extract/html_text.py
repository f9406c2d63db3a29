"""Deterministic HTML → text extraction + anchor harvesting.

The north rule requires "byte-identical extracted text per url": the same
``(url, html)`` input must always produce exactly the same ``text`` bytes,
regardless of which worker / batch / run processes it. The reference's own
decode step is ``FileReader.readAsText`` (UTF-8)
(/root/reference/docs/scripts/document.js:663-692); its text-normalization
contract is "trimmed text content" (document.js:731). This extractor applies
the same spirit to HTML pages:

* decode UTF-8 (errors="replace" — deterministic replacement)
* drop ``<script>``/``<style>``/comments
* block-level elements are paragraph breaks; inline elements flow
* whitespace runs collapse to a single space inside a block; blocks joined
  by a single ``\\n``; result JS-trimmed

Also harvests ``<a href>`` anchors → ``(href, anchor_text)`` pairs used by
the mention/linking stages (fixture anchors reuse entity IRIs, giving
linking ground truth).

Pure functions — safe in stateless ``map_batches`` tasks.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .rdfxml import js_trim

__all__ = ["extract_text_and_anchors", "html_to_text"]

_BLOCK_TAGS = {
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "section", "article", "header", "footer",
    "blockquote", "pre", "title", "body",
}
_SKIP_TAGS = {"script", "style", "noscript", "template"}
_WS_RUN = re.compile(r"[ \t\r\n\f\v]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[list[str]] = [[]]
        self.anchors: list[tuple[str, str]] = []
        self._skip_depth = 0
        self._anchor_href: str | None = None
        self._anchor_text: list[str] = []

    def _break_block(self) -> None:
        if self.blocks[-1]:
            self.blocks.append([])

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._break_block()
        if tag == "a":
            href = dict(attrs).get("href")
            self._anchor_href = href
            self._anchor_text = []

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._break_block()
        if tag == "a" and self._anchor_href is not None:
            text = js_trim(_WS_RUN.sub(" ", "".join(self._anchor_text)))
            self.anchors.append((self._anchor_href, text))
            self._anchor_href = None
            self._anchor_text = []

    def handle_data(self, data):
        if self._skip_depth:
            return
        self.blocks[-1].append(data)
        if self._anchor_href is not None:
            self._anchor_text.append(data)

    def result_text(self) -> str:
        lines = []
        for block in self.blocks:
            line = js_trim(_WS_RUN.sub(" ", "".join(block)))
            if line:
                lines.append(line)
        return "\n".join(lines)


def extract_text_and_anchors(html: bytes | str) -> tuple[str, list[tuple[str, str]]]:
    """→ (text, [(href, anchor_text), ...]). Deterministic per input."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return parser.result_text(), parser.anchors


def html_to_text(html: bytes | str) -> str:
    return extract_text_and_anchors(html)[0]
