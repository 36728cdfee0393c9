"""Boilerplate-stripped text + metadata extraction from HTML bytes.

The per-page analog of the reference's FOXML/StAX parse + Dublin-Core SAX
extraction (``ObjectProcessor.java:148-166``,
``DublinCoreContentHandler.java:47-101``): one deterministic parse per
page yields (a) the main text (byte-identical per url — the BASELINE.json
per-row invariant), (b) whitelisted metadata fields (newlines in values
preserved, exactly as the DC handler preserves embedded newlines,
DublinCoreContentHandlerTest.java:94-97), and (c) candidate fact
sentences for the OpenIE stage.

Parsing is regex-based over a constrained HTML subset — deliberately
simple and bit-stable (the reference pins Woodstox for the same
determinism reason, ObjectProcessor.java:117-129). Malformed HTML raises
``PageParseError``; callers contain it per row
(``ObjectProcessor.java:172-176`` error-containment semantics).
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass, field

_RE_DROP = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1>", re.S | re.I
)
_RE_TITLE = re.compile(r"<title>(.*?)</title>", re.S)
_RE_META = re.compile(r'<meta\s+name="([^"]*)"\s+content="([^"]*)"\s*/?>', re.S)
_RE_BARE_P = re.compile(r"<p>(.*?)</p>", re.S)  # only attribute-free <p>
_RE_CLASSED_P = re.compile(r'<p class="([^"]*)">(.*?)</p>', re.S)
_RE_BR = re.compile(r"<br\s*/?>", re.I)
_RE_TAG = re.compile(r"<[^>]+>")


class PageParseError(ValueError):
    """Raised for malformed page bytes; contained per row by callers."""


@dataclass
class ParsedPage:
    title: str | None = None
    metas: list[tuple[str, str]] = field(default_factory=list)  # (name, content)
    text: str = ""  # boilerplate-stripped main text
    fact_sentences: list[str] = field(default_factory=list)


def parse_page(html_bytes: bytes) -> ParsedPage:
    """Parse one page. Raises PageParseError on malformed input."""
    try:
        doc = html_bytes.decode("utf-8")
    except UnicodeDecodeError as e:
        raise PageParseError(f"undecodable bytes: {e}") from e
    if "</html>" not in doc:
        raise PageParseError("truncated document (no </html>)")

    doc = _RE_DROP.sub("", doc)

    page = ParsedPage()
    m = _RE_TITLE.search(doc)
    if m:
        page.title = _html.unescape(m.group(1))
    for name, content in _RE_META.findall(doc):
        page.metas.append((name, _html.unescape(content)))
    # Main text = concatenation of attribute-free <p> blocks: <br> folded
    # to newlines, residual inline tags stripped, entities unescaped,
    # blocks newline-joined. Classed <p> (fact/boilerplate) excluded.
    paras = []
    for p in _RE_BARE_P.findall(doc):
        p = _RE_BR.sub("\n", p)
        p = _RE_TAG.sub("", p)
        paras.append(_html.unescape(p))
    page.text = "\n".join(paras)
    for cls, body in _RE_CLASSED_P.findall(doc):
        if cls == "fact":
            page.fact_sentences.append(_html.unescape(body))
    return page
