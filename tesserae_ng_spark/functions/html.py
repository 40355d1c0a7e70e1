"""HTML → text extraction (SURVEY.md §2.8 `html_extract`).

The contract (BASELINE.json input_hint) requires **byte-identical extracted
text per url** versus the reference extractor. We therefore *own* the
extractor spec — a deterministic pure-Python state machine with no
dependency on version-fragile HTML libraries (bs4/lxml behavior drifts
across releases; ours is pinned by golden fixtures).

Extractor spec
--------------
1. Decode bytes as UTF-8 (``errors="replace"`` — a web-scale corpus has
   mojibake; replacement is deterministic).
2. Walk the markup left-to-right. Content inside the following elements is
   dropped entirely (boilerplate / non-content), with nesting tracked per
   element name: ``head``, ``script``, ``style``, ``nav``, ``footer``,
   ``template``, ``noscript``, ``iframe``, ``svg``.
   ``script``/``style``/``iframe``/``svg`` are CDATA-ish: only their own
   closing tag ends the skip (markup inside is not parsed).
3. All other tags are stripped; the text between tags is kept **verbatim**
   (no whitespace collapsing, no separators inserted — concatenation only).
   This makes extraction an exact inverse of any generator that splits a
   text into escaped chunks.
4. HTML comments (``<!-- -->``), doctype and CDATA sections are dropped.
5. Character references are decoded: the HTML5 named set (via
   ``html.unescape``) and numeric ``&#NNN;`` / ``&#xHH;`` forms.
6. A bare ``<`` that does not open a tag/comment/doctype is literal text.

The role analog in the reference is the ``.tess`` file parser (locus-tagged
Latin text → sentence units; SURVEY.md §2.1) — different payload, same
pipeline position: raw stored bytes → indexable text.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Elements whose entire content is dropped. Value = True if the element is
# "raw text" (only its literal closing tag terminates it; nested markup is
# not interpreted — matches browser treatment of script/style).
_SKIP_ELEMENTS = {
    "head": False,
    "nav": False,
    "footer": False,
    "template": False,
    "noscript": False,
    "script": True,
    "style": True,
    "iframe": True,
    "svg": True,
}

# Void elements never push nesting (they cannot contain content).
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# raw-text closing-tag patterns, one per skip element — compiled once (the
# per-occurrence re.compile inside the extract loop measured ~2 compiles
# per doc on the profile)
_RAW_CLOSE_RE = {
    name: re.compile(rf"</{name}\s*>", re.IGNORECASE)
    for name, raw in _SKIP_ELEMENTS.items()
    if raw
}


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str:
    """Extract text from raw page bytes per the spec above. Deterministic."""
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, memoryview):
        html_bytes = html_bytes.tobytes()
    s = bytes(html_bytes).decode("utf-8", errors="replace")
    out: list[str] = []
    i = 0
    n = len(s)
    # Stack of open skip elements (names); content is dropped while non-empty.
    skip_stack: list[str] = []
    while i < n:
        lt = s.find("<", i)
        if lt == -1:
            if not skip_stack:
                out.append(s[i:])
            break
        if lt > i and not skip_stack:
            out.append(s[i:lt])
        i = lt
        # Raw-text skip element: scan only for its literal closing tag.
        if skip_stack and _SKIP_ELEMENTS.get(skip_stack[-1], False):
            m = _RAW_CLOSE_RE[skip_stack[-1]].search(s, i)
            if m is None:
                break  # unclosed raw element: rest of doc is dropped
            skip_stack.pop()
            i = m.end()
            continue
        # Comment / doctype / CDATA — dispatch on the char after '<'
        # (cheaper than three startswith probes per tag)
        nxt = s[i + 1] if i + 1 < n else ""
        if nxt == "!" or nxt == "?":
            if s.startswith("<!--", i):
                m = _COMMENT_RE.match(s, i)
                i = m.end() if m else n
                continue
            gt = s.find(">", i)
            i = (gt + 1) if gt != -1 else n
            continue
        m = _TAG_RE.match(s, i)
        if m is None:
            # Bare '<' — literal text.
            if not skip_stack:
                out.append("<")
            i += 1
            continue
        closing, name, _attrs, self_close = m.groups()
        name = name.lower()
        i = m.end()
        if name in _SKIP_ELEMENTS and name not in _VOID:
            if closing:
                # Pop the innermost matching open skip element, if any.
                for j in range(len(skip_stack) - 1, -1, -1):
                    if skip_stack[j] == name:
                        del skip_stack[j:]
                        break
            elif not self_close:
                skip_stack.append(name)
        # all other tags: stripped, no text emitted
    return _decode_entities("".join(out))


def _decode_entities(text: str) -> str:
    # html.unescape implements the full HTML5 reference algorithm (named +
    # numeric, including legacy forms) and is deterministic per CPython's
    # bundled table; goldens pin it.
    if "&" not in text:
        return text
    return _html.unescape(text)


# ---------------------------------------------------------------------------
# Deterministic HTML *generator* — inverse pair of the extractor, used by the
# corpus synthesizer (FIXTURES.md §1). Splitting into paragraph chunks cuts
# the text at token boundaries but keeps every byte (each chunk is a verbatim
# substring; concat(chunks) == text), so extract_text(make_html(...)) == text.
# ---------------------------------------------------------------------------

_TOKEN_BOUNDARY_RE = re.compile(r"\S+")


def _escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_html(doc_id: int, source: str, text: str, tokens_per_para: int = 12) -> bytes:
    """Deterministic page template (FIXTURES.md §1): title + nav boilerplate +
    paragraph-chunked escaped text + footer. Extraction must drop everything
    but the paragraph chunks."""
    cuts = [0]
    for k, m in enumerate(_TOKEN_BOUNDARY_RE.finditer(text)):
        if k > 0 and k % tokens_per_para == 0:
            cuts.append(m.start())
    cuts.append(len(text))
    paras = [text[a:b] for a, b in zip(cuts, cuts[1:]) if b > a]
    body = "".join(f"<p>{_escape(p)}</p>" for p in paras) or "<p></p>"
    page = (
        "<!DOCTYPE html><html><head>"
        f"<title>{_escape(source)}/{doc_id}</title>"
        '<meta charset="utf-8"/><style>p{margin:0}</style>'
        "</head><body>"
        '<nav class="site"><a href="/">Home</a> <a href="/about">About</a></nav>'
        '<div id="main">'
        f"{body}"
        "</div>"
        f"<footer><span>&copy; 2025 {_escape(source)}.example.com</span>"
        "<script>var t=1;</script></footer>"
        "</body></html>"
    )
    return page.encode("utf-8")


# ---------------------------------------------------------------------------
# Arrow-vectorized UDF (index-time bulk path)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def html_extract_udf(html: pd.Series) -> pd.Series:
    """binary → string, Arrow-batched. One Python call per ~10k-row batch."""
    return html.map(extract_text)
