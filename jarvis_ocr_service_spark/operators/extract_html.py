"""HTML main-content extraction: DOM block segmentation + boilerplate strip.

Built from scratch on the stdlib ``html.parser`` (no external HTML libs in
this environment): a single streaming pass over the markup collects *text
blocks* — contiguous text under the nearest block-level ancestor — tagged
with link-character counts and boilerplate-ancestry, i.e. the classic
text-density / link-density features of readability-style main-content
extraction (cf. Kohlschütter et al., "Boilerplate Detection Using Shallow
Text Features", WSDM 2010).

Two extraction tiers, mirroring the reference's cost-ordered cascade
(/root/reference/app/tier_mapping.py:18-26 — cheapest first, escalate on
invalid output):

  * ``extract_raw`` (tier "tesseract" analog): dumb full-text strip —
    every visible text block in document order, *including* boilerplate.
    Cheapest; on link-farm pages its output fails the downstream validator
    (many short navigation lines), which triggers escalation.
  * ``extract_main`` (tier "easyocr" analog): block classification — drops
    blocks inside nav/footer/header/aside/form subtrees and blocks whose
    link density exceeds LINK_DENSITY_MAX.

Both return ``(text, spans)`` where ``text`` is the newline-joined,
normalize-stable concatenation of per-block normalized texts and ``spans``
are character offsets ``(start, end, tag)`` of each kept block inside
``text`` — the "extracted text plus character-span offsets" contract.

Pure functions of the bytes; shared verbatim between the pytest oracle and
the Spark Arrow stage.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Tuple

from jarvis_ocr_service_spark.operators.textops import normalize_text

# Subtrees that never contain visible text.
SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe", "title"}
)
# Subtrees that are boilerplate by role (stripped by extract_main).
BOILERPLATE_TAGS = frozenset(
    {"nav", "footer", "header", "aside", "form", "menu", "button"}
)
# Tags that delimit text blocks.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "li", "ul", "ol", "h1", "h2", "h3",
        "h4", "h5", "h6", "td", "th", "tr", "table", "blockquote", "pre",
        "main", "body", "br", "figure", "figcaption", "dd", "dt", "dl", "hr",
    }
)
# Void tags never pushed on the open-element stack.
_VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input", "area", "base"})

# A block with link_chars/total_chars above this is dropped by extract_main.
LINK_DENSITY_MAX = 0.33


class Block:
    __slots__ = ("texts", "link_chars", "total_chars", "boiler", "tag")

    def __init__(self, tag: str, boiler: bool):
        self.texts: List[str] = []
        self.link_chars = 0
        self.total_chars = 0
        self.boiler = boiler
        self.tag = tag

    @property
    def text(self) -> str:
        return "".join(self.texts)

    @property
    def link_density(self) -> float:
        return (self.link_chars / self.total_chars) if self.total_chars else 0.0


class _BlockCollector(HTMLParser):
    """One streaming pass: markup -> list[Block] in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = []
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._cur: Block | None = None
        self._cur_tag = "body"

    # -- block lifecycle ----------------------------------------------------
    def _flush(self) -> None:
        b = self._cur
        if b is not None and b.text.strip():
            self.blocks.append(b)
        self._cur = None

    def _ensure(self) -> Block:
        if self._cur is None:
            self._cur = Block(self._cur_tag, self._boiler_depth > 0)
        return self._cur

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS or tag in BOILERPLATE_TAGS:
            # Boilerplate tags (nav/footer/...) are block-level delimiters
            # too: text inside them must never merge into a content block.
            self._flush()
            if tag not in _VOID_TAGS:
                self._cur_tag = tag
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS or tag in BOILERPLATE_TAGS:
            self._flush()
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        b = self._ensure()
        b.texts.append(data)
        n = len(data.strip())
        b.total_chars += n
        if self._link_depth:
            b.link_chars += n

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def parse_blocks(html: str) -> List[Block]:
    """Parse markup into text blocks. Tolerant: stdlib parser never raises
    on malformed markup; a hard parser error yields the blocks seen so far."""
    c = _BlockCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        c._flush()
    return c.blocks


def _assemble(blocks: List[Block]) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Join per-block normalized texts with '\\n'; emit char-span offsets.

    The result is normalize_text-stable (each piece is stripped and holds at
    most 2 consecutive newlines, and single-'\\n' joins cannot create a
    3-newline run), so the pipeline's normalize pass is an idempotent no-op
    on it — keeping the U9 stage order faithful without double-transforming.
    """
    parts: List[str] = []
    spans: List[Tuple[int, int, str]] = []
    pos = 0
    for b in blocks:
        t = normalize_text(b.text)
        if not t:
            continue
        if parts:
            pos += 1  # the joining '\n'
        spans.append((pos, pos + len(t), b.tag))
        parts.append(t)
        pos += len(t)
    return "\n".join(parts), spans


def extract_raw_blocks(blocks: List[Block]) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Tier-1 over pre-parsed blocks: full visible text, boilerplate
    included (cheapest pass)."""
    return _assemble(blocks)


def extract_main_blocks(blocks: List[Block]) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Tier-2 over pre-parsed blocks: main content only — boilerplate
    subtrees and link-dense blocks removed."""
    return _assemble(
        [b for b in blocks if not b.boiler and b.link_density <= LINK_DENSITY_MAX]
    )


def extract_raw(html: str) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Tier-1 from markup (parse + assemble). The cascade parses once and
    uses the *_blocks forms to share the DOM between tiers."""
    return extract_raw_blocks(parse_blocks(html))


def extract_main(html: str) -> Tuple[str, List[Tuple[int, int, str]]]:
    """Tier-2 from markup."""
    return extract_main_blocks(parse_blocks(html))
