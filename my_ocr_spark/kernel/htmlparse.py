"""Lightweight deterministic HTML → block-table parser (stdlib html.parser).

Capability analog of the reference's record-materialization + dense-feature
stage: the reference loads an image payload and derives per-region feature
maps (``mmocr/datasets/pipelines/loading.py:84-117``, target generators
``mmocr/datasets/pipelines/textdet_targets/*.py``). Here the payload is raw
HTML bytes and the "feature map" is a flat table of text blocks with the
features boilerplate classification needs: char count, link-char count,
tag path, depth, density.

Design constraints (north_rule): deterministic, pure stdlib, tolerant of
malformed markup (never raises on arbitrary bytes — the analog of the
reference's broken-record skip loop, ``mmocr/datasets/base_dataset.py:128-149``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from html import unescape  # noqa: F401  (HTMLParser already unescapes refs)

# Elements whose subtree is never content.
_SKIP_SUBTREE = frozenset({"script", "style", "noscript", "template", "svg", "iframe"})

# Elements that open a new text block (block-level flow content).
_BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "aside", "header", "footer",
    "nav", "li", "ul", "ol", "table", "tr", "td", "th", "pre", "blockquote",
    "h1", "h2", "h3", "h4", "h5", "h6", "figure", "figcaption", "dl", "dt",
    "dd", "form", "fieldset", "address", "summary", "details", "body",
})

# Void elements (never receive end tags).
_VOID = frozenset({
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
})

MAX_BLOCKS_PER_DOC = 20000  # skew bound, analog of max_candidates=3000
# (``mmocr/models/textdet/postprocess/wrapper.py:183``): caps worst-case
# per-document work on pathological pages.

MAX_PATH_SEGMENTS = 256  # tag_path depth bound. The incremental
# ``_bpaths`` table stores one '/'-joined path string per open block
# level, so an adversarial page nested D blocks deep would otherwise
# materialize O(D^2) characters of path strings (a 100k-deep <div> bomb
# is ~40 GB) — an executor-killer at crawl scale. Blocks deeper than
# this inherit the depth-cap ancestor's path (their own ``tag`` field
# stays exact); no real page approaches 256 block levels, and the
# scorer never reads tag_path (it uses the O(1) in_nav_footer flag),
# so extraction text is unaffected.


@dataclass(slots=True)
class Block:
    """One text block — the unit the scorer classifies keep/drop."""

    block_id: int
    tag: str              # nearest enclosing block-level tag
    tag_path: str         # '/'-joined open block tags, e.g. 'body/div/p'
    depth: int            # DOM depth (all elements, not just block-level)
    # (in_nav_footer is equivalent to 'nav|header|footer|aside in
    # tag_path' but computed O(1) from the open-tag counter)
    text: str             # whitespace-normalized visible text
    n_chars: int          # len(text)
    n_link_chars: int     # chars of text inside <a> subtrees
    n_words: int
    n_punct: int          # sentence punctuation . , ; : ! ?
    is_heading: bool
    in_nav_footer: bool   # under nav/header/footer/aside ancestry


@dataclass(slots=True)
class _OpenBlock:
    # field order puts in_nav fourth so the hot block-open site can
    # construct positionally (kwargs binding measured on the profile)
    tag: str
    tag_path: str
    depth: int
    in_nav: bool = False  # opened under nav/header/footer/aside ancestry
    parts: list = field(default_factory=list)       # text fragments
    link_parts: list = field(default_factory=list)  # fragments inside <a>
    first_pos: int = -1  # document-order key: set when first text arrives


_PUNCT = frozenset(".,;:!?")
_PUNCT_STR = ".,;:!?"
_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_NAVISH = frozenset({"nav", "header", "footer", "aside"})

# Per-tag property bits, so each tag event pays ONE dict lookup instead
# of up to six frozenset/tuple membership probes (the handlers run ~65
# times per document — profiled at 26% of kernel wall). Pure lookup
# refactor: the bit sets are built from the same frozensets above, so
# classification semantics cannot drift.
_F_VOID, _F_SKIP, _F_BLOCK, _F_NAV, _F_A, _F_TITLE = 1, 2, 4, 8, 16, 32
_TAG_FLAGS: dict[str, int] = {}
for _t in _VOID:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_VOID
for _t in _SKIP_SUBTREE:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_SKIP
for _t in _BLOCK_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_BLOCK
for _t in _NAVISH:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_NAV
_TAG_FLAGS["a"] = _TAG_FLAGS.get("a", 0) | _F_A
_TAG_FLAGS["title"] = _TAG_FLAGS.get("title", 0) | _F_TITLE


def _normalize_ws(parts) -> str:
    return " ".join("".join(parts).split())


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._stack: list[_OpenBlock] = []  # open block elements
        self._tagstack: list[str] = []      # all open elements
        self._skip_depth = 0                # inside script/style/...
        self._link_depth = 0                # inside <a>
        self._nav_depth = 0                 # inside nav/header/footer/aside
        self.title_parts: list[str] = []
        self._in_title = False
        self._pos = 0  # monotone counter of text fragments seen
        self._open_counts: dict[str, int] = {}  # O(1) tagstack membership
        # incremental '/'-joined block-tag paths: entry i is the path of
        # the i-th open block tag in tagstack order, so a block open is
        # O(1) instead of an O(depth) join over the whole tagstack
        self._bpaths: list[str] = []

    # -- emit ---------------------------------------------------------
    def _flush(self, ob: _OpenBlock) -> None:
        if len(self.blocks) >= MAX_BLOCKS_PER_DOC:
            return
        words = "".join(ob.parts).split()
        if not words:
            return
        text = " ".join(words)
        link_text = _normalize_ws(ob.link_parts) if ob.link_parts else ""
        # positional dataclass call (field order = class order): the
        # kwargs form paid a per-flush keyword-binding cost on the
        # hottest allocation in the parser
        self.blocks.append(Block(
            ob.first_pos,  # temporary block_id: re-numbered in doc order
            ob.tag, ob.tag_path, ob.depth, text,
            len(text), len(link_text), len(words),
            sum(map(text.count, _PUNCT_STR)),
            ob.tag in _HEADINGS, ob.in_nav))

    # -- tag events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        f = _TAG_FLAGS.get(tag, 0)
        if f & _F_VOID:
            if tag == "br" and self._stack and not self._skip_depth:
                self._stack[-1].parts.append(" ")
            return
        if f & _F_SKIP:
            self._skip_depth += 1
            self._tagstack.append(tag)
            self._open_counts[tag] = self._open_counts.get(tag, 0) + 1
            return
        self._tagstack.append(tag)
        self._open_counts[tag] = self._open_counts.get(tag, 0) + 1
        if not f:
            return  # non-block, non-special tag (span, b, em, ...)
        if f & _F_TITLE:
            self._in_title = True
        if f & _F_A:
            self._link_depth += 1
        if f & _F_NAV:
            self._nav_depth += 1
        if f & _F_BLOCK:
            # opening a nested block: flush nothing yet; text accumulated in
            # the parent before this point stays with the parent.
            if not self._bpaths:
                path = tag
            elif len(self._bpaths) >= MAX_PATH_SEGMENTS:
                path = self._bpaths[-1]  # depth cap: reuse, don't grow
            else:
                path = self._bpaths[-1] + "/" + tag
            self._bpaths.append(path)
            self._stack.append(_OpenBlock(tag, path, len(self._tagstack),
                                          self._nav_depth > 0))

    def handle_endtag(self, tag):
        f = _TAG_FLAGS.get(tag, 0)
        if f & _F_VOID:
            return
        if f & _F_SKIP:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            if self._tagstack and self._tagstack[-1] == tag:
                self._tagstack.pop()
                self._open_counts[tag] -= 1
            return
        if f & _F_TITLE:
            self._in_title = False
        if f & _F_A and self._link_depth > 0:
            self._link_depth -= 1
        if f & _F_NAV and self._nav_depth > 0:
            self._nav_depth -= 1
        # pop tagstack down to the matching open tag (tolerate misnesting);
        # membership via open-tag counter, not an O(depth) list scan
        if self._open_counts.get(tag, 0) > 0:
            while self._tagstack:
                t = self._tagstack.pop()
                self._open_counts[t] -= 1
                if t in _BLOCK_TAGS:
                    self._bpaths.pop()
                if t == tag:
                    break
        if f & _F_BLOCK:
            stack = self._stack
            if stack and stack[-1].tag == tag:
                # well-nested fast path (the overwhelmingly common case)
                self._flush(stack.pop())
                return
            # close the innermost matching open block, flushing it and any
            # unclosed deeper blocks (malformed-markup tolerance).
            for i in range(len(stack) - 1, -1, -1):
                if stack[i].tag == tag:
                    while len(stack) > i:
                        self._flush(stack.pop())
                    break

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        if not self._stack:
            # text before any block tag: synthesize an implicit body block
            self._stack.append(_OpenBlock("body", "body",
                                          len(self._tagstack),
                                          self._nav_depth > 0))
        ob = self._stack[-1]
        if ob.first_pos < 0 and not data.isspace():
            ob.first_pos = self._pos
        self._pos += 1
        ob.parts.append(data)
        if self._link_depth > 0:
            ob.link_parts.append(data)


def parse_blocks(html_bytes: bytes,
                 lexer: str = "fast") -> tuple[str, list[Block]]:
    """Parse raw HTML bytes → (title, blocks).

    ``lexer``: 'fast' (compiled-regex scan, kernel/fastparse.py — the
    hot-path default) or 'stdlib' (html.parser). Both drive the SAME
    _BlockParser handlers, so block semantics live in one place;
    differential agreement is asserted in tests/test_fastparse.py.

    Never raises: undecodable bytes are replaced, parser errors swallowed
    (per-row quarantine is handled a level up).
    """
    if html_bytes is None:
        return "", []
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        text = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        text = str(html_bytes)
    p = _BlockParser()
    try:
        if lexer == "fast":
            from my_ocr_spark.kernel.fastparse import feed_events
            feed_events(p, text)
        else:
            p.feed(text)
            p.close()
    except Exception:
        pass  # keep whatever blocks were flushed before the error
    # flush any still-open blocks (unclosed tags at EOF)
    while p._stack:
        p._flush(p._stack.pop())
    # re-number blocks into document order (blocks were emitted at close-tag
    # time, which is reverse-nesting order; first_pos restores reading order)
    blocks = sorted(p.blocks, key=lambda b: b.block_id)
    for i, b in enumerate(blocks):
        b.block_id = i
    title = _normalize_ws(p.title_parts)
    return title, blocks
