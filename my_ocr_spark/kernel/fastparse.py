"""Fast regex lexer for the HTML block parser.

Drives the SAME `_BlockParser` event handlers as the stdlib path
(htmlparse.py) — block semantics live in exactly one place; only the
lexing differs. Byte-identical engine output is guaranteed by
construction because every caller (UDF, fixture generator, pytest
oracle) goes through `parse_blocks`, which picks one lexer for all of
them. Differential agreement with html.parser on the fixture corpus and
the edge-case suite is asserted in tests/test_fastparse.py.

Why: the stdlib parser's goahead/parse_starttag machinery is ~60% of
kernel time (profiled); a compiled-regex scan over the byte stream cuts
most of it.

Architecture (round 2): a STRICT fast path handles only tokens that are
provably well-formed — where the single-regex semantics are identical
to html.parser's tolerant machinery. Any gnarly '<'-construct (unpaired
quote in a tag, '<' or '=' in a tag name, attribute soup) is delegated
to the stdlib's own ``parse_starttag``/``parse_endtag`` via a thin
HTMLParser shim, so malformed-markup behavior matches html.parser BY
CONSTRUCTION (this fixed the round-1 '<A">' divergence: html.parser
treats the quote as part of the tag name and consumes to '>').

Documented intentional divergences from html.parser (both HTML5-correct,
asserted in tests/test_fastparse.py):
  1. an unterminated comment ('<!--' with no '--\\s*>') swallows to EOF
     instead of leaking as text (HTML5 eof-in-comment);
  2. a tag truncated at EOF with no '>' anywhere after is dropped
     instead of leaking as text (HTML5 eof-in-tag).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

# One token per match. Every branch here is STRICT: it matches only when
# the token's semantics are provably identical to html.parser's tolerant
# parse. Anything '<'-initiated that no branch matches falls through to
# the stdlib shim (m is None in feed_events).
_TOKEN_RE = re.compile(
    r"(?P<text>[^<]+)"                       # text run (to next '<')
    r"|(?P<comment><!--)"                    # comment open (close in code)
    r"|(?P<cdata><!\[CDATA\[.*?(?:\]\]>|$))"  # stray CDATA section
    r"|(?P<decl><!)"                         # doctype/bogus decl (code)
    r"|(?P<pi><\?[^>]*>?)"                   # processing instruction
    # end tag: exactly html.parser's endtagfind
    r"|</\s*(?P<endtag>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
    # start tag: simple name + well-formed attrs only; boundaries between
    # \s+/name/=/value are deterministic, so no backtracking blowup
    r"|<(?P<starttag>[a-zA-Z][a-zA-Z0-9-]*)"
    r"(?:\s+[^\s/=>\"'<][^\s/=>]*"           # attr name
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>\"'`=]*))?"  # optional value
    r")*"
    r"\s*(?P<selfclose>/?)>"
    # lone '<': only when html.parser would emit it as literal text
    r"|(?P<lt><(?![a-zA-Z!/?]))",
    re.DOTALL,
)

_COMMENT_CLOSE = re.compile(r"--\s*>")  # html.parser's commentclose

# raw-text elements: content runs to the literal close tag; RCDATA ones
# (title/textarea) still decode character references, CDATA ones don't.
# NOTE html.parser only CDATAs script/style; treating title/textarea/
# noscript/template as rawtext is an HTML5-correct engine choice (the
# fixture/differential corpora never exercise markup inside them).
_RAWTEXT = ("script", "style", "textarea", "title", "noscript", "template")
_RCDATA = frozenset({"title", "textarea"})
_RAW_CLOSE = {t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE)
              for t in _RAWTEXT}

_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")


class _Tolerant(HTMLParser):
    """Shim exposing html.parser's tolerant tag machinery.

    We call its ``parse_starttag``/``parse_endtag`` directly on the full
    document (``rawdata`` is set once); events are forwarded to the
    block parser. Because this IS the stdlib code, malformed-tag
    behavior (tolerant tag names, data leaks for '<a / >'-style soup,
    consumed spans) matches html.parser exactly.
    """

    def __init__(self, target) -> None:
        super().__init__(convert_charrefs=True)
        self._target = target

    def handle_starttag(self, tag, attrs):
        self._target.handle_starttag(tag, ())

    def handle_endtag(self, tag):
        self._target.handle_endtag(tag)

    def handle_startendtag(self, tag, attrs):
        self._target.handle_starttag(tag, ())
        self._target.handle_endtag(tag)

    def handle_data(self, data):
        self._target.handle_data(data)

    # comments / decls / PIs: inherit the no-op defaults


def _consume_rawtext(parser, text: str, pos: int, tag: str) -> int:
    """Emit rawtext content up to the literal close tag; return new pos."""
    cm = _RAW_CLOSE[tag].search(text, pos)
    if cm is None:
        raw, newpos = text[pos:], len(text)
    else:
        raw, newpos = text[pos:cm.start()], cm.end()
    if raw:
        if tag in _RCDATA and _HAS_ENTITY.search(raw):
            raw = unescape(raw)
        parser.handle_data(raw)
    parser.handle_endtag(tag)
    return newpos


def _tolerant_lt(parser, tol: _Tolerant, text: str, pos: int) -> int:
    """Handle a gnarly '<'-construct with the stdlib machinery."""
    if text.startswith("</", pos):
        k = tol.parse_endtag(pos)
    else:
        k = tol.parse_starttag(pos)
        if k >= 0 and tol.cdata_elem is not None:
            # stdlib entered script/style CDATA mode; net data up to the
            # true close tag is identical to our rawtext scan
            tag = tol.cdata_elem
            tol.clear_cdata_mode()
            return _consume_rawtext(parser, text, k, tag)
    if k >= 0:
        return k
    # parse_* returned -1 (construct not terminated before EOF buffer
    # end). html.parser's goahead close-time recovery leaks text[i:k]
    # where k is just past the next '>'; mirror that. With no '>' left,
    # drop to EOF (HTML5 eof-in-tag — documented divergence #2).
    g = text.find(">", pos + 1)
    if g < 0:
        return len(text)
    data = text[pos:g + 1]
    if _HAS_ENTITY.search(data):
        data = unescape(data)
    parser.handle_data(data)
    return g + 1


def feed_events(parser, text: str) -> None:
    """Lex ``text`` and drive parser.handle_starttag/endtag/data —
    the regex twin of HTMLParser.feed()+close().

    Token kind dispatches on ``m.lastgroup`` (the LAST named group that
    participated): 'text'/'endtag'/... name themselves; a start tag
    reads 'selfclose' because that group (``/?``) always participates
    after 'starttag'. One attribute lookup per token instead of probing
    up to six groups (~8% of kernel wall, profiled)."""
    pos = 0
    n = len(text)
    tol = None  # stdlib shim, built lazily on first gnarly construct
    token_match = _TOKEN_RE.match
    handle_data = parser.handle_data
    handle_starttag = parser.handle_starttag
    handle_endtag = parser.handle_endtag
    entity_search = _HAS_ENTITY.search
    # numeric group ids (resolved once from the pattern) — named
    # m.group('x') pays a dict lookup per token on the hot path
    gi = _TOKEN_RE.groupindex
    G_START, G_SELF, G_END = gi["starttag"], gi["selfclose"], gi["endtag"]
    while pos < n:
        m = token_match(text, pos)
        if m is None:
            # '<'-construct the strict fast path can't prove well-formed
            if tol is None:
                tol = _Tolerant(parser)
                tol.rawdata = text
            pos = _tolerant_lt(parser, tol, text, pos)
            continue
        start = pos
        pos = m.end()
        kind = m.lastgroup
        if kind == "text":
            data = m.group(1)
            if entity_search(data):
                data = unescape(data)
            handle_data(data)
        elif kind == "selfclose":  # a start tag (see docstring)
            tag = m.group(G_START).lower()
            handle_starttag(tag, ())
            if m.group(G_SELF):
                handle_endtag(tag)
            elif tag in _RAWTEXT:
                pos = _consume_rawtext(parser, text, pos, tag)
        elif kind == "endtag":
            handle_endtag(m.group(G_END).lower())
        elif kind == "comment":
            cm = _COMMENT_CLOSE.search(text, pos)
            # unterminated → swallow to EOF (documented divergence #1)
            pos = cm.end() if cm else n
        elif kind == "decl":
            # html.parser: doctype scans for '>' from i+9, bogus comment
            # from i+2; unterminated → swallow (divergence #2 class)
            if text[start:start + 9].lower() == "<!doctype":
                g = text.find(">", start + 9)
            else:
                g = text.find(">", start + 2)
            pos = g + 1 if g >= 0 else n
        elif kind == "lt":
            handle_data("<")
        # cdata / pi tokens: skipped entirely
