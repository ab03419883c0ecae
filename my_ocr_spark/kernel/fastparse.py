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
most of it. Handles: quoted '>' inside attributes, comments, CDATA,
doctype/PI, raw-text elements (script/style/... scanned to their literal
close tag, per the HTML5 rawtext rule), entity decoding via
html.unescape.
"""

from __future__ import annotations

import re
from html import unescape

# one token per match: comment | declaration/PI | end tag | start tag | text
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                    # comment (unterminated → EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"          # stray CDATA section
    r"|<![^>]*>?"                          # doctype / declaration
    r"|<\?[^>]*>?"                         # processing instruction
    r"|</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>"  # end tag   (group 1)
    r"|<([a-zA-Z][a-zA-Z0-9-]*)"            # start tag (group 2) ...
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)"    # ... attrs (group 3, quoted '>')
    r"(/?)>?"                               # self-closing marker (group 4)
    r"|([^<]+)"                             # text (group 5)
    r"|(<)",                                # lone '<' → literal text (grp 6)
    re.DOTALL,
)

# raw-text elements: content runs to the literal close tag; RCDATA ones
# (title/textarea) still decode character references, CDATA ones don't
_RAWTEXT = ("script", "style", "textarea", "title", "noscript", "template")
_RCDATA = frozenset({"title", "textarea"})
_RAW_CLOSE = {t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE)
              for t in _RAWTEXT}

_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")


def feed_events(parser, text: str) -> None:
    """Lex ``text`` and drive parser.handle_starttag/endtag/data —
    the regex twin of HTMLParser.feed()."""
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:  # cannot happen (text branch matches any char) — guard
            pos += 1
            continue
        end_tag, start_tag, attrs, selfclose, data, lone_lt = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
            m.group(6))
        pos = m.end()
        if data is not None:
            if _HAS_ENTITY.search(data):
                data = unescape(data)
            parser.handle_data(data)
        elif start_tag is not None:
            tag = start_tag.lower()
            parser.handle_starttag(tag, ())
            if selfclose == "/":
                parser.handle_endtag(tag)
            elif tag in _RAWTEXT:
                # rawtext: consume up to the literal close tag
                cm = _RAW_CLOSE[tag].search(text, pos)
                if cm is None:
                    raw = text[pos:]
                    pos = n
                else:
                    raw = text[pos:cm.start()]
                    pos = cm.end()
                if raw:
                    if tag in _RCDATA and _HAS_ENTITY.search(raw):
                        raw = unescape(raw)
                    parser.handle_data(raw)
                parser.handle_endtag(tag)
        elif end_tag is not None:
            parser.handle_endtag(end_tag.lower())
        elif lone_lt is not None:
            parser.handle_data("<")
        # comments/declarations/PIs: skipped entirely
