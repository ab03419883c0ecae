"""Fast lexer ≡ stdlib lexer: differential agreement on the fixture
corpus, the edge-case suite, and hypothesis-generated junk."""

import random
import string

from hypothesis import example, given, settings, strategies as st

from my_ocr_spark.fixtures import make_html
from my_ocr_spark.kernel.htmlparse import parse_blocks
from tests.test_html_edge_cases import CASES


def _sig(html: bytes, lexer: str):
    title, blocks = parse_blocks(html, lexer=lexer)
    return title, [(b.text, b.tag, b.tag_path, b.n_link_chars,
                    b.is_heading, b.in_nav_footer) for b in blocks]


def test_differential_on_fixture_corpus():
    rng = random.Random(5)
    for i in range(300):
        lang = rng.choice(["en", "zh", "de", "es", "fr"])
        html = make_html(rng, lang,
                         pathological=(rng.random() < 0.1)).encode()
        assert _sig(html, "stdlib") == _sig(html, "fast"), html[:120]


def test_differential_on_edge_cases():
    for name, (html, _want) in CASES.items():
        assert _sig(html, "stdlib") == _sig(html, "fast"), name


def test_differential_on_known_nasties():
    nasties = [
        b"", b"<p>unclosed", b"\xff\xfe\x00garbage<div>x",
        b"a < b and <p>real paragraph content here</p>",
        b"<p>x</p>" + b"<div>" * 300 + b"deep",
        b"<TITLE>T&amp;T</TITLE><p>entity &lt;here&gt; ok</p>",
        b"<script>if (a<b) { x = '</div>'; }</script><p>after raw</p>",
        b"<p a='>' b=\">\">quoted gt in attrs</p>",
        b"<br/><hr/><p>voids</p><img src=x>",
    ]
    for html in nasties:
        assert _sig(html, "stdlib") == _sig(html, "fast"), html[:80]


def test_known_intentional_divergence_unterminated_comment():
    """html.parser leaks an unterminated trailing comment as TEXT; the
    fast lexer swallows it (HTML5: a comment runs to EOF). The fast
    behavior is the engine's — junk must not leak into extracted text."""
    html = b"<!-- <p>ghost</p> --><p>visible</p><!-- unterminated junk"
    _, fast = parse_blocks(html, lexer="fast")
    assert [b.text for b in fast] == ["visible"]
    _, std = parse_blocks(html, lexer="stdlib")
    assert any("unterminated" in b.text for b in std)  # stdlib quirk


_soup = st.text(
    alphabet=string.ascii_letters + string.digits + " <>/=\"'&;#!-.\n",
    max_size=300)


@settings(max_examples=300, deadline=None)
@given(_soup)
@example(
    s='<A">',
).via('discovered failure')
def test_differential_on_random_soup(s):
    import re

    from hypothesis import assume

    # known intentional divergences (each has its own explicit test):
    # 1. a tag truncated at EOF ('<p', 'x<b') is leaked as text by
    #    html.parser but dropped by the fast lexer (HTML5 EOF-in-tag);
    # 2. an unterminated comment ('<!--' with no '--\s*>' after) leaks
    #    as text in html.parser but swallows to EOF in the fast lexer
    #    (HTML5 EOF-in-comment). Exclude both classes; everything else
    #    must agree exactly.
    assume(not re.search(r"<[a-zA-Z!/?][^>]*$", s))
    assume(not re.search(r"<!--(?!.*--\s*>)", s, re.S))
    html = s.encode("utf-8", errors="ignore")
    assert _sig(html, "stdlib") == _sig(html, "fast")


def test_known_intentional_divergence_truncated_tag_at_eof():
    """HTML5 EOF-in-tag: the truncated tag is dropped (fast lexer);
    html.parser leaks it as text. The engine uses the fast behavior."""
    _, fast = parse_blocks(b"<p>text<a", lexer="fast")
    assert [b.text for b in fast] == ["text"]
    _, std = parse_blocks(b"<p>text<a", lexer="stdlib")
    assert [b.text for b in std] == ["text<a"]
