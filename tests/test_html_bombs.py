"""Pathological-document (HTML bomb) stress: SURVEY.md §7.3 risk 2.

The skew caps written into the kernel's design — MAX_BLOCKS_PER_DOC and
MAX_PATH_SEGMENTS — must demonstrably BIND on adversarial pages, with
documented truncation semantics, and both lexers must agree on the
truncated output. Reference analog: ``max_candidates`` bounding per-image
decode work (``mmocr/models/textdet/postprocess/wrapper.py:183``).
"""

import re

from my_ocr_spark.fixtures import make_html_bomb
from my_ocr_spark.kernel.extract import extract_main_text
from my_ocr_spark.kernel.htmlparse import (
    MAX_BLOCKS_PER_DOC,
    MAX_PATH_SEGMENTS,
    parse_blocks,
)


def _norm(s: str) -> str:
    return " ".join(s.split())


def test_block_cap_binds_with_prefix_semantics():
    """A 100k-block page (5x the cap) keeps exactly the first
    MAX_BLOCKS_PER_DOC flushed blocks in document order: the header
    nav item plus the first cap-1 paragraphs; everything after —
    including the footer, which closes last — is dropped."""
    html = make_html_bomb("blocks", 100_000).encode()
    assert len(html) > 4_000_000  # genuinely multi-MB
    title, blocks = parse_blocks(html)
    assert title == "bomb page"
    assert len(blocks) == MAX_BLOCKS_PER_DOC
    want_paras = [_norm(p) for p in
                  re.findall(r"<p>(.*?)</p>", html.decode())]
    assert len(want_paras) == 100_001  # 100k content + 1 footer
    # doc order: nav li first, then the paragraph prefix
    assert blocks[0].text == "Home"
    assert [b.text for b in blocks[1:]] == want_paras[:MAX_BLOCKS_PER_DOC - 1]
    # block_id is the doc-order renumbering, contiguous from 0
    assert [b.block_id for b in blocks] == list(range(MAX_BLOCKS_PER_DOC))
    # the footer copyright para (closes after the cap) is gone
    assert all("Example Corp" not in b.text for b in blocks)


def test_block_cap_extraction_still_clean():
    r = extract_main_text(make_html_bomb("blocks", 50_000).encode())
    assert r["parse_ok"]
    assert r["n_blocks"] == MAX_BLOCKS_PER_DOC
    assert 0 < r["n_kept"] <= MAX_BLOCKS_PER_DOC
    assert r["text"]  # kept real content


def test_deep_nesting_path_memory_bounded():
    """100k-deep <div> nesting: without the MAX_PATH_SEGMENTS cap the
    incremental path table materializes O(depth^2) ~ 40 GB of strings;
    with it, every stored path is bounded and parse completes."""
    depth = 100_000
    html = make_html_bomb("deep", depth).encode()
    title, blocks = parse_blocks(html)
    assert title == "bomb page"
    texts = [b.text for b in blocks]
    assert any("." in t for t in texts)  # the core paragraph survived
    deepest = max(blocks, key=lambda b: b.depth)
    assert deepest.depth >= depth  # exact depth still reported
    for b in blocks:
        assert b.tag_path.count("/") + 1 <= MAX_PATH_SEGMENTS
    r = extract_main_text(html)
    assert r["parse_ok"] and r["text"]


def test_shallow_paths_unaffected_by_cap():
    """The cap only binds beyond MAX_PATH_SEGMENTS: a 120-deep page (the
    existing fixture 'deep' pathological mode) keeps full paths."""
    html = make_html_bomb("deep", 120).encode()
    _, blocks = parse_blocks(html)
    p = next(b for b in blocks if b.tag == "p")
    assert p.tag_path.endswith("/p")
    assert p.tag_path.count("div") == 120


def test_megatext_single_block():
    html = make_html_bomb("megatext", 2_000_000).encode()
    _, blocks = parse_blocks(html)
    core = max(blocks, key=lambda b: b.n_chars)
    assert core.n_chars >= 2_000_000
    assert core.n_words > 100_000


def test_lexers_agree_on_bombs():
    """Differential: the fast lexer and the stdlib lexer produce
    identical truncated output on every bomb kind."""
    for kind, size in (("blocks", 30_000), ("deep", 5_000),
                       ("megatext", 200_000)):
        html = make_html_bomb(kind, size).encode()
        a = parse_blocks(html, lexer="stdlib")
        b = parse_blocks(html, lexer="fast")
        assert a[0] == b[0], kind
        sig_a = [(x.text, x.tag, x.tag_path, x.depth, x.n_link_chars)
                 for x in a[1]]
        sig_b = [(x.text, x.tag, x.tag_path, x.depth, x.n_link_chars)
                 for x in b[1]]
        assert sig_a == sig_b, kind
