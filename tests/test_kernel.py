"""Unit tests for the pure extraction kernels — mmocr-style exact tiny
goldens (SURVEY.md §5: hand-constructed inputs, exact expected outputs)."""

from my_ocr_spark.kernel.htmlparse import parse_blocks
from my_ocr_spark.kernel.extract import extract_main_text, BLOCK_SEP
from my_ocr_spark.kernel.layout import (
    is_on_same_line, stitch_boxes_into_lines, xy_cut, page_reading_order_text,
)
from my_ocr_spark.kernel import textstats as ts


CONTENT = ("This is a long enough paragraph of real content with "
           "several words, proper punctuation, and no links at all.")


def test_parse_blocks_basic():
    html = (f"<html><head><title>T1</title><script>x=1</script></head>"
            f"<body><nav><a href='/'>Home</a></nav>"
            f"<p>{CONTENT}</p><p>Second {CONTENT}</p>"
            f"<footer><a href='/f'>F</a></footer></body></html>")
    title, blocks = parse_blocks(html.encode())
    assert title == "T1"
    texts = [b.text for b in blocks]
    assert "Home" in texts[0]
    assert texts[1] == CONTENT
    assert texts[2] == "Second " + CONTENT
    assert blocks[0].in_nav_footer and not blocks[1].in_nav_footer
    # script/style text never appears
    assert all("x=1" not in t for t in texts)


def test_parse_blocks_malformed_never_raises():
    for payload in (b"", b"<p>unclosed", b"\xff\xfe\x00garbage<div>x",
                    b"<html><body><p>" + b"<div>" * 500 + b"deep"):
        title, blocks = parse_blocks(payload)
        assert isinstance(blocks, list)


def test_extract_drops_boilerplate_keeps_content():
    html = (f"<html><head><title>T</title></head><body>"
            f"<nav><ul><li><a href='/a'>A</a></li><li><a href='/b'>B</a></li>"
            f"</ul></nav><main><p>{CONTENT}</p></main>"
            f"<footer><p>Copyright 2024 Example Corp all rights.</p></footer>"
            f"</body></html>")
    res = extract_main_text(html.encode())
    assert res["text"] == CONTENT
    assert res["spans"] == [(0, len(CONTENT), 2)]
    assert res["n_kept"] == 1


def test_extract_spans_offsets_exact():
    p1, p2 = CONTENT, "Another paragraph. " + CONTENT
    html = f"<body><p>{p1}</p><p>{p2}</p></body>".encode()
    res = extract_main_text(html)
    assert res["text"] == p1 + BLOCK_SEP + p2
    (s1, e1, b1), (s2, e2, b2) = res["spans"]
    assert res["text"][s1:e1] == p1 and res["text"][s2:e2] == p2
    assert (b1, b2) == (0, 1)


def test_neighbor_smoothing_keeps_short_middle_block():
    short = "Short line."
    html = (f"<body><p>{CONTENT}</p><p>{short}</p><p>{CONTENT}</p>"
            f"</body>").encode()
    res = extract_main_text(html)
    assert res["text"] == CONTENT + BLOCK_SEP + short + BLOCK_SEP + CONTENT


def test_byte_identical_across_runs():
    html = f"<body><p>{CONTENT}</p></body>".encode()
    a = extract_main_text(html)
    b = extract_main_text(html)
    assert a == b
    assert a["text"].encode("utf-8") == b["text"].encode("utf-8")


# --- layout kernel ---------------------------------------------------------

def test_is_on_same_line():
    a = (0, 10, 20, 22, "a")
    b = (25, 11, 40, 21, "b")   # strong y-overlap
    c = (0, 40, 20, 52, "c")    # different line
    assert is_on_same_line(a, b)
    assert not is_on_same_line(a, c)


def test_stitch_boxes_into_lines_order_and_gap():
    # two words on line 1, far-apart third word → split; one word line 2
    boxes = [
        (0.0, 0.0, 30.0, 10.0, "hello"),
        (34.0, 0.0, 64.0, 10.0, "world"),
        (200.0, 0.0, 230.0, 10.0, "far"),
        (0.0, 30.0, 30.0, 40.0, "below"),
    ]
    lines = stitch_boxes_into_lines(boxes, max_x_dist=10.0)
    assert [ln["text"] for ln in lines] == ["hello world", "far", "below"]


def test_xy_cut_two_columns_reads_left_column_first():
    # left column boxes (x<100), right column boxes (x>200), rows y=0,20
    boxes = [
        (0, 0, 50, 10, "L1"), (0, 20, 50, 30, "L2"),
        (200, 0, 250, 10, "R1"), (200, 20, 250, 30, "R2"),
    ]
    text = page_reading_order_text(boxes, gap=50.0)
    assert text.splitlines() == ["L1", "L2", "R1", "R2"]
    order = xy_cut(boxes, gap=50.0)
    assert [boxes[i][4] for i in order] == ["L1", "L2", "R1", "R2"]


def test_single_column_reading_order():
    boxes = [
        (0, 20, 50, 30, "second"),
        (0, 0, 50, 10, "first"),
        (60, 0, 110, 10, "line"),
    ]
    assert page_reading_order_text(boxes).splitlines() == ["first line",
                                                           "second"]


# --- textstats ---------------------------------------------------------------

def test_detect_lang():
    assert ts.detect_lang("the cat and the dog is in the house of the king") == "en"
    assert ts.detect_lang("der hund und die katze ist nicht das haus") == "de"
    assert ts.detect_lang("数据内容提取页面文本分析处理系统") == "zh"
    assert ts.detect_lang("") == "und"


def test_token_count_and_quality():
    assert ts.token_count("hello world") == 2
    assert ts.token_count("hello, world!") == 4  # 2 words + 2 punct
    assert ts.quality_score("") == 0.0
    good = ("The quick brown fox jumps over the lazy dog and keeps "
            "running to the forest, where it rests. " * 2)
    assert ts.quality_score(good) >= 0.8


def test_fingerprint_and_shingles():
    a = ts.fingerprint("Hello, World!")
    b = ts.fingerprint("hello world")
    assert a == b  # normalization-invariant
    sh = ts.word_shingles("a b c d", k=3)
    assert sh == ["a b c", "b c d"]
    assert ts.jaccard(["x"], ["x"]) == 1.0
    assert ts.jaccard(["x"], ["y"]) == 0.0


def test_minhash_similarity_monotone():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = t1 + "with one extra clause at the end"
    t3 = "completely different text about spark engines and shuffles " * 5
    s1 = ts.minhash_signature(ts.word_shingles(t1))
    s2 = ts.minhash_signature(ts.word_shingles(t2))
    s3 = ts.minhash_signature(ts.word_shingles(t3))
    est12 = sum(a == b for a, b in zip(s1, s2)) / len(s1)
    est13 = sum(a == b for a, b in zip(s1, s3)) / len(s1)
    assert est12 > est13
    assert est12 > 0.5 and est13 < 0.3


def test_simhash_hamming():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = t1 + "tail"
    t3 = "unrelated corpus of spark shuffle partition words " * 5
    h1, h2, h3 = ts.simhash64(t1), ts.simhash64(t2), ts.simhash64(t3)
    assert ts.hamming64(h1, h2) < ts.hamming64(h1, h3)
    assert ts.hamming64(h1, h1) == 0


def test_title_fallback_to_first_heading():
    html = (f"<body><h1>Article Headline</h1><p>{CONTENT}</p>"
            "</body>").encode()
    res = extract_main_text(html)
    assert res["title"] == "Article Headline"
    # explicit <title> always wins
    html2 = (f"<html><head><title>Real Title</title></head><body>"
             f"<h1>Other</h1><p>{CONTENT}</p></body></html>").encode()
    assert extract_main_text(html2)["title"] == "Real Title"
    # no title, no heading -> empty
    assert extract_main_text(f"<body><p>{CONTENT}</p></body>".encode())["title"] == ""
