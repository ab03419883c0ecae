"""Real-world HTML edge cases frozen as exact goldens (entity decoding,
tables, lists, comments containing tags, '>' inside attributes, <br>,
nested inline markup, CDATA in script, uppercase tags, <pre>)."""

import pytest

from my_ocr_spark.kernel.extract import extract_main_text

CASES = {
    "entities": (
        b"<body><p>Fish &amp; Chips &lt;best&gt; caf&eacute; &#8212; "
        b"really &quot;good&quot; ones here for sure.</p></body>",
        'Fish & Chips <best> caf\xe9 — really "good" ones here '
        "for sure.",
    ),
    "table_cells_as_blocks": (
        b"<body><table><tr><td>Cell one has quite a few words in it "
        b"overall.</td><td>Cell two also carries meaningful content for "
        b"the row.</td></tr></table></body>",
        "Cell one has quite a few words in it overall.\n\n"
        "Cell two also carries meaningful content for the row.",
    ),
    "comment_containing_tags": (
        b"<body><!-- <p>hidden</p> --><p>Visible paragraph with plenty "
        b"of words to pass the content threshold easily.</p></body>",
        "Visible paragraph with plenty of words to pass the content "
        "threshold easily.",
    ),
    "gt_inside_attribute": (
        b'<body><p data-x="a>b">Attribute containing a greater-than sign '
        b"should not break parsing of this long paragraph.</p></body>",
        "Attribute containing a greater-than sign should not break "
        "parsing of this long paragraph.",
    ),
    "br_becomes_space": (
        b"<body><p>First long sentence of the content block here.<br>"
        b"Second long sentence follows after the line break tag.</p>"
        b"</body>",
        "First long sentence of the content block here. Second long "
        "sentence follows after the line break tag.",
    ),
    "nested_inline_markup": (
        b"<body><p>Some <b>bold <i>and italic</i></b> text inside a "
        b"paragraph that is long enough to keep around.</p></body>",
        "Some bold and italic text inside a paragraph that is long "
        "enough to keep around.",
    ),
    "script_cdata_ignored": (
        b"<body><script><![CDATA[ var x = '<p>no</p>'; ]]></script>"
        b"<p>Real content paragraph that should be the only extracted "
        b"text block.</p></body>",
        "Real content paragraph that should be the only extracted text "
        "block.",
    ),
    "uppercase_tags": (
        b"<BODY><P>Uppercase tags should parse exactly like lowercase "
        b"ones in this long paragraph.</P></BODY>",
        "Uppercase tags should parse exactly like lowercase ones in "
        "this long paragraph.",
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_edge_case_exact(name):
    html, want = CASES[name]
    got = extract_main_text(html)
    assert got["text"] == want, name
