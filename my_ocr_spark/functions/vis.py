"""Debug visualization — the engine's analog of the reference's imshow
suite (``mmocr/core/visualize.py``: ``imshow_pred_boundary``,
``imshow_text_char_boundary``, ``overlay_mask_img`` — bbox/boundary
overlays on pixel images, ``tools/det_test_imgs.py`` batch rendering).

Here the "image" is a DOM, so the overlays are:

* ``render_blocks_text`` — per-block ASCII table: keep/drop verdict,
  tag path, link-density bar, score. The ``imshow_pred_boundary``
  analog for terminal debugging.
* ``render_page_html`` — a standalone HTML page with kept blocks
  highlighted green and dropped ones red-struck, scores inlined. The
  overlay-mask analog (open it in any browser).
* ``vis_sample`` — drive either renderer from the extraction pipeline
  for a bounded sample of documents (collect is capped; this is a
  debug tool, not an operator).

Everything is deterministic (no timestamps, sorted keys) so renderings
can be golden-tested.
"""

from __future__ import annotations

import html as _html

from my_ocr_spark.kernel.extract import classify_blocks, score_block
from my_ocr_spark.kernel.htmlparse import parse_blocks


def _bar(frac: float, width: int = 10) -> str:
    n = max(0, min(width, int(round(frac * width))))
    return "#" * n + "." * (width - n)


def render_blocks_text(html_bytes: bytes, lexer: str = "fast") -> str:
    """ASCII block table for one page: verdict, score, link-density bar,
    tag path, text preview."""
    _title, blocks = parse_blocks(html_bytes, lexer=lexer)
    kept = classify_blocks(blocks)
    lines = [f"{'':4}{'verdict':8}{'score':>7}  {'links':10}  "
             f"{'tag_path':32}  text"]
    for i, (b, k) in enumerate(zip(blocks, kept)):
        ld = b.n_link_chars / b.n_chars if b.n_chars else 0.0
        preview = b.text[:48] + ("…" if len(b.text) > 48 else "")
        path = b.tag_path[-32:]
        lines.append(f"{i:<4}{'KEEP' if k else 'drop':8}"
                     f"{score_block(b):>7.2f}  {_bar(ld)}  "
                     f"{path:32}  {preview}")
    return "\n".join(lines)


def render_page_html(html_bytes: bytes, lexer: str = "fast") -> str:
    """Standalone HTML rendering with the keep/drop overlay: kept blocks
    green-bordered, dropped blocks red and struck through — the
    overlay_mask_img analog."""
    title, blocks = parse_blocks(html_bytes, lexer=lexer)
    kept = classify_blocks(blocks)
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>vis: {_html.escape(title or '')}</title>",
        "<style>.keep{border-left:4px solid #2a2;padding:2px 6px;margin:4px}"
        ".drop{border-left:4px solid #a22;padding:2px 6px;margin:4px;"
        "text-decoration:line-through;color:#888}"
        ".meta{font:11px monospace;color:#555}</style></head><body>",
        f"<h3>{_html.escape(title or '(untitled)')}</h3>",
    ]
    for i, (b, k) in enumerate(zip(blocks, kept)):
        cls = "keep" if k else "drop"
        parts.append(
            f"<div class='{cls}'><span class='meta'>#{i} "
            f"{_html.escape(b.tag_path)} score={score_block(b):.2f} "
            f"chars={b.n_chars} link={b.n_link_chars}</span><br>"
            f"{_html.escape(b.text)}</div>")
    parts.append("</body></html>")
    return "".join(parts)


def vis_sample(docs_df, n: int = 10, mode: str = "text") -> list[dict]:
    """Render a bounded sample of documents from a (url, html) DataFrame.
    Driver-side by design (a human is going to read the output); the
    sample cap keeps collect() bounded."""
    render = render_blocks_text if mode == "text" else render_page_html
    rows = docs_df.select("url", "html").limit(n).collect()
    return [{"url": r["url"], "rendering": render(bytes(r["html"]))}
            for r in rows]
