"""Unit tests: image payload sniffing kernel + per-timestep top-k CTC
decode kernel (and its parity with the ctc_topk_decode query formula)."""

from __future__ import annotations

import math

import pytest

from my_ocr_spark.kernel.codec import ctc_topk_select
from my_ocr_spark.kernel.imagemeta import (
    PNG_MAGIC,
    build_jpeg_with_exif,
    is_not_png,
    jpeg_exif_orientation,
    orientation_plan,
    sniff_format,
)


class TestSniffFormat:
    def test_png(self):
        assert sniff_format(PNG_MAGIC + b"rest") == "png"
        assert not is_not_png(PNG_MAGIC + b"rest")

    def test_jpeg_and_gif(self):
        assert sniff_format(b"\xff\xd8\xff\xe0etc") == "jpeg"
        assert sniff_format(b"GIF89a....") == "gif"

    def test_unknown_and_degenerate(self):
        assert sniff_format(b"") == "unknown"
        assert sniff_format(b"\x00" * 100) == "unknown"
        assert sniff_format(b"\xff\xd8") == "unknown"  # too short for FFD8FF
        assert is_not_png(b"junk")


class TestExifOrientation:
    @pytest.mark.parametrize("orient", range(1, 9))
    def test_roundtrip_all_orientations(self, orient):
        payload = build_jpeg_with_exif(orient, seed=orient * 11)
        assert sniff_format(payload) == "jpeg"
        assert jpeg_exif_orientation(payload) == orient

    def test_plain_jpeg_has_none(self):
        assert jpeg_exif_orientation(build_jpeg_with_exif(None)) is None

    def test_non_jpeg_has_none(self):
        assert jpeg_exif_orientation(PNG_MAGIC + b"x") is None
        assert jpeg_exif_orientation(b"") is None

    def test_truncated_payload_safe(self):
        full = build_jpeg_with_exif(6)
        for cut in range(len(full)):
            # never raises; any parse failure degrades to None
            jpeg_exif_orientation(full[:cut])

    def test_corrupt_tiff_header_safe(self):
        p = bytearray(build_jpeg_with_exif(6))
        # stomp the TIFF byte-order mark inside APP1
        idx = p.find(b"MM\x00*")
        p[idx:idx + 4] = b"ZZ\x00*"
        assert jpeg_exif_orientation(bytes(p)) is None

    def test_little_endian_tiff(self):
        import struct
        tiff = bytearray(b"II*\x00") + struct.pack("<I", 8)
        tiff += struct.pack("<H", 1)
        tiff += struct.pack("<HHI", 0x0112, 3, 1)
        tiff += struct.pack("<HH", 7, 0)
        body = b"Exif\x00\x00" + bytes(tiff)
        payload = (b"\xff\xd8\xff\xe1"
                   + struct.pack(">H", len(body) + 2) + body + b"\xff\xd9")
        assert jpeg_exif_orientation(payload) == 7


class TestOrientationPlan:
    def test_transposing_orientations_rewrite(self):
        for o in (5, 6, 7, 8):
            fmt, orient, needs, ext = orientation_plan(
                build_jpeg_with_exif(o))
            assert (fmt, orient, needs, ext) == ("jpeg", o, True, ".png")

    def test_upright_orientations_keep(self):
        for o in (1, 2, 3, 4):
            fmt, orient, needs, ext = orientation_plan(
                build_jpeg_with_exif(o))
            assert (fmt, orient, needs, ext) == ("jpeg", o, False, ".jpg")

    def test_png_and_garbage(self):
        assert orientation_plan(PNG_MAGIC + b"x") == ("png", None, False,
                                                      ".png")
        assert orientation_plan(b"nope") == ("unknown", None, False, "")


class TestCtcTopkSelect:
    def test_reference_semantics_by_hand(self):
        # T=5, C=3, blank=2; top1 path: [0, 0, 2, 1, 1]
        scores = [
            [9.0, 1.0, 0.0],  # t0: top1=0  -> selected (prev=blank)
            [8.0, 2.0, 1.0],  # t1: top1=0  -> repeat, dropped
            [0.0, 1.0, 9.0],  # t2: top1=2  -> blank, dropped
            [1.0, 9.0, 0.0],  # t3: top1=1  -> selected
            [2.0, 9.0, 1.0],  # t4: top1=1  -> repeat, dropped
        ]
        out = ctc_topk_select(scores, blank=2, valid_ratio=1.0, k=2)
        assert [(t, idx) for t, idx, _ in out] == [(0, [0, 1]), (3, [1, 0])]
        assert out[0][2] == [9.0, 1.0]

    def test_valid_ratio_truncates(self):
        scores = [[1.0, 0.0]] * 10  # top1=0 everywhere, blank=1
        out = ctc_topk_select(scores, blank=1, valid_ratio=0.31)
        # decode_len = ceil(10*0.31) = 4; only t=0 survives (repeats drop)
        assert [t for t, _, _ in out] == [0]

    def test_repeat_after_blank_reselected(self):
        # blank separates repeats -> both selected (core CTC semantics)
        scores = [[9, 0], [0, 9], [9, 0]]
        out = ctc_topk_select(scores, blank=1, k=1)
        assert [t for t, _, _ in out] == [0, 2]

    def test_parity_with_query_formula(self):
        """kernel == the arithmetic grid used by the ctc_topk_decode
        query (T=8, C=6, blank=5, decode_len=(key%4+1)*2)."""
        for seq in (1, 7, 42, 997, 12345):
            grid = [[(seq * 7 + t * 13 + c * 31) % 97 for c in range(6)]
                    for t in range(8)]
            dlen = (seq % 4 + 1) * 2
            out = ctc_topk_select(grid, blank=5, valid_ratio=dlen / 8, k=2)
            assert math.ceil(8 * (dlen / 8)) == dlen
            # re-derive with the query's selection rule
            tops = [max(range(6), key=lambda c: grid[t][c])
                    for t in range(8)]
            expect = [t for t in range(dlen)
                      if tops[t] != 5 and (t == 0 or tops[t] != tops[t - 1])]
            assert [t for t, _, _ in out] == expect
            for t, idx, vals in out:
                srt = sorted(range(6), key=lambda c: -grid[t][c])
                assert idx == srt[:2]
                assert vals == [grid[t][srt[0]], grid[t][srt[1]]]
