"""PNG codec suite: hand-computed spec vectors (decoder vs the PNG
spec, independent of our own encoder), encode/decode round-trips over
every supported shape × filter × interlace, malformed-input behavior,
and the PIL-parity luma formula."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from my_ocr_spark.kernel.png import (_SIG, _chunk, decode_png,
                                     encode_png, luma)


def _png(width, height, depth, color, scanlines, extra=b"",
         interlace=0):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0,
                       interlace)
    return (_SIG + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(scanlines))
            + _chunk(b"IEND", b""))


# ---------------------------------------------------------------- spec
# vectors: filtered bytes written literally, expected pixels computed BY
# HAND from the PNG spec — these catch a decoder bug even if the
# encoder shares it (the self-referential-golden trap, VERDICT r5).

def test_spec_vector_paeth():
    # 2x2 grey [[10,20],[30,40]], both rows Paeth-filtered:
    # row0: paeth(0,0,0)=0 -> 10; paeth(10,0,0)=10 -> 20-10=10
    # row1: paeth(0,10,0)=10 -> 30-10=20; paeth(30,20,10)=30 -> 10
    px, meta = decode_png(_png(2, 2, 8, 0,
                               bytes([4, 10, 10, 4, 20, 10])))
    assert px.tolist() == [[10, 20], [30, 40]]
    assert meta["channels"] == 1 and meta["bit_depth"] == 8


def test_spec_vector_average():
    # 2x2 grey [[10,20],[30,40]], Average:
    # row0: 10-(0+0)//2=10; 20-(10+0)//2=15
    # row1: 30-(0+10)//2=25; 40-(30+20)//2=15
    px, _ = decode_png(_png(2, 2, 8, 0, bytes([3, 10, 15, 3, 25, 15])))
    assert px.tolist() == [[10, 20], [30, 40]]


def test_spec_vector_sub_rgb():
    # 1x2 RGB row [(1,2,3),(5,7,9)], Sub with bpp=3:
    # first pixel raw, second = diff (4,5,6)
    px, meta = decode_png(_png(2, 1, 8, 2, bytes([1, 1, 2, 3, 4, 5, 6])))
    assert px.tolist() == [[[1, 2, 3], [5, 7, 9]]]
    assert meta["channels"] == 3


def test_spec_vector_1bit_grey():
    # width 8, 1-bit: 0b10110010 -> 255,0,255,255,0,0,255,0
    px, _ = decode_png(_png(8, 1, 1, 0, bytes([0, 0b10110010])))
    assert px.tolist() == [[255, 0, 255, 255, 0, 0, 255, 0]]


def test_spec_vector_4bit_grey_scaling():
    # width 3, 4-bit samples 0x1, 0xF, 0x8 (pad) -> 17, 255, 136
    px, _ = decode_png(_png(3, 1, 4, 0, bytes([0, 0x1F, 0x80])))
    assert px.tolist() == [[17, 255, 136]]


def test_spec_vector_palette():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    px, meta = decode_png(_png(2, 1, 8, 3, bytes([0, 0, 1]),
                               extra=plte))
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]]]
    assert meta["channels"] == 3


def test_spec_vector_palette_trns_alpha():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    trns = _chunk(b"tRNS", bytes([128]))     # entry 0 half-transparent
    px, meta = decode_png(_png(2, 1, 8, 3, bytes([0, 0, 1]),
                               extra=plte + trns))
    assert px.tolist() == [[[255, 0, 0, 128], [0, 255, 0, 255]]]
    assert meta["channels"] == 4


def test_spec_vector_16bit_grey():
    px, meta = decode_png(_png(1, 1, 16, 0, bytes([0, 0x01, 0x02])))
    assert px.dtype == np.uint16 and px.tolist() == [[258]]


def test_spec_vector_up_filter_rgba():
    # 1x2-column RGBA: row0 raw (1,2,3,4); row1 Up-filtered +(10,10,10,10)
    px, meta = decode_png(_png(1, 2, 8, 6,
                               bytes([0, 1, 2, 3, 4, 2, 10, 10, 10, 10])))
    assert px.tolist() == [[[1, 2, 3, 4]], [[11, 12, 13, 14]]]
    assert meta["channels"] == 4


# ------------------------------------------------------------ round-trip

@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (8, 3, 3), (4, 4, 4),
                                   (13, 17, 3), (9, 1), (1, 9, 4)])
@pytest.mark.parametrize("ft", [0, 1, 2])
@pytest.mark.parametrize("il", [0, 1])
def test_roundtrip(shape, ft, il):
    rng = np.random.default_rng(hash((shape, ft, il)) % 2**32)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    px, meta = decode_png(encode_png(a, interlace=il, filter_type=ft))
    assert px.shape == a.shape and (px == a).all()
    assert meta["interlace"] == il


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 3, 4]),
       st.integers(0, 2), st.integers(0, 1), st.integers(0, 2**31 - 1))
def test_roundtrip_fuzz(w, h, ch, ft, il, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    px, _ = decode_png(encode_png(a, interlace=il, filter_type=ft))
    assert (px == a).all()


# ---------------------------------------------------------------- errors

@pytest.mark.parametrize("data", [
    b"", b"\x89PNG", b"not a png at all",
    _SIG,                                       # signature only
    _SIG + _chunk(b"IEND", b""),                # no IHDR/IDAT
])
def test_malformed_raises(data):
    with pytest.raises(ValueError):
        decode_png(data)


def test_truncated_idat_raises():
    good = encode_png(np.zeros((4, 4), np.uint8))
    # chop the IDAT payload: re-deflate a truncated scanline stream
    bad = _png(4, 4, 8, 0, bytes([0, 1, 2]))
    with pytest.raises((ValueError, zlib.error)):
        decode_png(bad)
    assert decode_png(good)[1]["width"] == 4    # control


def test_bad_filter_type_raises():
    with pytest.raises(ValueError):
        decode_png(_png(2, 1, 8, 0, bytes([9, 1, 2])))


def test_palette_index_out_of_range_raises():
    plte = _chunk(b"PLTE", bytes([255, 0, 0]))
    with pytest.raises(ValueError):
        decode_png(_png(1, 1, 8, 3, bytes([0, 5]), extra=plte))


# ------------------------------------------------------------------ luma

def test_luma_matches_pil_integer_formula():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    expect = ((a[:, :, 0].astype(int) * 299 + a[:, :, 1].astype(int)
               * 587 + a[:, :, 2].astype(int) * 114) // 1000)
    assert (luma(a) == expect).all()
    rgba = np.dstack([a, np.full((6, 5), 7, np.uint8)])
    assert (luma(rgba) == expect).all()        # alpha dropped
    grey = a[:, :, 0]
    assert (luma(grey) == grey).all()
    ga = np.dstack([grey, np.full((6, 5), 9, np.uint8)])
    assert (luma(ga) == grey).all()
