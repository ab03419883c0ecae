"""Fourier descriptor roundtrip (fcenet poly2fourier/fourier2poly analog)."""

import numpy as np

from my_ocr_spark.kernel.fourier import (
    fourier2poly, poly2fourier, resample_polygon,
)


def test_resample_uniform_count():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    out = resample_polygon(sq, n=40)
    assert out.shape == (40, 2)
    # all resampled points lie on the square's boundary
    on_edge = ((np.isclose(out[:, 0] % 10, 0) | np.isclose(out[:, 1] % 10, 0))
               & (out >= -1e-9).all(axis=1) & (out <= 10 + 1e-9).all(axis=1))
    assert on_edge.all()


def test_roundtrip_reconstructs_square():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    c = poly2fourier(sq, k=15)
    rec = fourier2poly(c, n_points=64)
    ref = resample_polygon(sq, n=64)
    # low-order reconstruction: every point within a small tolerance of
    # the boundary (Gibbs at corners keeps this from being exact)
    err = np.abs(rec - ref).max()
    assert err < 1.0, err


def test_descriptor_translation_only_moves_c0():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    c1 = poly2fourier(sq, k=4)
    c2 = poly2fourier(sq + np.array([5.0, 7.0]), k=4)
    k = 4
    assert np.isclose(c2[k] - c1[k], 5 + 7j)          # c_0 carries position
    others = np.delete(np.abs(c2 - c1), k)
    assert others.max() < 1e-9                        # shape part invariant


def test_degenerate_polygon_no_nan():
    pt = np.array([[3.0, 4.0]])
    c = poly2fourier(pt, k=3)
    assert np.isfinite(c).all()


def test_square_diamond_closed_form_coefficients():
    # 4-point regular contours: c_{-1}=0, c_0=center, and c_1 is
    # (-r - r*i) for the axis-aligned square / r for the diamond —
    # the closed forms the fourier_descriptor_roundtrip oracle replays.
    cx, cy, r = 23.0, 41.0, 6.0
    sq = np.array([(cx - r, cy - r), (cx + r, cy - r),
                   (cx + r, cy + r), (cx - r, cy + r)])
    dia = np.array([(cx + r, cy), (cx, cy + r),
                    (cx - r, cy), (cx, cy - r)])
    csq = poly2fourier(sq, k=1, n_sample=4)
    cdia = poly2fourier(dia, k=1, n_sample=4)
    assert np.allclose(csq, [0, cx + cy * 1j, -r - r * 1j], atol=1e-12)
    assert np.allclose(cdia, [0, cx + cy * 1j, r], atol=1e-12)
    # k=1 captures all non-zero frequencies -> roundtrip = vertices
    assert np.allclose(fourier2poly(csq, 4), sq, atol=1e-12)
    assert np.allclose(fourier2poly(cdia, 4), dia, atol=1e-12)
