"""warp_pixels / crop_quad_pixels: identity, translation, bilinear
midpoints, out-of-bounds fill, and quad rectification."""

from __future__ import annotations

import numpy as np
import pytest

from my_ocr_spark.kernel.warp import (
    crop_quad_pixels,
    homography_from_quad,
    warp_pixels,
)


@pytest.fixture
def img():
    return np.arange(42, dtype=float).reshape(6, 7)


def test_identity(img):
    assert np.array_equal(warp_pixels(img, np.eye(3), img.shape), img)


def test_integer_translation(img):
    h = np.array([[1, 0, 2], [0, 1, 1], [0, 0, 1]], dtype=float)
    out = warp_pixels(img, h, img.shape)
    assert np.array_equal(out[:5, :5], img[1:6, 2:7])
    assert np.all(out[5, :] == 0.0)  # fill
    assert np.all(out[:, 5:] == 0.0)


def test_half_pixel_bilinear(img):
    # shift by (0.5, 0): each sample is the mean of two x-neighbors
    h = np.array([[1, 0, 0.5], [0, 1, 0], [0, 0, 1]], dtype=float)
    out = warp_pixels(img, h, img.shape)
    want = (img[:, :-1] + img[:, 1:]) / 2.0
    assert np.allclose(out[:, :6], want)


def test_fill_value(img):
    h = np.array([[1, 0, 100], [0, 1, 100], [0, 0, 1]], dtype=float)
    out = warp_pixels(img, h, (3, 3), fill=-5.0)
    assert np.all(out == -5.0)


def test_axis_aligned_quad_crop(img):
    c = crop_quad_pixels(img, [(2, 1), (6, 1), (6, 4), (2, 4)], 4, 3)
    assert np.array_equal(c, img[1:4, 2:6])


def test_rotated_quad_recovers_rotated_content():
    # a 90deg-rotated quad: output x runs along input +y, so a VERTICAL
    # stripe reads out as a horizontal one
    base = np.zeros((8, 8))
    base[2:6, 2] = [1.0, 2.0, 3.0, 4.0]  # vertical stripe at x=2
    quad = [(2, 2), (2, 6), (1, 6), (1, 2)]  # TL->TR maps +x to +y
    h = homography_from_quad(np.array(quad, dtype=float), 4.0, 1.0,
                             normalize_order=False)
    out = warp_pixels(base, h, (1, 4))
    assert np.allclose(out, [[1.0, 2.0, 3.0, 4.0]])


def test_scale_2x_upsample():
    img = np.array([[0.0, 2.0], [4.0, 6.0]])
    h = np.array([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1]], dtype=float)
    out = warp_pixels(img, h, (3, 3))
    want = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]], dtype=float)
    assert np.allclose(out, want)


# --- TPS rectification ------------------------------------------------------

def test_tps_interpolation_property():
    """The spline evaluated AT the base fiducials reproduces the
    displaced fiducials (up to the reference's log(r+1e-6) eps)."""
    import numpy as np
    from my_ocr_spark.kernel.warp import (
        _tps_p_hat, tps_fiducials, tps_inv_delta_c,
    )
    c = tps_fiducials(20)
    rng = np.random.RandomState(3)
    cp = c + 0.08 * rng.randn(20, 2)
    t = tps_inv_delta_c(c) @ np.vstack([cp, np.zeros((3, 2))])
    back = _tps_p_hat(c, c) @ t
    assert np.abs(back - cp).max() < 1e-5


def test_tps_affine_reduces_to_closed_form():
    import numpy as np
    from my_ocr_spark.kernel.warp import tps_fiducials, tps_grid
    c = tps_fiducials(20)
    a = np.array([[0.7, 0.2], [-0.1, 0.6]])
    tv = np.array([0.05, -0.1])
    g = tps_grid(c @ a.T + tv, 10, 6)
    gx = (np.arange(-10, 10, 2) + 1.0) / 10
    gy = (np.arange(-6, 6, 2) + 1.0) / 6
    p = np.stack(np.meshgrid(gx, gy), axis=2)
    assert np.abs(g - (p @ a.T + tv)).max() < 1e-9


def test_tps_reduces_text_line_curvature():
    """What a homography cannot do at all: fiducials along a curved band
    bend the sampling grid so the band's per-column peak row spread
    shrinks. (Exact straightening would need interior-compensated
    fiducials — in the reference those come from the learned
    LocalizationNetwork; the grid math is identical.)"""
    import numpy as np
    from my_ocr_spark.kernel.warp import tps_warp_pixels

    h, w = 32, 100
    xs = np.arange(w)
    center = 16 + 4 * np.sin(2 * np.pi * xs / w)
    ys = np.arange(h)[:, None]
    img = np.exp(-0.5 * ((ys - center[None, :]) / 1.5) ** 2)

    fx = np.linspace(0, w - 1, 10)
    fc = 16 + 4 * np.sin(2 * np.pi * fx / w)
    def norm(x, y):
        return np.stack([2 * x / (w - 1) - 1, 2 * y / (h - 1) - 1], axis=1)
    cp = np.vstack([norm(fx, fc - 12), norm(fx, fc + 12)])
    out = tps_warp_pixels(img, cp, (h, w))

    peak_before = img.argmax(axis=0)
    peak_after = out[:, 3:-3].argmax(axis=0)
    spread_b = peak_before.max() - peak_before.min()
    spread_a = peak_after.max() - peak_after.min()
    assert spread_b >= 8                       # genuinely curved input
    assert spread_a <= spread_b * 0.7          # measurably straightened
    assert out.max(axis=0).min() > 0.8         # band retained everywhere


def test_tps_warp_degenerate_1px_dims():
    """1-px-wide/tall images must border-clamp, not IndexError."""
    import numpy as np
    from my_ocr_spark.kernel.warp import tps_fiducials, tps_warp_pixels
    cp = tps_fiducials(20)  # identity layout
    col = np.arange(5.0).reshape(5, 1)
    out = tps_warp_pixels(col, cp, (4, 3))
    assert out.shape == (4, 3) and np.isfinite(out).all()
    row = np.arange(7.0).reshape(1, 7)
    out2 = tps_warp_pixels(row, cp, (2, 4))
    assert out2.shape == (2, 4) and np.isfinite(out2).all()
