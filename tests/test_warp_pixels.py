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
