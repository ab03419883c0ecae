"""Fourier shape descriptors for closed polygons.

Reference analogs: ``poly2fourier``/``cal_fourier_signature``
(``mmocr/models/textdet/targets/fcenet_targets.py:165-220``) and the
inverse ``fourier2poly`` (``mmocr/models/textdet/postprocess/
wrapper.py:501-522``). Pure numpy; used per-row inside pandas UDFs when a
compact shape embedding of a block/region polygon is needed (e.g. layout
clustering), and as a §2.8 kernel-parity artifact with a roundtrip test.
"""

from __future__ import annotations

import numpy as np


def resample_polygon(points: np.ndarray, n: int = 64) -> np.ndarray:
    """Uniformly resample a closed polygon boundary to n points
    (arc-length parameterization — the reference resamples similarly
    before the FFT)."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    closed = np.vstack([pts, pts[:1]])
    seg = np.sqrt(((closed[1:] - closed[:-1]) ** 2).sum(axis=1))
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    if total == 0:
        return np.repeat(pts[:1], n, axis=0)
    targets = np.linspace(0, total, n, endpoint=False)
    out = np.empty((n, 2))
    for k, t in enumerate(targets):
        i = int(np.searchsorted(cum, t, side="right") - 1)
        i = min(i, len(seg) - 1)
        frac = (t - cum[i]) / seg[i] if seg[i] > 0 else 0.0
        out[k] = closed[i] + frac * (closed[i + 1] - closed[i])
    return out


def poly2fourier(points: np.ndarray, k: int = 5,
                 n_sample: int = 64) -> np.ndarray:
    """Polygon → complex Fourier coefficients c_{-k..k} (2k+1 values)."""
    pts = resample_polygon(points, n_sample)
    z = pts[:, 0] + 1j * pts[:, 1]
    c = np.fft.fft(z) / len(z)
    # order: c_{-k}, ..., c_{-1}, c_0, c_1, ..., c_k
    return np.concatenate([c[-k:], c[:k + 1]])


def fourier2poly(coeffs: np.ndarray, n_points: int = 64) -> np.ndarray:
    """Inverse: low-order coefficients → reconstructed boundary points."""
    coeffs = np.asarray(coeffs, dtype=np.complex128)
    k = (len(coeffs) - 1) // 2
    t = np.arange(n_points) / n_points
    z = np.zeros(n_points, dtype=np.complex128)
    for idx, c in enumerate(coeffs):
        freq = idx - k
        z += c * np.exp(2j * np.pi * freq * t)
    return np.stack([z.real, z.imag], axis=1)
