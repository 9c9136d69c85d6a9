"""PSNR / SSIM quality metrics.

Equivalent of the reference's CPSNR_I420::{calcPSNR, calcYuvSsim}
(SURVEY.md 2.3 "PSNR/SSIM"). NumPy host implementation; the encoder also has
a batched jnp version for on-device accounting (ops/metrics when needed).
"""

from __future__ import annotations

import math

import numpy as np

from .yuv import YUVFrame


def psnr_plane(a: np.ndarray, b: np.ndarray, max_val: int = 255) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.9999
    return 10.0 * math.log10(max_val * max_val / mse)


def psnr_frame(a: YUVFrame, b: YUVFrame) -> tuple[float, float, float]:
    return (psnr_plane(a.y, b.y), psnr_plane(a.u, b.u), psnr_plane(a.v, b.v))


def _ssim_8x8(a: np.ndarray, b: np.ndarray) -> float:
    """x264-style SSIM on non-overlapping 8x8 blocks (what the reference's
    computeSsim is, by lineage)."""
    h, w = a.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    a = a[:h8, :w8].astype(np.float64).reshape(h8 // 8, 8, w8 // 8, 8)
    b = b[:h8, :w8].astype(np.float64).reshape(h8 // 8, 8, w8 // 8, 8)
    mu_a = a.mean(axis=(1, 3))
    mu_b = b.mean(axis=(1, 3))
    var_a = a.var(axis=(1, 3))
    var_b = b.var(axis=(1, 3))
    cov = (a * b).mean(axis=(1, 3)) - mu_a * mu_b
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    ssim = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(ssim.mean())


def ssim_frame(a: YUVFrame, b: YUVFrame) -> float:
    return _ssim_8x8(a.y, b.y)


def ssim_plane(a, b, c1=(0.01 * 255) ** 2, c2=(0.03 * 255) ** 2):
    """Mean SSIM over 8x8 blocks (x264-style grid SSIM, matching the
    reference's calcYuvSsim methodology — SURVEY.md 2.3 PSNR/SSIM)."""
    import numpy as np
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    h, w = a.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    ab = a[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    bb = b[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    mu_a = ab.mean(axis=(2, 3))
    mu_b = bb.mean(axis=(2, 3))
    var_a = ab.var(axis=(2, 3))
    var_b = bb.var(axis=(2, 3))
    cov = (ab * bb).mean(axis=(2, 3)) - mu_a * mu_b
    ssim = (((2 * mu_a * mu_b + c1) * (2 * cov + c2))
            / ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))
    return float(ssim.mean())


def frame_ssim(a, b):
    """(Y, U, V) SSIM of two YUVFrames."""
    return (ssim_plane(a.y, b.y), ssim_plane(a.u, b.u),
            ssim_plane(a.v, b.v))
