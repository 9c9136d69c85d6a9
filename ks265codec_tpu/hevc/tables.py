"""Shared numeric tables of HEVC: transform matrices, quant scales, intra
angle tables, interpolation filters, deblock thresholds, chroma QP mapping.

Single source of truth used by the NumPy reference model (decode/recon.py),
the JAX/Pallas kernels (ops/) and the encoder. Reference equivalent:
ComTable / CommonGlobeVar (SURVEY.md 2.2).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- transforms
# C[t] ~ 64*sqrt(2)*cos(pi*t/64) with the official HEVC integer values.
_C = [0] * 65
_odd = [90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4]
for _i, _v in enumerate(_odd):
    _C[2 * _i + 1] = _v
_even = [0, 90, 89, 87, 83, 80, 75, 70, 64, 57, 50, 43, 36, 25, 18, 9, 0]
for _i, _v in enumerate(_even):
    _C[2 * _i] = _v


def _c2(t: int) -> int:
    """cos lookup in units of pi/64, full period."""
    t %= 128
    if t <= 32:
        return _C[t]
    if t <= 64:
        return -_C[64 - t]
    if t <= 96:
        return -_C[t - 64]
    return _C[128 - t]


def build_dct_matrix(n: int) -> np.ndarray:
    """HEVC integer DCT-II matrix T_n (rows = basis index k)."""
    m = np.zeros((n, n), np.int32)
    for k in range(n):
        for j in range(n):
            if k == 0:
                m[0, j] = 64
            else:
                t = (k * (32 // n)) * (2 * j + 1)
                m[k, j] = _c2(t)
    return m


DCT4 = build_dct_matrix(4)
DCT8 = build_dct_matrix(8)
DCT16 = build_dct_matrix(16)
DCT32 = build_dct_matrix(32)
DCT = {4: DCT4, 8: DCT8, 16: DCT16, 32: DCT32}

DST4 = np.array([[29, 55, 74, 84],
                 [74, 74, 0, -74],
                 [84, -29, -74, 55],
                 [55, -84, 74, -29]], np.int32)

# ------------------------------------------------------------------- quant
LEVEL_SCALE = [40, 45, 51, 57, 64, 72]            # dequant, spec 8.6.3
QUANT_SCALE = [26214, 23302, 20560, 18396, 16384, 14564]  # encoder side (HM lineage)

# chroma QP mapping for 4:2:0 (spec Table 8-10)
CHROMA_QP_TABLE = list(range(30)) + [29, 30, 31, 32, 33, 33, 34, 34, 35, 35,
                                     36, 36, 37, 37] + [x - 6 for x in range(44, 58)]


def chroma_qp(qp_i: int) -> int:
    qp_i = max(0, min(57, qp_i))
    return CHROMA_QP_TABLE[qp_i]


# ------------------------------------------------------------- intra tables
# intraPredAngle for modes 2..34 (spec Table 8-4)
INTRA_PRED_ANGLE = [32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17,
                    -21, -26, -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5,
                    9, 13, 17, 21, 26, 32]
# invAngle for modes 11..25 (spec Table 8-5)
INV_ANGLE = [-4096, -1638, -910, -630, -482, -390, -315, -256, -315, -390,
             -482, -630, -910, -1638, -4096]


def intra_pred_angle(mode: int) -> int:
    return INTRA_PRED_ANGLE[mode - 2]


def intra_inv_angle(mode: int) -> int:
    return INV_ANGLE[mode - 11]


# ------------------------------------------------------------ interpolation
# 8-tap luma filters by fractional phase (spec Table 8-11)
LUMA_FILTER = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], np.int32)
# 4-tap chroma filters by 1/8 phase (spec Table 8-12)
CHROMA_FILTER = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2]], np.int32)

# ---------------------------------------------------------------- deblock
# beta and tc tables indexed by Q (spec Table 8-12 in 8.7.2.5.3)
BETA_TABLE = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9,
              10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32,
              34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64]
TC_TABLE = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
            1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5,
            6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24]

MIN_QP = 0
MAX_QP = 51
