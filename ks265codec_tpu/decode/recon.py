"""NumPy reference reconstruction kernels: intra prediction, dequant,
inverse transform, residual add.

This is the scalar bit-exact model (spec 8.4/8.6) that the JAX/Pallas device
kernels in ops/ are property-tested against, and that the reference decoder
path uses. Reference equivalents: ComIntraPrediction, ComTrans, ComQuant
(SURVEY.md 2.2).

All pixel math is integer; planes are int32 internally, uint8 at the edges.
"""

from __future__ import annotations

import numpy as np

from ..hevc.tables import (DCT, DST4, LEVEL_SCALE, chroma_qp,
                           intra_inv_angle, intra_pred_angle)


# ----------------------------------------------------------------- dequant

def dequant(coeffs: np.ndarray, qp: int, log2_size: int, bd: int = 8,
            scaling: np.ndarray | None = None) -> np.ndarray:
    """Spec 8.6.3. coeffs int32 (n,n) -> dequantized int32 clipped to int16."""
    bd_shift = bd + log2_size - 5
    if scaling is None:
        m = 16
    else:
        m = scaling.astype(np.int64)
    d = (coeffs.astype(np.int64) * m * (LEVEL_SCALE[qp % 6] << (qp // 6))
         + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767).astype(np.int32)


# ------------------------------------------------------------ inverse xform

def inverse_transform(coeffs: np.ndarray, log2_size: int, is_dst: bool,
                      bd: int = 8) -> np.ndarray:
    """Two-stage inverse DCT/DST (spec 8.6.4.2): residual int32 (n,n)."""
    n = 1 << log2_size
    t = DST4 if is_dst else DCT[n]
    tt = t.T.astype(np.int64)
    # stage 1 over columns: E = clip16((T^t . C + 64) >> 7)
    e = (tt @ coeffs.astype(np.int64) + 64) >> 7
    e = np.clip(e, -32768, 32767)
    # stage 2 over rows: R = clip16((E . T + (1<<(19-bd))) >> (20-bd))
    shift2 = 20 - bd
    r = (e @ t.astype(np.int64) + (1 << (shift2 - 1))) >> shift2
    return np.clip(r, -32768, 32767).astype(np.int32)


def transform_skip_residual(coeffs: np.ndarray, bd: int = 8) -> np.ndarray:
    """4x4 transform-skip path (spec 8.6.4.1 step for ts): r = (c<<7) scaled."""
    shift2 = 20 - bd
    r = (coeffs.astype(np.int64) << 7) + (1 << (shift2 - 1))
    return np.clip(r >> shift2, -32768, 32767).astype(np.int32)


def forward_transform(resi: np.ndarray, log2_size: int, is_dst: bool,
                      bd: int = 8) -> np.ndarray:
    """Encoder-side forward transform (HM-style staged shifts)."""
    n = 1 << log2_size
    t = DST4 if is_dst else DCT[n]
    t64 = t.astype(np.int64)
    shift1 = log2_size + bd - 9
    shift2 = log2_size + 6
    e = (t64 @ resi.astype(np.int64) + (1 << (shift1 - 1)) if shift1 > 0
         else t64 @ resi.astype(np.int64))
    e = e >> shift1 if shift1 > 0 else e
    c = (e @ t64.T + (1 << (shift2 - 1))) >> shift2
    return c.astype(np.int32)


# -------------------------------------------------------------- intra pred

def intra_filter_refs(left: np.ndarray, corner: int, top: np.ndarray,
                      size: int, mode: int, strong_enabled: bool,
                      bd: int = 8, is_luma: bool = True):
    """Reference sample smoothing (spec 8.4.4.2.3)."""
    if not is_luma or mode == 1 or size == 4:
        return left, corner, top
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thres = {8: 7, 16: 1, 32: 0}[size]
    if min_dist <= thres:
        return left, corner, top
    n2 = 2 * size
    if (strong_enabled and size == 32 and
            abs(corner + top[n2 - 1] - 2 * top[size - 1]) < (1 << (bd - 5)) and
            abs(corner + left[n2 - 1] - 2 * left[size - 1]) < (1 << (bd - 5))):
        # strong (bi-linear) smoothing
        ft = np.empty(n2, np.int32)
        fl = np.empty(n2, np.int32)
        idx = np.arange(1, n2 + 1, dtype=np.int32)
        ft[:] = ((64 - idx) * corner + idx * int(top[n2 - 1]) + 32) >> 6
        fl[:] = ((64 - idx) * corner + idx * int(left[n2 - 1]) + 32) >> 6
        ft[n2 - 1] = top[n2 - 1]
        fl[n2 - 1] = left[n2 - 1]
        return fl, corner, ft
    # 3-tap [1 2 1]
    ext = np.concatenate([left[::-1], [corner], top])  # bottom-left..top-right
    sm = ext.copy()
    sm[1:-1] = (ext[:-2] + 2 * ext[1:-1] + ext[2:] + 2) >> 2
    fl = sm[:n2][::-1].copy()
    fc = int(sm[n2])
    ft = sm[n2 + 1:].copy()
    return fl, fc, ft


def intra_predict(mode: int, left: np.ndarray, corner: int, top: np.ndarray,
                  size: int, bd: int = 8, is_luma: bool = True) -> np.ndarray:
    """Generate one intra prediction block (spec 8.4.4.2.4-6).

    left: p[-1][0..2n-1] (top to bottom), top: p[0..2n-1][-1], corner p[-1][-1].
    Returns (size, size) int32 block.
    """
    n = size
    if mode == 0:  # Planar
        x = np.arange(n, dtype=np.int32)
        y = np.arange(n, dtype=np.int32)
        tr = int(top[n])
        bl = int(left[n])
        pred = ((n - 1 - x)[None, :] * left[:n][:, None]
                + (x + 1)[None, :] * tr
                + (n - 1 - y)[:, None] * top[:n][None, :]
                + (y + 1)[:, None] * bl + n)
        return (pred >> (int(np.log2(n)) + 1)).astype(np.int32)
    if mode == 1:  # DC
        dc = (int(top[:n].sum()) + int(left[:n].sum()) + n) >> (int(np.log2(n)) + 1)
        pred = np.full((n, n), dc, np.int32)
        if is_luma and n < 32:
            pred[0, 1:] = (top[1:n] + 3 * dc + 2) >> 2
            pred[1:, 0] = (left[1:n] + 3 * dc + 2) >> 2
            pred[0, 0] = (int(left[0]) + 2 * dc + int(top[0]) + 2) >> 2
        return pred
    ang = intra_pred_angle(mode)
    maxv = (1 << bd) - 1
    if mode >= 18:  # vertical-ish
        # build ref[] indexed -n..2n -> offset n (one slack slot for the
        # fact==0 gather of p2 at the far end)
        ref = np.zeros(3 * n + 2, np.int32)
        ref[n:3 * n + 1] = np.concatenate([[corner], top[:2 * n]])
        if ang < 0:
            inv = intra_inv_angle(mode)
            lo = (n * ang) >> 5
            for xx in range(-1, lo - 1, -1):
                ref[n + xx] = left[min(((xx * inv + 128) >> 8) - 1, 2 * n - 1)]
        y = np.arange(1, n + 1, dtype=np.int32)
        idx = (y * ang) >> 5
        fact = (y * ang) & 31
        pos = n + 1 + idx  # ref index of x=0 term
        xs = np.arange(n, dtype=np.int32)
        gather = pos[:, None] + xs[None, :]
        p1 = ref[gather]
        p2 = ref[gather + 1]
        pred = ((32 - fact)[:, None] * p1 + fact[:, None] * p2 + 16) >> 5
        pred = pred.astype(np.int32)
        if mode == 26 and is_luma and n < 32:
            col = top[0] + ((left[:n] - corner) >> 1)
            pred[:, 0] = np.clip(col, 0, maxv)
        return pred
    # horizontal-ish (2..17): mirror of vertical with left/top swapped
    ref = np.zeros(3 * n + 2, np.int32)
    ref[n:3 * n + 1] = np.concatenate([[corner], left[:2 * n]])
    if ang < 0:
        inv = intra_inv_angle(mode)
        lo = (n * ang) >> 5
        for xx in range(-1, lo - 1, -1):
            ref[n + xx] = top[min(((xx * inv + 128) >> 8) - 1, 2 * n - 1)]
    x = np.arange(1, n + 1, dtype=np.int32)
    idx = (x * ang) >> 5
    fact = (x * ang) & 31
    pos = n + 1 + idx
    ys = np.arange(n, dtype=np.int32)
    gather = pos[:, None] + ys[None, :]
    p1 = ref[gather]
    p2 = ref[gather + 1]
    predt = ((32 - fact)[:, None] * p1 + fact[:, None] * p2 + 16) >> 5
    pred = predt.T.astype(np.int32).copy()
    if mode == 10 and is_luma and n < 32:
        row = left[0] + ((top[:n] - corner) >> 1)
        pred[0, :] = np.clip(row, 0, maxv)
    return pred


def reconstruct(pred: np.ndarray, resi: np.ndarray | None, bd: int = 8) -> np.ndarray:
    maxv = (1 << bd) - 1
    if resi is None:
        return np.clip(pred, 0, maxv).astype(np.int32)
    return np.clip(pred + resi, 0, maxv).astype(np.int32)
