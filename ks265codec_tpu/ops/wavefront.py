"""Wavefront-batched intra coding pass: the whole frame's prediction ->
transform -> quant -> dequant -> reconstruction feedback loop as ONE jitted
device dispatch.

This is the TPU-native replacement for the reference's per-CTU sequential
hot loop (CCtuEnc::processOneCtu -> intraReconstruct* -> H265_2dDct ->
H265Quant -> reconstruct, SURVEY.md 3.2): the host builds a dependency
SCHEDULE (native ks_build_intra_schedule: z-order walk, availability masks,
longest-path levels), and the device executes one `lax.fori_loop` step per
level, each step batching every CU of that level across three size classes
(8/16/32 luma + their chroma). Reference-sample substitution (spec
8.4.4.2.2) is a vectorized cummax scan; filtering (8.4.4.2.3), all-mode
angular projection (8.4.4.2.6), DCT (8.6.4), quant/dequant round-trip all
bit-exactly mirror the scalar oracle in decode/recon.py (A/B tested by
tests/test_wavefront.py against the sequential compute path).

Carry = (recon Y/Cb/Cr, coeff planes Y/Cb/Cr); outputs land in-place via
masked scatters, so one dispatch returns the finished frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hevc.tables import chroma_qp
from . import intra as jintra
from .transforms import _LEVEL_SCALE, _QUANT_SCALE, _T, _clip16

# schedule K caps per size class: same-row CUs chain through their left
# reference, so an antichain has at most one CU per 8/16/32-row
_LEVEL_PAD = 32
# static per-frame escape-list capacity for the int8 coefficient packing
_ESC_CAP = 4096


def _coeff_cap(M: int) -> int:
    """Static nonzero-value capacity for the sparse coefficient packing:
    frame-size-proportional (the round-2 fixed cap was a 4K cliff).
    Overflowing frames refetch the device-resident dense planes instead
    of recomputing (graceful, no cliff).

    M//8 (12.5% nonzero) covers typical content with margin (3-8%
    measured at QP 22-37); the packed row's size is STATIC caps, not
    content, and the D2H link (~6-13 MB/s) binds the batch wait — at
    M//4 the row was ~1.55 MB/frame and the transfer was no longer
    hidden under the coding scan."""
    return max(4096, M // 8)


def _round_up(v, m):
    return (v + m - 1) // m * m


# --------------------------------------------------------------- prediction

def _predict_dyn(refs_u, refs_f, modes, n: int, is_luma: bool):
    """Per-CU-mode intra prediction, batch (K, 4n+1) -> (K, n, n) int32.

    Computes all 35 modes with the static kernel and selects each block's
    mode by a one-hot contraction: on TPU the static-sliced 35-mode kernel
    plus an MXU one-hot select is ~15-25x faster than gathering per-block
    mode rows from the angle tables (lane gathers serialize on the VPU).
    Exact: predictions are small ints, representable losslessly in f32."""
    preds = jintra.predict_all_modes(refs_u, refs_f, n, is_luma)
    sel = jax.nn.one_hot(modes, 35, dtype=jnp.float32)        # (K, 35)
    K = preds.shape[0]
    p = jnp.einsum("km,kmp->kp", sel,
                   preds.astype(jnp.float32).reshape(K, 35, n * n),
                   preferred_element_type=jnp.float32)
    return p.reshape(K, n, n).astype(jnp.int32)


def _predict_dyn_gather(refs_u, refs_f, modes, n: int, is_luma: bool):
    """Table-gather variant of _predict_dyn (reference implementation,
    kept for A/B testing; same math, slower lowering on TPU)."""
    ext_idx, g, f, filt = jintra._TABLES[n]
    K = refs_u.shape[0]
    am = jnp.clip(modes - 2, 0, 32)
    use_f = (filt[am] == 1) if is_luma else jnp.zeros((K,), bool)
    refs_sel = jnp.where(use_f[:, None], refs_f, refs_u)
    e = jnp.take_along_axis(refs_sel, ext_idx[am], axis=1)   # (K, 3n+2)
    gm = g[am]                                               # (K, n, n)
    fm = f[am]
    p1 = jnp.take_along_axis(e, gm.reshape(K, -1), axis=1).reshape(K, n, n)
    p2 = jnp.take_along_axis(e, (gm + 1).reshape(K, -1),
                             axis=1).reshape(K, n, n)
    ang = ((32 - fm) * p1 + fm * p2 + 16) >> 5

    maxv = 255
    lu = refs_u[:, :2 * n]
    tu = refs_u[:, 2 * n + 1:]
    cu = refs_u[:, 2 * n]
    if is_luma and jintra._PLANAR_FILT[n]:
        pl = refs_f
    else:
        pl = refs_u
    left = pl[:, :2 * n]
    top = pl[:, 2 * n + 1:]
    x = jnp.arange(n, dtype=jnp.int32)
    tr = top[:, n][:, None, None]
    bl = left[:, n][:, None, None]
    planar = ((n - 1 - x)[None, None, :] * left[:, :n, None]
              + (x + 1)[None, None, :] * tr
              + (n - 1 - x)[None, :, None] * top[:, None, :n]
              + (x + 1)[None, :, None] * bl + n) >> (n.bit_length())
    dc = (jnp.sum(lu[:, :n], axis=1) + jnp.sum(tu[:, :n], axis=1)
          + n) >> (n.bit_length())
    dcp = jnp.broadcast_to(dc[:, None, None], (K, n, n)).astype(jnp.int32)
    if is_luma and n < 32:
        row0 = (tu[:, :n] + 3 * dc[:, None] + 2) >> 2
        col0 = (lu[:, :n] + 3 * dc[:, None] + 2) >> 2
        c00 = (lu[:, 0] + 2 * dc + tu[:, 0] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(row0)
        dcp = dcp.at[:, 1:, 0].set(col0[:, 1:])
        dcp = dcp.at[:, 0, 0].set(c00)
        v26 = jnp.clip(tu[:, 0][:, None] + ((lu[:, :n] - cu[:, None]) >> 1),
                       0, maxv)
        h10 = jnp.clip(lu[:, 0][:, None] + ((tu[:, :n] - cu[:, None]) >> 1),
                       0, maxv)
        ang = jnp.where((modes == 26)[:, None, None],
                        ang.at[:, :, 0].set(v26), ang)
        ang = jnp.where((modes == 10)[:, None, None],
                        ang.at[:, 0, :].set(h10), ang)
    pred = jnp.where((modes == 0)[:, None, None], planar,
                     jnp.where((modes == 1)[:, None, None], dcp, ang))
    return pred.astype(jnp.int32)


def _refs_from_borders(bot, rgt, cor, r, c, avail_l, avail_c, avail_t,
                       n8: int, t: int, expand: int, strong: bool,
                       is_luma: bool, h8: int, w8: int):
    """Batched reference construction + substitution + filtering, reading
    from BORDER arrays instead of full planes.

    bot/rgt (h8*w8, t): per-cell bottom pixel row / right pixel column of
    the reconstruction so far (the only recon pixels intra prediction can
    ever reference). r/c (K,) cell coords of the block origin; the block is
    n8 x n8 cells of t x t pixels (n = n8*t). avail masks at 4-luma-sample-
    group granularity (expand=1 luma, expand=2 chroma).
    Returns (refs_u, refs_f) each (K, 4n+1)."""
    n = n8 * t
    K = r.shape[0]
    n2 = 2 * n
    L = 4 * n + 1
    m8 = 2 * n8
    # left contour samples: right columns of cells (r+i, c-1), top->bottom
    rr = jnp.clip(r[:, None] + jnp.arange(m8)[None, :], 0, h8 - 1)
    cl = jnp.clip(c - 1, 0, w8 - 1)
    left_tb = rgt[rr * w8 + cl[:, None]].reshape(K, n2)
    # top contour samples: bottom rows of cells (r-1, c+j), left->right
    cc = jnp.clip(c[:, None] + jnp.arange(m8)[None, :], 0, w8 - 1)
    rt = jnp.clip(r - 1, 0, h8 - 1)
    top_lr = bot[rt[:, None] * w8 + cc].reshape(K, n2)
    corner = cor[rt * w8 + cl]
    # contour order: bottom-left upward, corner, top left-to-right
    i = jnp.arange(L)
    vals = jnp.concatenate([left_tb[:, ::-1], corner[:, None], top_lr],
                           axis=1)
    # availability per contour position from the group masks
    goff = jnp.where(i < n2, (n2 - 1 - i) * expand // 4, 0)
    toff = jnp.where(i > n2, (i - n2 - 1) * expand // 4, 0)
    m_left = (avail_l[:, None] >> goff[None, :]) & 1
    m_top = (avail_t[:, None] >> toff[None, :]) & 1
    mask = jnp.where(i[None, :] < n2, m_left,
                     jnp.where(i[None, :] == n2,
                               avail_c[:, None].astype(jnp.uint32) & 1,
                               m_top)).astype(bool)
    # substitution (8.4.4.2.2): forward-fill from the last available sample;
    # leading unavailable samples take the first available one; all-
    # unavailable -> mid grey
    idx = jnp.where(mask, i[None, :], -1)
    last = jax.lax.associative_scan(jnp.maximum, idx, axis=1)
    first = jnp.argmax(mask, axis=1)
    fidx = jnp.where(last >= 0, last, first[:, None])
    subst = jnp.take_along_axis(vals, fidx, axis=1)
    subst = jnp.where(mask.any(axis=1)[:, None], subst, 128)
    # reorder contour -> refs layout [left top->bottom | corner | top]
    refs_u = jnp.concatenate(
        [subst[:, :n2][:, ::-1], subst[:, n2:n2 + 1], subst[:, n2 + 1:]],
        axis=1).astype(jnp.int32)
    if not is_luma:
        return refs_u, refs_u
    # [1 2 1] smoothing along the contour
    sm = subst.at[:, 1:-1].set(
        (subst[:, :-2] + 2 * subst[:, 1:-1] + subst[:, 2:] + 2) >> 2)
    refs_f = jnp.concatenate(
        [sm[:, :n2][:, ::-1], sm[:, n2:n2 + 1], sm[:, n2 + 1:]],
        axis=1).astype(jnp.int32)
    if strong and n == 32:
        corner = refs_u[:, n2]
        topv = refs_u[:, n2 + 1:]
        leftv = refs_u[:, :n2]
        cond = ((jnp.abs(corner + topv[:, n2 - 1] - 2 * topv[:, n - 1])
                 < 8)
                & (jnp.abs(corner + leftv[:, n2 - 1] - 2 * leftv[:, n - 1])
                   < 8))
        bi_i = jnp.arange(1, n2 + 1, dtype=jnp.int32)
        ft = ((64 - bi_i)[None, :] * corner[:, None]
              + bi_i[None, :] * topv[:, n2 - 1][:, None] + 32) >> 6
        fl = ((64 - bi_i)[None, :] * corner[:, None]
              + bi_i[None, :] * leftv[:, n2 - 1][:, None] + 32) >> 6
        ft = ft.at[:, n2 - 1].set(topv[:, n2 - 1])
        fl = fl.at[:, n2 - 1].set(leftv[:, n2 - 1])
        refs_strong = jnp.concatenate(
            [fl, corner[:, None], ft], axis=1).astype(jnp.int32)
        refs_f = jnp.where(cond[:, None], refs_strong, refs_f)
    return refs_u, refs_f


# ----------------------------------------------------------- transform path

def _mm_lhs(t, x):
    """Exact t @ x for int32 x with |x| < 2^16 and |t| <= 90: split x into
    8-bit halves so each f32 matmul is exact and rides the MXU —
    int32 dots hit pathologically slow XLA emitters on both backends.

    Exact at DEFAULT (bf16) matmul precision, which is what the package
    runs at: hi = x>>8 in [-256, 255] and lo in [0, 255] are bf16-exact
    integers, |t| <= 90 is bf16-exact, and the MXU accumulates in f32
    (sums < 2^24). Callers stay inside the 2^16 bound: residuals are
    9-bit, stage intermediates are <= ~46k after their shifts, dequant
    levels are clip16'd. Widening any input past 2^16 breaks exactness
    SILENTLY — re-audit before doing that."""
    tf = t.astype(jnp.float32)
    hi = (x >> 8).astype(jnp.float32)
    lo = (x & 255).astype(jnp.float32)
    return ((tf @ hi).astype(jnp.int32) << 8) + (tf @ lo).astype(jnp.int32)


def _mm_rhs(x, t):
    """Exact x @ t under the same bounds."""
    tf = t.astype(jnp.float32)
    hi = (x >> 8).astype(jnp.float32)
    lo = (x & 255).astype(jnp.float32)
    return ((hi @ tf).astype(jnp.int32) << 8) + (lo @ tf).astype(jnp.int32)


def _fwd_quant(resi, qp, n: int, log2: int, rdoq: bool = False,
               intra: bool = True):
    """forward DCT + quantization, batch (K, n, n), qp (K,). rdoq selects
    the RDOQ-lite level decision (encode/rdoq) over deadzone rounding;
    intra picks the 1/3 vs 1/6 deadzone rounding."""
    t = _T[n]
    shift1 = log2 + 8 - 9
    shift2 = log2 + 6
    e = _mm_lhs(t, resi)
    if shift1 > 0:
        e = (e + (1 << (shift1 - 1))) >> shift1
    c = (_mm_rhs(e, t.T) + (1 << (shift2 - 1))) >> shift2
    if rdoq:
        from ..encode.rdoq import rdoq_jnp
        return rdoq_jnp(c, qp, n, log2)
    qp = qp[:, None, None]
    qbits = 29 + qp // 6 - 8 - log2
    scale = jnp.asarray(_QUANT_SCALE)[qp % 6]
    rnd = jnp.int32(171 if intra else 85) << (qbits - 9)
    a = jnp.abs(c)
    q = jnp.clip((a * scale + rnd) >> qbits, 0, 32767)
    return jnp.where(c < 0, -q, q)


def _dequant_itx(levels, qp, n: int, log2: int):
    """dequant + inverse DCT, mirrors decode/recon.py semantics."""
    qp = qp[:, None, None]
    s = 8 + log2 - 5
    p = qp // 6
    tv = levels * (16 * jnp.asarray(_LEVEL_SCALE)[qp % 6])
    sp = jnp.maximum(s - p, 0)
    ps = jnp.maximum(p - s, 0)
    rnd = jnp.where(s - p >= 1, jnp.int32(1) << jnp.maximum(s - p - 1, 0), 0)
    d = _clip16((tv + rnd) >> sp << ps)
    t = _T[n]
    e = _clip16((_mm_lhs(t.T, d) + 64) >> 7)
    return _clip16((_mm_rhs(e, t) + (1 << 11)) >> 12)


# ------------------------------------------------------------- step kernels

def _tile(plane, t: int):
    """(H, W) -> (H//t * W//t, t, t) leading-axis tile layout."""
    H, W = plane.shape
    return plane.reshape(H // t, t, W // t, t).transpose(0, 2, 1, 3) \
                .reshape(-1, t, t)


def _untile(tiles, h_t: int, w_t: int):
    """Inverse of _tile: (h_t*w_t, t, t) -> (h_t*t, w_t*t)."""
    t = tiles.shape[-1]
    return tiles.reshape(h_t, w_t, t, t).transpose(0, 2, 1, 3) \
                .reshape(h_t * t, w_t * t)


def _take_tiles(tiles, r, c, n8: int, t: int, w8: int):
    """Assemble (K, n8*t, n8*t) blocks from leading-axis tiles."""
    K = r.shape[0]
    dy = jnp.arange(n8)
    idx = ((r[:, None, None] + dy[None, :, None]) * w8
           + c[:, None, None] + dy[None, None, :])          # (K, n8, n8)
    g = tiles[idx]                                          # (K,n8,n8,t,t)
    return g.transpose(0, 1, 3, 2, 4).reshape(K, n8 * t, n8 * t)


def _update_bottom(bot, cor, rec, r, c, n8: int, t: int, valid, w8: int):
    """Write the block's bottom pixel row into its bottom cells' rows, and
    those cells' bottom-right pixels into the corner array."""
    N = bot.shape[0]
    K = r.shape[0]
    rows = rec[:, -1, :].reshape(K, n8, t)
    idx = ((r + n8 - 1) * w8 + c)[:, None] + jnp.arange(n8)[None, :]
    idx = jnp.where(valid[:, None], idx, N).reshape(-1)
    return (bot.at[idx].set(rows.reshape(-1, t), mode="drop"),
            cor.at[idx].set(rows[:, :, t - 1].reshape(-1), mode="drop"))


def _update_right(rgt, cor, rec, r, c, n8: int, t: int, valid, w8: int):
    """Write the block's right pixel column into its right cells' cols,
    and those cells' bottom-right pixels into the corner array. A cell
    queried as a corner reference is always a bottom- or right-edge cell
    of its CU, so maintaining the corner array from both edge updates
    covers every legal corner read."""
    N = rgt.shape[0]
    K = r.shape[0]
    cols = rec[:, :, -1].reshape(K, n8, t)
    idx = (r[:, None] + jnp.arange(n8)[None, :]) * w8 + (c + n8 - 1)[:, None]
    idx = jnp.where(valid[:, None], idx, N).reshape(-1)
    return (rgt.at[idx].set(cols.reshape(-1, t), mode="drop"),
            cor.at[idx].set(cols[:, :, t - 1].reshape(-1), mode="drop"))


def _scan_sel(modes, log2: int, c_idx: int):
    """Mode-dependent scan for small TUs (mirror of sbh.scan_for)."""
    if not (log2 == 2 or (log2 == 3 and c_idx == 0)):
        return jnp.zeros_like(modes)
    return jnp.where((modes >= 6) & (modes <= 14), 2,
                     jnp.where((modes >= 22) & (modes <= 30), 1, 0))


def _process_class(carry, fields, src_tiles, n: int, strong: bool,
                   sbh: bool, rdoq: bool, h8: int, w8: int):
    """One size class of one wavefront level. carry = 6 border arrays; the
    heavy recon/coeff tiles are RETURNED (stacked by lax.scan) rather than
    scattered into planes — keeping the loop-carried state tiny is what
    makes the wavefront fast on TPU (full-plane scatters were ~100x)."""
    from ..encode.sbh import apply_sbh_jnp
    (bY, rY, kY, bCb, rCb, kCb, bCr, rCr, kCr) = carry
    (sty, stcb, stcr) = src_tiles
    xs, ys, mode, cmode, qpy, qpc_b, qpc_r, al, ac, at, valid = fields
    log2 = n.bit_length() - 1
    n8 = n // 8
    r = ys >> 3
    c = xs >> 3
    # ---- luma
    refs_u, refs_f = _refs_from_borders(bY, rY, kY, r, c, al, ac, at,
                                        n8, 8, 1, strong, True, h8, w8)
    pred = _predict_dyn(refs_u, refs_f, mode, n, True)
    resi = _take_tiles(sty, r, c, n8, 8, w8) - pred
    lev = _fwd_quant(resi, qpy, n, log2, rdoq)
    if sbh:
        lev = apply_sbh_jnp(lev, _scan_sel(mode, log2, 0), n)
    rec = jnp.clip(pred + _dequant_itx(lev, qpy, n, log2), 0, 255)
    bY, kY = _update_bottom(bY, kY, rec, r, c, n8, 8, valid, w8)
    rY, kY = _update_right(rY, kY, rec, r, c, n8, 8, valid, w8)
    outs = [rec.astype(jnp.uint8), lev.astype(jnp.int16)]
    # ---- chroma (same cell grid, 4x4-pixel tiles, masks cover 2 samples)
    nc = n // 2
    clog2 = log2 - 1
    for (bC, rC, kC, st, qpc, which) in (
            (bCb, rCb, kCb, stcb, qpc_b, 0),
            (bCr, rCr, kCr, stcr, qpc_r, 1)):
        cref_u, _ = _refs_from_borders(bC, rC, kC, r, c, al, ac, at,
                                       n8, 4, 2, False, False, h8, w8)
        cpred = _predict_dyn(cref_u, cref_u, cmode, nc, False)
        cresi = _take_tiles(st, r, c, n8, 4, w8) - cpred
        clev = _fwd_quant(cresi, qpc, nc, clog2, rdoq)
        if sbh:
            clev = apply_sbh_jnp(clev, _scan_sel(cmode, clog2, which + 1),
                                 nc)
        crec = jnp.clip(cpred + _dequant_itx(clev, qpc, nc, clog2), 0, 255)
        nb, nk = _update_bottom(bC, kC, crec, r, c, n8, 4, valid, w8)
        nr, nk = _update_right(rC, nk, crec, r, c, n8, 4, valid, w8)
        if which == 0:
            bCb, rCb, kCb = nb, nr, nk
        else:
            bCr, rCr, kCr = nb, nr, nk
        outs += [crec.astype(jnp.uint8), clev.astype(jnp.int16)]
    return (bY, rY, kY, bCb, rCb, kCb, bCr, rCr, kCr), tuple(outs)


def _recon_class(carry, fields, coef_tiles, n: int, strong: bool,
                 h8: int, w8: int):
    """Decode twin of _process_class: prediction from carried borders +
    PARSED residual levels (dequant+IDCT) instead of forward-coding a
    source. Drives the decoder's batched intra reconstruction."""
    (bY, rY, kY, bCb, rCb, kCb, bCr, rCr, kCr) = carry
    cty, ctcb, ctcr = coef_tiles
    xs, ys, mode, cmode, qpy, qpc_b, qpc_r, al, ac, at, valid = fields
    log2 = n.bit_length() - 1
    n8 = n // 8
    r = ys >> 3
    c = xs >> 3
    refs_u, refs_f = _refs_from_borders(bY, rY, kY, r, c, al, ac, at,
                                        n8, 8, 1, strong, True, h8, w8)
    pred = _predict_dyn(refs_u, refs_f, mode, n, True)
    lev = _take_tiles(cty, r, c, n8, 8, w8)
    rec = jnp.clip(pred + _dequant_itx(lev, qpy, n, log2), 0, 255)
    bY, kY = _update_bottom(bY, kY, rec, r, c, n8, 8, valid, w8)
    rY, kY = _update_right(rY, kY, rec, r, c, n8, 8, valid, w8)
    outs = [rec.astype(jnp.uint8)]
    nc = n // 2
    clog2 = log2 - 1
    for (bC, rC, kC, ct, qpc, which) in (
            (bCb, rCb, kCb, ctcb, qpc_b, 0),
            (bCr, rCr, kCr, ctcr, qpc_r, 1)):
        cref_u, _ = _refs_from_borders(bC, rC, kC, r, c, al, ac, at,
                                       n8, 4, 2, False, False, h8, w8)
        cpred = _predict_dyn(cref_u, cref_u, cmode, nc, False)
        clev = _take_tiles(ct, r, c, n8, 4, w8)
        crec = jnp.clip(cpred + _dequant_itx(clev, qpc, nc, clog2), 0, 255)
        nb, nk = _update_bottom(bC, kC, crec, r, c, n8, 4, valid, w8)
        nr, nk = _update_right(rC, nk, crec, r, c, n8, 4, valid, w8)
        if which == 0:
            bCb, rCb, kCb = nb, nr, nk
        else:
            bCr, rCr, kCr = nb, nr, nk
        outs.append(crec.astype(jnp.uint8))
    return (bY, rY, kY, bCb, rCb, kCb, bCr, rCr, kCr), tuple(outs)


def _recon_intra_frame_core(coef_y, coef_cb, coef_cr, segs, strong: bool,
                            init_planes=None):
    """Batched wavefront intra reconstruction from parsed coefficient
    planes (int16). Returns (rec_y, rec_cb, rec_cr) uint8 padded planes.

    init_planes: optional (y, cb, cr) int planes holding already-
    reconstructed content (inter cells of a P/B picture); the wavefront
    then covers only the cells named by `segs`, seeding its border carry
    from the existing pixels (legal reference material, constrained-intra
    off) and writing its results over them."""
    ph, pw = coef_y.shape
    h8, w8 = ph >> 3, pw >> 3
    N = h8 * w8
    cty = _tile(coef_y.astype(jnp.int32), 8)
    ctcb = _tile(coef_cb.astype(jnp.int32), 4)
    ctcr = _tile(coef_cr.astype(jnp.int32), 4)
    if init_planes is not None:
        carry = borders_from_planes(*init_planes)
    else:
        carry = (jnp.zeros((N, 8), jnp.int32), jnp.zeros((N, 8), jnp.int32),
                 jnp.zeros((N,), jnp.int32),
                 jnp.zeros((N, 4), jnp.int32), jnp.zeros((N, 4), jnp.int32),
                 jnp.zeros((N,), jnp.int32),
                 jnp.zeros((N, 4), jnp.int32), jnp.zeros((N, 4), jnp.int32),
                 jnp.zeros((N,), jnp.int32))

    def body(carry, level_fields):
        outs = []
        for fields, n in zip(level_fields, (8, 16, 32)):
            carry, o = _recon_class(carry, fields, (cty, ctcb, ctcr), n,
                                    strong, h8, w8)
            outs.append(o)
        return carry, tuple(outs)

    ys_segs = []
    for seg in segs:
        carry, ys = jax.lax.scan(body, carry, seg)
        ys_segs.append(ys)
    planes = []
    for ci, t in ((0, 8), (1, 4), (2, 4)):
        if init_planes is not None:
            tiles = _tile(init_planes[ci].astype(jnp.uint8), t)
        else:
            tiles = jnp.zeros((N, t, t), jnp.uint8)
        for seg, ys in zip(segs, ys_segs):
            for k, n in enumerate((8, 16, 32)):
                sched = seg[k]
                tiles = _assemble(tiles, ys[k][ci], sched[0], sched[1],
                                  sched[10], n // 8, t, w8)
        planes.append(_untile(tiles, h8, w8))
    return tuple(planes)


recon_intra_frame_jit = partial(
    jax.jit, static_argnames=("strong",))(_recon_intra_frame_core)


def _recon_filter_frame_core(coef_y, coef_cb, coef_cr, segs, bs_v, bs_h,
                             qp4, sao_params, strong: bool, deblock: bool,
                             sao: bool, sao_chroma: bool,
                             boff: int, toff: int, cbo: int, cro: int,
                             width: int, height: int, cs: int):
    """Decoder fast path, whole picture in ONE dispatch: wavefront intra
    reconstruction from parsed levels -> deblock -> SAO apply with the
    PARSED params. Output planes stay on device (fetched lazily at output
    time so the fetch overlaps the next picture's parse)."""
    from .deblock import deblock_planes
    from .saoapply import sao_apply_core
    ry, rcb, rcr = _recon_intra_frame_core(coef_y, coef_cb, coef_cr, segs,
                                           strong)
    if deblock:
        dy, dcb, dcr = deblock_planes(
            ry.astype(jnp.int32), rcb.astype(jnp.int32),
            rcr.astype(jnp.int32), bs_v, bs_h, qp4, boff, toff, cbo, cro,
            width, height)
        ry = dy.astype(jnp.uint8)
        rcb = dcb.astype(jnp.uint8)
        rcr = dcr.astype(jnp.uint8)
    if sao:
        type_, offs_, bpos_, eocl_ = sao_params
        ry, rcb, rcr = sao_apply_core(ry, rcb, rcr, type_, offs_, bpos_,
                                      eocl_, True, sao_chroma,
                                      width, height, cs)
    return ry, rcb, rcr


recon_filter_frame_jit = partial(
    jax.jit, static_argnames=("strong", "deblock", "sao", "sao_chroma",
                              "boff", "toff", "cbo", "cro", "width",
                              "height", "cs"))(_recon_filter_frame_core)


def _dense_residual(coef, qp4, size_pix, classes):
    """Per-TU-size inverse transform of a whole coefficient plane,
    computed DENSELY per class and selected by the per-pixel size map:
    every aligned tile of each class is IDCT'd (compute is free on TPU;
    gather-shaped per-block work is not), and each pixel takes the class
    its TU actually has. Coefficient planes are zero outside coded TUs,
    so wrong-class tiles contribute nothing where it matters.
    classes: (n, tx_log2, sel_log2) per class — n/tx_log2 are THIS
    plane's tile size, sel_log2 the LUMA CU log2 the size map carries
    (chroma tiles are half the luma TU).
    qp4: per-4-sample QP grid of this plane (chroma-mapped already)."""
    H, W = coef.shape
    c32 = coef.astype(jnp.int32)
    resid = jnp.zeros((H, W), jnp.int32)
    for (n, tx_log2, sel_log2) in classes:
        tiles = _tile(c32, n)
        step = max(n // 4, 1)
        qp_t = qp4[::step, ::step].reshape(-1)
        r = _dequant_itx(tiles, qp_t, n, tx_log2)
        rp = _untile(r, H // n, W // n)
        resid = jnp.where(size_pix == sel_log2, rp, resid)
    return resid


def _recon_inter_filter_core(refs_y, refs_cb, refs_cr,
                             slot0, mv0, slot1, mv1, wts0, wts1,
                             coef_y, coef_cb, coef_cr,
                             log2m8, qp4, qp4_cb, qp4_cr, inter_pix,
                             segs, bs_v, bs_h, sao_params,
                             has_l1: bool, strong: bool, deblock: bool,
                             sao: bool, sao_chroma: bool,
                             boff: int, toff: int, cbo: int, cro: int,
                             width: int, height: int, cs: int):
    """Decoder fast path for P/B pictures, whole picture in ONE dispatch:
    full-frame MC from the parsed per-8x8-cell motion field -> dense
    per-class residual add -> masked wavefront for the picture's intra
    CUs (seeded from the inter reconstruction) -> deblock -> SAO apply
    with the parsed params. The per-CU host MC/recon walk this replaces
    was the decode throughput bottleneck for inter streams."""
    from .deblock import deblock_planes
    from .mc import _mc_core
    from .saoapply import sao_apply_core
    ph, pw = coef_y.shape
    h8, w8 = ph >> 3, pw >> 3
    py, pcb, pcr = _mc_core(refs_y, refs_cb, refs_cr, slot0, mv0,
                            slot1, mv1, wts0, wts1, has_l1, h8, w8,
                            width, height)
    size_pix = jnp.repeat(jnp.repeat(log2m8.astype(jnp.int32), 8, 0),
                          8, 1)
    size_pix_c = size_pix[::2, ::2]
    ry = _dense_residual(coef_y, qp4, size_pix,
                         ((8, 3, 3), (16, 4, 4), (32, 5, 5)))
    rcb = _dense_residual(coef_cb, qp4_cb, size_pix_c,
                          ((4, 2, 3), (8, 3, 4), (16, 4, 5)))
    rcr = _dense_residual(coef_cr, qp4_cr, size_pix_c,
                          ((4, 2, 3), (8, 3, 4), (16, 4, 5)))
    # residual applies to INTER cells only (intra cells reconstruct in
    # the wavefront below, which reads the same coefficient planes)
    y = jnp.clip(py.astype(jnp.int32) + jnp.where(inter_pix, ry, 0),
                 0, 255).astype(jnp.uint8)
    cb = jnp.clip(pcb.astype(jnp.int32)
                  + jnp.where(inter_pix[::2, ::2], rcb, 0),
                  0, 255).astype(jnp.uint8)
    cr = jnp.clip(pcr.astype(jnp.int32)
                  + jnp.where(inter_pix[::2, ::2], rcr, 0),
                  0, 255).astype(jnp.uint8)
    if segs is not None:
        y, cb, cr = _recon_intra_frame_core(coef_y, coef_cb, coef_cr,
                                            segs, strong,
                                            init_planes=(y, cb, cr))
    if deblock:
        dy, dcb, dcr = deblock_planes(
            y.astype(jnp.int32), cb.astype(jnp.int32),
            cr.astype(jnp.int32), bs_v, bs_h, qp4, boff, toff, cbo, cro,
            width, height)
        y = dy.astype(jnp.uint8)
        cb = dcb.astype(jnp.uint8)
        cr = dcr.astype(jnp.uint8)
    if sao:
        type_, offs_, bpos_, eocl_ = sao_params
        y, cb, cr = sao_apply_core(y, cb, cr, type_, offs_, bpos_,
                                   eocl_, True, sao_chroma,
                                   width, height, cs)
    return y, cb, cr


recon_inter_filter_jit = partial(
    jax.jit, static_argnames=("has_l1", "strong", "deblock", "sao",
                              "sao_chroma", "boff", "toff", "cbo", "cro",
                              "width", "height", "cs"))(
    _recon_inter_filter_core)


def _assemble(tiles, recs, xs, ys, valid, n8: int, t: int, w8: int):
    """Scatter stacked (L, K, n, n) class results into the leading-axis
    tiled plane (one batched scatter per class, outside the loop)."""
    N = tiles.shape[0]
    L, K = xs.shape
    r = ys >> 3
    c = xs >> 3
    dy = jnp.arange(n8)
    idx = ((r[:, :, None, None] + dy[None, None, :, None]) * w8
           + c[:, :, None, None] + dy[None, None, None, :])  # (L,K,n8,n8)
    idx = jnp.where(valid[:, :, None, None], idx, N)
    v = recs.reshape(L, K, n8, t, n8, t).transpose(0, 1, 2, 4, 3, 5) \
            .reshape(-1, t, t)
    return tiles.at[idx.reshape(-1)].set(v.astype(tiles.dtype), mode="drop")


def borders_from_planes(y, cb, cr):
    """Initial border carry (bot/right/corner per plane) read from existing
    plane contents — seeds the wavefront when it codes only a SUBSET of the
    frame's CUs (intra CUs inside an inter frame: their inter neighbors'
    reconstruction already exists and is legal reference material)."""
    out = []
    for p, t in ((y, 8), (cb, 4), (cr, 4)):
        tiles = _tile(p.astype(jnp.int32), t)
        out += [tiles[:, t - 1, :], tiles[:, :, t - 1],
                tiles[:, t - 1, t - 1]]
    return tuple(out)


def _code_intra_frame_core(src_y, src_cb, src_cr, segs,
                           strong: bool, sbh: bool = False,
                           rdoq: bool = False, init_borders=None):
    """segs: tuple of level-axis SEGMENTS, each (sched8, sched16,
    sched32) 11-field packs. Segmenting lets each chunk of levels carry
    its own K width — the wavefront frontier is diamond-shaped, so one
    global K pads the narrow head/tail levels several-fold."""
    # sources may arrive as uint8 (cheap transfer); compute in int32
    ph, pw = src_y.shape
    h8, w8 = ph >> 3, pw >> 3
    N = h8 * w8
    sty = _tile(src_y.astype(jnp.int32), 8)
    stcb = _tile(src_cb.astype(jnp.int32), 4)
    stcr = _tile(src_cr.astype(jnp.int32), 4)
    if init_borders is not None:
        carry = init_borders
    else:
        carry = (jnp.zeros((N, 8), jnp.int32), jnp.zeros((N, 8), jnp.int32),
                 jnp.zeros((N,), jnp.int32),
                 jnp.zeros((N, 4), jnp.int32), jnp.zeros((N, 4), jnp.int32),
                 jnp.zeros((N,), jnp.int32),
                 jnp.zeros((N, 4), jnp.int32), jnp.zeros((N, 4), jnp.int32),
                 jnp.zeros((N,), jnp.int32))

    def body(carry, level_fields):
        outs = []
        for fields, n in zip(level_fields, (8, 16, 32)):
            carry, o = _process_class(carry, fields, (sty, stcb, stcr), n,
                                      strong, sbh, rdoq, h8, w8)
            outs.append(o)
        return carry, tuple(outs)

    ys_segs = []
    for seg in segs:
        carry, ys = jax.lax.scan(body, carry, seg)
        ys_segs.append(ys)
    planes = []
    for (pi, t_l, t_c, dt) in ((0, 8, 4, jnp.uint8),    # recon
                               (1, 8, 4, jnp.int16)):   # coeff levels
        for ci, t in ((0, t_l), (2, t_c), (4, t_c)):    # Y, Cb, Cr slots
            tiles = jnp.zeros((N, t, t), dt)
            for seg, ys in zip(segs, ys_segs):
                for k, n in enumerate((8, 16, 32)):
                    sched = seg[k]
                    tiles = _assemble(tiles, ys[k][ci + pi], sched[0],
                                      sched[1], sched[10], n // 8, t, w8)
            planes.append(_untile(tiles, h8, w8))
    # order: recon Y/Cb/Cr then coeff Y/Cb/Cr (the existing API contract)
    return tuple(planes)


@partial(jax.jit, static_argnames=("strong", "sbh", "rdoq"))
def _code_intra_frame(src_y, src_cb, src_cr, segs,
                      strong: bool, sbh: bool = False, rdoq: bool = False):
    return _code_intra_frame_core(src_y, src_cb, src_cr, segs,
                                  strong, sbh, rdoq)


@partial(jax.jit, static_argnames=("strong", "sbh", "rdoq"))
def _code_intra_frames_batch(src_y, src_cb, src_cr, segs,
                             strong: bool, sbh: bool = False,
                             rdoq: bool = False):
    """FPP analog (SURVEY.md 7.3#2): vmap the wavefront over F independent
    intra frames so each level-step batches F frames' CUs — the step
    work amortizes across frames at identical sequential depth."""
    return jax.vmap(
        lambda a, b, c, sg: _code_intra_frame_core(
            a, b, c, sg, strong, sbh, rdoq)
    )(src_y, src_cb, src_cr, segs)


def _bitcast_rows(a):
    """(F, ...) any-dtype device array -> (F, nbytes) uint8 rows."""
    F = a.shape[0]
    if a.dtype == jnp.uint8:
        return a.reshape(F, -1)
    return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(F, -1)


def pack_coeffs_sparse(flatc, cap: int):
    """Sparse-pack one frame's flat int16 coefficient vector for the D2H
    fetch: per-value nonzero BITMAP (M/8 bytes) + the nonzero values
    compacted to a static-cap int8 list with an int16 escape side-list.
    Dense int8 coeffs were the dominant transfer term (~1.4 MB/frame at
    720p) through the ~15 MB/s device tunnel; typical frames are 3-8%
    nonzero. Returns a list of uint8 row parts + the overflow count."""
    M = flatc.shape[0]
    nz = flatc != 0
    bitmap = jnp.packbits(nz)                    # (M/8,) uint8
    idx = jnp.nonzero(nz, size=cap, fill_value=M)[0].astype(jnp.int32)
    vals = jnp.where(idx < M, flatc[jnp.clip(idx, 0, M - 1)], 0)
    v8 = jnp.clip(vals, -128, 127).astype(jnp.int8)
    esc = jnp.abs(vals) > 127
    nesc = esc.sum().astype(jnp.int32)
    ecap = max(cap // 16, 256)    # escapes are |v|>127: rare (<1%)
    eidx = jnp.nonzero(esc, size=ecap, fill_value=-1)[0].astype(jnp.int32)
    evals = jnp.where(eidx >= 0, vals[jnp.clip(eidx, 0)], 0) \
        .astype(jnp.int16)
    cnt = nz.sum().astype(jnp.int32)
    return [_b1(bitmap), _b1(cnt), _b1(nesc), _b1(v8), _b1(eidx),
            _b1(evals)], cnt


def _b1(a):
    if a.ndim == 0:
        a = a[None]
    if a.dtype == jnp.uint8:
        return a.reshape(-1)
    return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)


def unpack_coeffs_sparse(take, M: int, cap: int, dense_fetch=None):
    """Host-side inverse of pack_coeffs_sparse; `take(dtype, shape)` reads
    consecutive fields from the fetched row. Returns flat int16 (M,).
    dense_fetch: zero-arg fallback returning the dense coefficients when
    the static cap overflowed (still must consume the row fields)."""
    ecap = max(cap // 16, 256)
    bitmap = take(np.uint8, (M // 8,))
    cnt = int(take(np.int32, (1,))[0])
    nesc = int(take(np.int32, (1,))[0])
    v8 = take(np.int8, (cap,))
    eidx = take(np.int32, (ecap,))
    evals = take(np.int16, (ecap,))
    if cnt > cap or nesc > ecap:
        if dense_fetch is not None:
            return dense_fetch()
        raise RuntimeError("sparse coeff overflow (%d > %d or %d > %d)"
                           % (cnt, cap, nesc, ecap))
    flat = np.zeros(M, np.int16)
    pos = np.nonzero(np.unpackbits(bitmap))[0]
    vals = v8[:len(pos)].astype(np.int16)
    live = eidx >= 0
    vals[eidx[live]] = evals[live]
    flat[pos] = vals
    return flat


def _fused_rows_core(src_y, src_cb, src_cr, segs, bs_v, bs_h, qp4,
                     strong: bool,
                     sbh: bool, rdoq: bool, boff: int, toff: int,
                     cbo: int, cro: int, width: int, height: int,
                     sao: bool, cs: int, sao_tier: int = 4):
    """The whole per-batch device pipeline in one traced graph:
    wavefront code -> deblock -> SAO statistics, returning packed uint8
    ROWS (one per frame) so the host pays a single D2H fetch (the axon
    tunnel charges ~tens of ms fixed per fetch; per-frame fetches
    dominated the round-1 profile) and so the frame axis stays shardable
    (each row lives wholly on the device that coded the frame). Replaces
    the reference's CCtuEnc + CLoopFilterCtu + per-CTU SAO stat loops
    (SURVEY.md 2.3)."""
    from .deblock import deblock_planes
    from .saostats import sao_stats_plane_core
    ry, rcb, rcr, cy, ccb, ccr = jax.vmap(
        lambda a, b, c, sg: _code_intra_frame_core(
            a, b, c, sg, strong, sbh, rdoq)
    )(src_y, src_cb, src_cr, segs)
    dy, dcb, dcr = jax.vmap(
        lambda y, cb, cr, bv, bh, q4: deblock_planes(
            y.astype(jnp.int32), cb.astype(jnp.int32),
            cr.astype(jnp.int32), bv, bh, q4, boff, toff, cbo, cro,
            width, height)
    )(ry, rcb, rcr, bs_v, bs_h, qp4)
    # coefficients travel SPARSE (per-value bitmap + compacted values):
    # typical frames are 3-8% nonzero and the D2H tunnel is the encode
    # bottleneck. A frame overflowing the static cap is detected host-side
    # and falls back to the per-frame path.
    F = cy.shape[0]
    flatc = jnp.concatenate([cy.reshape(F, -1), ccb.reshape(F, -1),
                             ccr.reshape(F, -1)], axis=1)    # (F, M) int16
    M = flatc.shape[1]
    cap = _coeff_cap(M)

    def _pack(v):
        parts, _ = pack_coeffs_sparse(v, cap)
        return jnp.concatenate(parts)

    cparts = jax.vmap(_pack)(flatc)
    parts = [cparts]
    if sao:
        # the preset's SAO tier caps what the decision can ever pick:
        # tier<=1 (superfast) = luma EO classes 0/1 only, tier 2 = luma
        # all EO, tier>=3 = + band offset + chroma — compute and ship
        # only those stats (full stats were ~300 KB/frame over the link)
        ncl = 2 if sao_tier <= 1 else 4
        use_bo = sao_tier >= 3
        planes = ((dy, src_y, 0),) if sao_tier < 3 else \
            ((dy, src_y, 0), (dcb, src_cb, 1), (dcr, src_cr, 1))
        for rec, src, shift in planes:
            # lax.map, NOT vmap: the 32-band masking materializes dozens
            # of full-plane temps per frame — batched they blow HBM
            st = jax.lax.map(
                lambda rs, _shift=shift: sao_stats_plane_core(
                    rs[0], rs[1].astype(jnp.int32), width >> _shift,
                    height >> _shift, cs >> _shift, classes=ncl,
                    bo=use_bo), (rec, src))
            parts += [_bitcast_rows(a) for a in st if a is not None]
    # recon AND dense coefficients STAY ON DEVICE: the host fetches only
    # the small packed row (sparse coeffs + stats); planes come back
    # lazily on demand (recon) or on sparse-cap overflow (coeffs)
    return (jnp.concatenate(parts, axis=1), dy.astype(jnp.uint8),
            dcb.astype(jnp.uint8), dcr.astype(jnp.uint8),
            cy, ccb, ccr)


_code_intra_frames_fused = partial(
    jax.jit, static_argnames=("strong", "sbh", "rdoq", "boff", "toff",
                              "cbo", "cro", "width", "height", "sao",
                              "cs", "sao_tier"))(_fused_rows_core)

_FUSED_SHARDED_CACHE: dict = {}
_MESH_CACHE: dict = {}


def _shard_map():
    try:
        from jax import shard_map
    except ImportError:                     # older jax: experimental
        from jax.experimental.shard_map import shard_map
    return shard_map


def _frame_mesh(F: int):
    """Mesh over all local devices for frame-axis data parallelism, or
    None when a single device (or an indivisible batch) makes sharding
    moot. This is the axis the driver's dryrun_multichip exercises."""
    devs = jax.devices()
    n = len(devs)
    if n <= 1 or F % n != 0:
        return None
    mesh = _MESH_CACHE.get(n)
    if mesh is None:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(devs), ("f",))
        _MESH_CACHE[n] = mesh
    return mesh


def fused_rows_sharded(mesh, arrays, statics: dict):
    """Production multi-chip step (SURVEY.md 5.8): shard_map the fused
    code->deblock->SAO pipeline over the mesh's frame axis — all-intra
    frames are independent, so the FPP batch is pure data parallelism
    riding ICI with zero collectives; each device codes its shard of
    frames and the packed rows come back sharded the same way."""
    from jax.sharding import PartitionSpec as P
    key = (id(mesh), tuple(sorted(statics.items())))
    fn = _FUSED_SHARDED_CACHE.get(key)
    if fn is None:
        core = partial(_fused_rows_core, **statics)
        spec_in = jax.tree_util.tree_map(lambda _: P("f"), arrays)
        out_spec = (P("f"),) * 7
        sm = _shard_map()
        # the scan carry starts from replicated zeros and becomes varying
        # on the first step — that is intended (pure per-device DP), so
        # drop the varying-manual-axes check (named check_vma on current
        # jax, check_rep before)
        try:
            wrapped = sm(core, mesh=mesh, in_specs=tuple(spec_in),
                         out_specs=out_spec, check_vma=False)
        except TypeError:
            wrapped = sm(core, mesh=mesh, in_specs=tuple(spec_in),
                         out_specs=out_spec, check_rep=False)
        fn = jax.jit(wrapped)
        _FUSED_SHARDED_CACHE[key] = fn
    return fn(*arrays)


class WavefrontIntraCoder:
    """Host orchestration: native schedule build + packing + device call."""

    def __init__(self):
        self._native = None
        try:
            from .. import native
            if native.HAVE_NATIVE:
                self._native = native
        except Exception:
            pass

    @property
    def available(self) -> bool:
        return self._native is not None

    def build_schedule(self, log2map8: np.ndarray, width: int, height: int,
                       log2_ctb: int, log2_min_cb: int, tile8=None):
        """-> dict size -> packed [L, K] field arrays + n_levels.

        tile8: optional (h8, w8) int32 tile-id map — availability (and so
        the dependency levels) cut at tile walls, which both matches the
        decoder's 6.4.1 availability AND shortens the wavefront's critical
        path (the tile axis is the TPU parallel-scaling axis, SURVEY 5.7)."""
        import ctypes
        lib = self._native._lib
        h8, w8 = log2map8.shape
        cap = w8 * h8
        m = np.ascontiguousarray(log2map8, np.uint8)
        t8 = (np.ascontiguousarray(tile8, np.int32) if tile8 is not None
              else None)
        ox = np.empty(cap, np.int32)
        oy = np.empty(cap, np.int32)
        osz = np.empty(cap, np.int32)
        olv = np.empty(cap, np.int32)
        oal = np.empty(cap, np.uint32)
        oac = np.empty(cap, np.uint8)
        oat = np.empty(cap, np.uint32)
        work = np.empty(2 * cap, np.int32)

        def p(a, ct):
            return a.ctypes.data_as(ctypes.POINTER(ct))

        lib.ks_build_intra_schedule.restype = ctypes.c_long
        count = lib.ks_build_intra_schedule(
            p(m, ctypes.c_uint8),
            p(t8, ctypes.c_int32) if t8 is not None
            else ctypes.POINTER(ctypes.c_int32)(),
            w8, h8, width, height, log2_ctb, log2_min_cb,
            p(ox, ctypes.c_int32), p(oy, ctypes.c_int32),
            p(osz, ctypes.c_int32), p(olv, ctypes.c_int32),
            p(oal, ctypes.c_uint32), p(oac, ctypes.c_uint8),
            p(oat, ctypes.c_uint32), p(work, ctypes.c_int32))
        return (ox[:count], oy[:count], osz[:count], olv[:count],
                oal[:count], oac[:count], oat[:count])

    N_SEG = 4       # level-axis segments, each with its own K width

    @classmethod
    def seg_bounds(cls, n_levels: int):
        lpad = _round_up(max(n_levels, 1), 8)
        seg_len = _round_up((lpad + cls.N_SEG - 1) // cls.N_SEG, 8)
        bounds = []
        l0 = 0
        while l0 < lpad:
            bounds.append((l0, min(l0 + seg_len, lpad)))
            l0 += seg_len
        return bounds

    def pack(self, sched, modes8, cmodes8, qp_map8, h8, w8,
             n_tile_cols: int = 1, bounds=None):
        """Group CU records by level into SEGMENTED padded [Ls, Ks]
        arrays per class: the wavefront frontier is diamond-shaped, so a
        single global K width pads the narrow head/tail levels
        several-fold — measured ~2x slot overwork at 720p even after
        occupancy-tight global K. Each of N_SEG level chunks gets its own
        K (bucketed to 16 to bound compile variants).
        Returns (segments, n_levels): segments is a list of per-segment
        dicts size -> 11-field pack."""
        ox, oy, osz, olv, oal, oac, oat = sched
        n_levels = int(olv.max()) + 1 if len(olv) else 0
        if bounds is None:
            bounds = self.seg_bounds(n_levels)
        fields = {}
        for size in (8, 16, 32):
            sel = osz == size
            if not sel.any():
                fields[size] = None
                continue
            x, y, lv = ox[sel], oy[sel], olv[sel]
            al, ac, at = oal[sel], oac[sel], oat[sel]
            mode = modes8[y >> 3, x >> 3]
            cmode = cmodes8[y >> 3, x >> 3]
            qp = qp_map8[y >> 3, x >> 3]
            order = np.argsort(lv, kind="stable")
            lv_s = lv[order]
            slot = np.arange(len(lv_s)) - np.searchsorted(lv_s, lv_s)
            fields[size] = (lv_s, slot, order, x, y, mode, cmode, qp,
                            al, ac, at)
        segments = []
        for (s0, s1) in bounds:
            seg = {}
            for size in (8, 16, 32):
                f = fields[size]
                ls = s1 - s0
                if f is None:
                    shape = (ls, 8)
                    z = lambda dt: np.zeros(shape, dt)
                    seg[size] = (z(np.int32), z(np.int32), z(np.int32),
                                 z(np.int32), z(np.int32), z(np.int32),
                                 z(np.int32), z(np.uint32), z(np.uint32),
                                 z(np.uint32), z(bool))
                    continue
                (lv_s, slot, order, x, y, mode, cmode, qp,
                 al, ac, at) = f
                m = (lv_s >= s0) & (lv_s < s1)
                kmax = int(slot[m].max()) + 1 if m.any() else 1
                kpad = max(8, _round_up(kmax, 16))
                shape = (ls, kpad)
                lrel = lv_s[m] - s0
                srel = slot[m]
                om = order[m]

                def packed(vals, dtype, fill=0):
                    a = np.full(shape, fill, dtype)
                    a[lrel, srel] = vals[om].astype(dtype)
                    return a

                seg[size] = (
                    packed(x, np.int32), packed(y, np.int32),
                    packed(mode, np.int32), packed(cmode, np.int32),
                    packed(qp, np.int32),
                    packed(self._cqp_cb[qp], np.int32),
                    packed(self._cqp_cr[qp], np.int32),
                    packed(al.astype(np.int64), np.uint32),
                    packed(ac, np.uint32),
                    packed(at.astype(np.int64), np.uint32),
                    packed(np.ones(len(x), bool), bool))
            segments.append(seg)
        return segments, n_levels

    def code_frames(self, items, qp_cb_off, qp_cr_off, sps,
                    sbh: bool = False, rdoq: bool = False, post=None,
                    defer: bool = False, src_dev=None):
        """Batched multi-frame pass. items: list of dicts with keys
        src_y/src_cb/src_cr/log2m/modes8/cmodes8/qp_map8. Returns a list of
        (ry, rcb, rcr, cy, ccb, ccr) numpy tuples, one per frame — or,
        with `post` (dict boff/toff/cbo/cro/deblock/sao), a list of dicts
        {planes, sao_stats, deblocked} from the fused code->deblock->SAO
        device pipeline with a single packed D2H fetch. With defer=True
        (post path) the dispatch returns immediately and the result is a
        zero-arg callable performing the fetch+unpack — the pipelining
        hook for overlapping device compute with host entropy coding."""
        self._cqp_cb = np.array(
            [chroma_qp(min(q + qp_cb_off, 57)) for q in range(64)], np.int32)
        self._cqp_cr = np.array(
            [chroma_qp(min(q + qp_cr_off, 57)) for q in range(64)], np.int32)
        scheds = []
        n_levels = 0
        for it in items:
            sched = self.build_schedule(it["log2m"], sps.width, sps.height,
                                        sps.log2_ctb, sps.log2_min_cb,
                                        tile8=it.get("tile8"))
            scheds.append(sched)
            if len(sched[3]):
                n_levels = max(n_levels, int(sched[3].max()) + 1)
        bounds = self.seg_bounds(n_levels)
        packs = []
        for it, sched in zip(items, scheds):
            h8, w8 = it["log2m"].shape
            pk, _ = self.pack(sched, it["modes8"], it["cmodes8"],
                              it["qp_map8"], h8, w8,
                              n_tile_cols=it.get("n_tile_cols", 1),
                              bounds=bounds)
            packs.append(pk)
        # per-segment per-class common K across the batch
        segs = []
        for si in range(len(bounds)):
            seg_cls = []
            for size in (8, 16, 32):
                kpad = max(p[si][size][0].shape[1] for p in packs)
                stacked = []
                for fi in range(11):
                    arrs = []
                    for p in packs:
                        a = p[si][size][fi]
                        dk = kpad - a.shape[1]
                        if dk:
                            a = np.pad(a, ((0, 0), (0, dk)))
                        arrs.append(a)
                    stacked.append(jnp.asarray(np.stack(arrs)))
                seg_cls.append(tuple(stacked))
            segs.append(tuple(seg_cls))
        segs = tuple(segs)
        if src_dev is not None:
            sy, scb, scr = src_dev    # already-uploaded uint8 device stacks
        else:
            sy = jnp.asarray(np.stack([it["src_y"] for it in items])
                             .astype(np.uint8))
            scb = jnp.asarray(np.stack([it["src_cb"] for it in items])
                              .astype(np.uint8))
            scr = jnp.asarray(np.stack([it["src_cr"] for it in items])
                              .astype(np.uint8))
        if post is None:
            out = _code_intra_frames_batch(
                sy, scb, scr, segs,
                bool(sps.strong_intra_smoothing), bool(sbh), bool(rdoq))
            outs = tuple(np.asarray(o) for o in out)
            return [tuple(o[f] for o in outs) for f in range(len(items))]
        return self._fused(items, segs, sy, scb, scr, sps, sbh, rdoq,
                           post, defer=defer)

    def _fused(self, items, segs, sy, scb, scr, sps, sbh, rdoq, post,
               defer: bool = False):
        from .deblock import intra_bs_maps
        F = len(items)
        ph, pw = items[0]["src_y"].shape
        bs = [intra_bs_maps(it["log2m"]) for it in items]
        if not post.get("deblock", True):
            for v, h in bs:
                v[:] = 0
                h[:] = 0
        bsv = jnp.asarray(np.stack([b[0] for b in bs]))
        bsh = jnp.asarray(np.stack([b[1] for b in bs]))
        qp4 = jnp.asarray(np.stack(
            [np.repeat(np.repeat(it["qp_map8"], 2, 0), 2, 1)
             for it in items]))
        sao = bool(post.get("sao", False))
        statics = dict(strong=bool(sps.strong_intra_smoothing),
                       sbh=bool(sbh), rdoq=bool(rdoq),
                       boff=int(post["boff"]), toff=int(post["toff"]),
                       cbo=int(post["cbo"]), cro=int(post["cro"]),
                       width=sps.width, height=sps.height, sao=sao,
                       cs=sps.ctb_size,
                       sao_tier=int(post.get("sao_tier", 4)))
        arrays = (sy, scb, scr, segs, bsv, bsh, qp4)
        mesh = _frame_mesh(F)
        if mesh is not None:
            bufs = fused_rows_sharded(mesh, arrays, statics)
        else:
            bufs = _code_intra_frames_fused(*arrays, **statics)
        if defer:
            # jax dispatch is async: start the D2H copy in the background
            # and hand the caller a finisher — the device keeps crunching
            # while the host entropy-codes the previous chunk
            try:
                bufs[0].copy_to_host_async()
            except AttributeError:      # pragma: no cover - older jax
                pass
            return lambda: self._unpack_fused(bufs, F, ph, pw, sps, sao,
                                              post)
        return self._unpack_fused(bufs, F, ph, pw, sps, sao, post)

    def _unpack_fused(self, bufs, F, ph, pw, sps, sao, post):
        from ..utils.trace import stage
        row_buf, dyd, dcbd, dcrd, cyd, ccbd, ccrd = bufs
        with stage("wf.device_wait"):
            try:
                row_buf.block_until_ready()
            except AttributeError:      # pragma: no cover
                pass
        with stage("wf.row_fetch"):
            rows = np.asarray(row_buf)  # the ONE packed D2H fetch
        out = []
        for f in range(F):
            off = 0

            def take(dtype, shape):
                nonlocal off
                n = int(np.prod(shape))
                a = np.frombuffer(rows[f], dtype, n, off).reshape(shape)
                off += n * np.dtype(dtype).itemsize
                return a

            def dense_fetch(f=f):
                return np.concatenate(
                    [np.asarray(cyd[f]).reshape(-1),
                     np.asarray(ccbd[f]).reshape(-1),
                     np.asarray(ccrd[f]).reshape(-1)])

            M = ph * pw * 3 // 2
            flat = unpack_coeffs_sparse(take, M, _coeff_cap(M),
                                        dense_fetch)
            cy = flat[:ph * pw].reshape(ph, pw)
            ccb = flat[ph * pw:ph * pw * 5 // 4].reshape(ph // 2, pw // 2)
            ccr = flat[ph * pw * 5 // 4:].reshape(ph // 2, pw // 2)
            stats = None
            if sao:
                ncty, nctx = ph // sps.ctb_size, pw // sps.ctb_size
                tier = int(post.get("sao_tier", 4))
                ncl = 2 if tier <= 1 else 4
                npl = 1 if tier < 3 else 3
                stats = []
                for _ in range(npl):
                    ec = take(np.int32, (ncl, 5, ncty, nctx))
                    ee = take(np.int32, (ncl, 5, ncty, nctx))
                    if tier >= 3:
                        stats.append((ec, ee,
                                      take(np.int32, (32, ncty, nctx)),
                                      take(np.int32, (32, ncty, nctx))))
                    else:
                        stats.append((ec, ee, None, None))
                while len(stats) < 3:
                    stats.append(None)     # chroma never read below tier 3
                assert off == rows[f].size, (off, rows[f].size)
            out.append(dict(coeffs=(cy, ccb, ccr), sao_stats=stats,
                            deblocked=bool(post.get("deblock", True)),
                            fidx=f))
        # reconstruction planes stay device-resident (fetched on demand)
        for d in out:
            d["recon_dev"] = (dyd, dcbd, dcrd)
        return out

    def recon_frame(self, coef_y, coef_cb, coef_cr, log2map8, modes8,
                    cmodes8, qp_map8, qp_cb_off, qp_cr_off, sps,
                    tile8=None):
        """Decoder-side batched intra reconstruction: one device dispatch
        turning parsed coefficient planes + decision maps into the frame's
        pre-filter reconstruction (decode/slice_dec's per-TU host loop was
        the decode throughput bottleneck). Returns numpy uint8 planes."""
        self._cqp_cb = np.array(
            [chroma_qp(min(q + qp_cb_off, 57)) for q in range(64)],
            np.int32)
        self._cqp_cr = np.array(
            [chroma_qp(min(q + qp_cr_off, 57)) for q in range(64)],
            np.int32)
        sched = self.build_schedule(log2map8, sps.width, sps.height,
                                    sps.log2_ctb, sps.log2_min_cb,
                                    tile8=tile8)
        h8, w8 = log2map8.shape
        packed, _ = self.pack(sched, modes8, cmodes8, qp_map8, h8, w8)
        segs = tuple(
            tuple(tuple(jnp.asarray(a) for a in seg[size])
                  for size in (8, 16, 32))
            for seg in packed)
        coefs = (jnp.asarray(np.asarray(coef_y, np.int16)),
                 jnp.asarray(np.asarray(coef_cb, np.int16)),
                 jnp.asarray(np.asarray(coef_cr, np.int16)))
        out = recon_intra_frame_jit(*coefs, segs,
                                    bool(sps.strong_intra_smoothing))
        return tuple(np.asarray(o) for o in out)

    def recon_filter_frame(self, coef_y, coef_cb, coef_cr, log2map8,
                           modes8, cmodes8, qp_map8, qp_cb_off, qp_cr_off,
                           sps, bs_v, bs_h, qp4, sao_params, deblock: bool,
                           sao: bool, sao_chroma: bool, boff: int,
                           toff: int, tile8=None, db_cbo: int = 0,
                           db_cro: int = 0):
        """Full decoder fast path: recon + deblock + SAO in one dispatch.
        Returns DEVICE planes (uint8) — fetch is the caller's (lazy)."""
        self._cqp_cb = np.array(
            [chroma_qp(min(q + qp_cb_off, 57)) for q in range(64)],
            np.int32)
        self._cqp_cr = np.array(
            [chroma_qp(min(q + qp_cr_off, 57)) for q in range(64)],
            np.int32)
        sched = self.build_schedule(log2map8, sps.width, sps.height,
                                    sps.log2_ctb, sps.log2_min_cb,
                                    tile8=tile8)
        h8, w8 = log2map8.shape
        packed, _ = self.pack(sched, modes8, cmodes8, qp_map8, h8, w8)
        segs = tuple(
            tuple(tuple(jnp.asarray(a) for a in seg[size])
                  for size in (8, 16, 32))
            for seg in packed)
        sp = tuple(jnp.asarray(a) for a in sao_params) if sao else \
            (jnp.zeros((3, 1, 1), jnp.int8),) * 4
        return recon_filter_frame_jit(
            jnp.asarray(np.asarray(coef_y, np.int16)),
            jnp.asarray(np.asarray(coef_cb, np.int16)),
            jnp.asarray(np.asarray(coef_cr, np.int16)),
            segs, jnp.asarray(bs_v), jnp.asarray(bs_h), jnp.asarray(qp4),
            sp, bool(sps.strong_intra_smoothing), bool(deblock), bool(sao),
            bool(sao_chroma), int(boff), int(toff),
            int(db_cbo), int(db_cro), sps.width, sps.height,
            sps.ctb_size)

    def code_frame(self, src_y, src_cb, src_cr, log2map8, modes8, cmodes8,
                   qp_map8, qp_cb_off, qp_cr_off, sps, sbh: bool = False,
                   rdoq: bool = False, tile8=None, n_tile_cols: int = 1):
        """Run the full device pass. Returns numpy (recon y/cb/cr,
        coeff y/cb/cr) planes (padded sizes)."""
        # chroma qp lookup tables for this frame's offsets
        self._cqp_cb = np.array(
            [chroma_qp(min(q + qp_cb_off, 57)) for q in range(64)], np.int32)
        self._cqp_cr = np.array(
            [chroma_qp(min(q + qp_cr_off, 57)) for q in range(64)], np.int32)
        sched = self.build_schedule(log2map8, sps.width, sps.height,
                                    sps.log2_ctb, sps.log2_min_cb,
                                    tile8=tile8)
        h8, w8 = log2map8.shape
        packed, n_levels = self.pack(sched, modes8, cmodes8, qp_map8,
                                     h8, w8, n_tile_cols=n_tile_cols)
        segs = tuple(
            tuple(tuple(jnp.asarray(a) for a in seg[size])
                  for size in (8, 16, 32))
            for seg in packed)
        out = _code_intra_frame(
            jnp.asarray(np.asarray(src_y, np.uint8)),
            jnp.asarray(np.asarray(src_cb, np.uint8)),
            jnp.asarray(np.asarray(src_cr, np.uint8)),
            segs,
            bool(sps.strong_intra_smoothing), bool(sbh), bool(rdoq))
        return tuple(np.asarray(o) for o in out)
