"""Batched motion compensation: the whole frame's inter prediction as one
jitted device dispatch.

TPU-native replacement for the reference's per-PU interpolation loop
(ComInterpolation: interpLuma{Hor,Ver}8to16_c family + DefaultWeightedBi_c /
ExplicitWeighted*_c, SURVEY.md 2.2): motion is carried on a dense per-8x8-cell
grid (every legal PU geometry of this encoder is a union of 8x8 cells), each
cell gathers its (8+7)^2 reference patch, and the 8-tap separable filters run
as per-phase fixed-matrix matmuls with a one-hot phase select — the MXU does
the filtering, the VPU only the select. All arithmetic is bit-exact vs the
scalar oracle in decode/inter.py (spec 8.5.4.2.2): f32 matmuls are exact here
because every intermediate is < 2^24.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hevc.tables import CHROMA_FILTER, LUMA_FILTER

_F32 = jnp.float32


def _filter_mats(filters: np.ndarray, taps: int, n_in: int, n_out: int,
                 pad_l: int):
    """Per-phase (n_in, n_out) banded filter matrices; phase 0 is the
    integer-pel pick shifted <<6 so one unified >>6 at the end restores
    every fx/fy combination of spec 8.5.4.2.2.1 exactly."""
    nph = filters.shape[0]
    mats = np.zeros((nph, n_in, n_out), np.float32)
    for p in range(nph):
        if p == 0:
            for j in range(n_out):
                mats[p, j + pad_l, j] = 64.0
        else:
            for j in range(n_out):
                for t in range(taps):
                    mats[p, j + t, j] = float(filters[p][t])
    # numpy, not jnp: these are cached module-level constants that get
    # embedded into jaxprs — a device array created inside a trace would
    # leak its tracer through the cache
    return mats


_LUMA_H = _filter_mats(np.asarray(LUMA_FILTER), 8, 15, 8, 3)
_CHROMA_H = _filter_mats(np.asarray(CHROMA_FILTER), 4, 7, 4, 1)

_MAT_CACHE: dict = {}


def luma_mats(t: int):
    """(nph, t+7, t) luma filter matrices for block size t."""
    m = _MAT_CACHE.get(("l", t))
    if m is None:
        m = _filter_mats(np.asarray(LUMA_FILTER), 8, t + 7, t, 3)
        _MAT_CACHE[("l", t)] = m
    return m


def chroma_mats(t: int):
    """(nph, t+3, t) chroma filter matrices for block size t."""
    m = _MAT_CACHE.get(("c", t))
    if m is None:
        m = _filter_mats(np.asarray(CHROMA_FILTER), 4, t + 3, t, 1)
        _MAT_CACHE[("c", t)] = m
    return m


def _interp_cells(ref_stack, slot, mvx, mvy, t: int, base_r, base_c,
                  mats, frac_bits: int, pic_w: int, pic_h: int):
    """One list's 14-bit prediction for K cells of t x t pixels.

    ref_stack (R, ph, pw) int32; slot (K,) ref index (pre-clipped >= 0);
    mv in sub-pel units (frac_bits low bits = phase). Edge clamping uses
    the CODED picture dims (pic_w/pic_h), matching decode/inter.py's
    _gather_patch — the plane pad beyond them must never be read.
    Returns (K, t, t) int32 14-bit predictions."""
    n_in = mats.shape[1]
    pad_l = 3 if frac_bits == 2 else 1      # 8-tap luma vs 4-tap chroma
    iy = base_r + (mvy >> frac_bits) - pad_l
    ix = base_c + (mvx >> frac_bits) - pad_l
    fy = mvy & ((1 << frac_bits) - 1)
    fx = mvx & ((1 << frac_bits) - 1)
    # Patch extraction as batched dynamic_slice on an edge-replicated
    # margin pad (expandPicture_c analog, done on device — the pad is one
    # cheap HBM copy, CSE'd within a graph). A per-element clamped fancy
    # gather runs ~3x slower through XLA's gather path; slicing a padded
    # plane with the START clamped to [-M, pic-1] reads IDENTICAL values:
    # in-bounds windows are untouched, windows straddling an edge see the
    # replicated edge pixels (= the per-element clamp), and windows fully
    # outside clamp to an all-edge window exactly as coordinate clamping
    # would. NOTE the pad must replicate the PICTURE edge (slice to
    # pic_h/pic_w first) — the CTU-alignment pad rows must never leak in.
    M = n_in + 1
    padded = jnp.pad(ref_stack[:, :pic_h, :pic_w],
                     ((0, 0), (M, M), (M, M)), mode="edge")
    Hp2, Wp2 = pic_h + 2 * M, pic_w + 2 * M
    rf = padded.reshape(ref_stack.shape[0] * Hp2, Wp2)
    y0 = jnp.clip(iy, -M, pic_h - 1) + M
    x0 = jnp.clip(ix, -M, pic_w - 1) + M

    def _one(s, y, x):
        return jax.lax.dynamic_slice(rf, (s * Hp2 + y, x), (n_in, n_in))

    patch = jax.vmap(_one)(slot, y0, x0)
    nph = mats.shape[0]
    K = patch.shape[0]
    # Phase-expanded separable filtering. A per-cell filter matrix (one
    # per block, selected by phase) makes every stage a BATCHED matmul of
    # tiny (n_in x t) operands — thousands of 15x15x8 MXU ops, the
    # dominant cost of the whole inter decide (measured ~10 ms per call
    # at K=3600 vs ~0.1 ms for the gathers). Instead compute ALL nph
    # phase outputs with one large 2-D matmul (8x the FLOPs, but FLOPs
    # are free here) and select the phase with a broadcast one-hot sum on
    # the VPU. Exactness at DEFAULT (bf16) matmul precision: patch is
    # 8-bit, taps <= 64, f32 accumulation over n_in <= 15 stays < 2^24;
    # stage-2 operands are 15-bit so they go through an 8-bit limb split
    # (hi <= 88, lo in [0, 255]).
    mats_f = jnp.asarray(mats).transpose(1, 0, 2) \
        .reshape(n_in, nph * t)                           # (n_in, nph*t)
    oh_x = jax.nn.one_hot(fx, nph, dtype=_F32)            # (K, nph)
    oh_y = jax.nn.one_hot(fy, nph, dtype=_F32)
    h_all = (patch.astype(_F32).reshape(K * n_in, n_in) @ mats_f) \
        .reshape(K, n_in, nph, t)                         # (K, i, p, m)
    hcols = (h_all * oh_x[:, None, :, None]).sum(axis=2)  # (K, n_in, t)
    hc_hi = jnp.floor(hcols * (1.0 / 256.0))
    hc_lo = hcols - 256.0 * hc_hi
    hc = jnp.concatenate([hc_hi, hc_lo], axis=0)          # (2K, n_in, t)
    v_all = (hc.transpose(0, 2, 1).reshape(2 * K * t, n_in) @ mats_f) \
        .reshape(2, K, t, nph, t)                         # (2, K, m, p, n)
    v_all = v_all[0] * 256.0 + v_all[1]                   # exact: < 2^24
    v = (v_all * oh_y[:, None, :, None]).sum(axis=2)      # (K, m, n)
    v = v.transpose(0, 2, 1)                              # (K, n, m)
    return v.astype(jnp.int32) >> 6


def _combine(p0, p1, use0, use1, w0=None, w1=None):
    """Spec 8.5.4.2.5.2/.3 sample combine on 14-bit preds -> 8-bit.
    w = (wgt, off, log2wd) per-cell arrays or None for default."""
    both = use0 & use1

    def uni(p, w):
        if w is None:
            return (p + 32) >> 6
        wg, off, lwd = w
        return jnp.where(lwd >= 1,
                         ((p * wg + (jnp.int32(1)
                                     << jnp.maximum(lwd - 1, 0))) >> lwd)
                         + off,
                         p * wg + off)

    if w0 is None and w1 is None:
        bi = (p0 + p1 + 64) >> 7
    else:
        wa, oa, lwd = w0
        wb, ob, _ = w1
        bi = (p0 * wa + p1 * wb + ((oa + ob + 1) << lwd)) >> (lwd + 1)
    out = jnp.where(both, bi, jnp.where(use0, uni(p0, w0), uni(p1, w1)))
    return jnp.clip(out, 0, 255)


def _cell_w(wts, slot, use, comp):
    """Per-cell (wgt, off, log2wd) triples gathered from the slot weight
    table; identity where the slot has no weight flag."""
    if wts is None:
        return None
    flag, wgt, off, lwd = wts
    s = jnp.clip(slot, 0)
    f = flag[s, comp] & use
    w = jnp.where(f, wgt[s, comp], 64)
    o = jnp.where(f, off[s, comp], 0)
    return (w[:, None, None], o[:, None, None],
            jnp.broadcast_to(lwd[comp], s.shape)[:, None, None])


def _mc_core(refs_y, refs_cb, refs_cr, slot0, mv0, slot1, mv1,
             wts0, wts1, has_l1: bool, h8: int, w8: int,
             pic_w: int, pic_h: int):
    """Full-frame prediction planes from per-8x8-cell motion.

    refs_* (R, ph, pw)/(R, ph/2, pw/2) int32 stacks; slot* (h8*w8,) int32
    (-1 = list unused for the cell); mv* (h8*w8, 2) quarter-pel luma [x,y].
    wts*: optional (flag (R,3) bool, wgt (R,3) i32, off (R,3) i32,
    log2wd (3,) i32) explicit-WP tables per list.
    Returns (pred_y, pred_cb, pred_cr) uint8 planes (CTB-padded size)."""
    from .wavefront import _untile
    K = slot0.shape[0]
    r = jnp.arange(K, dtype=jnp.int32) // w8
    c = jnp.arange(K, dtype=jnp.int32) % w8
    use0 = (slot0 >= 0)[:, None, None]
    s0 = jnp.clip(slot0, 0)
    if has_l1:
        s1 = jnp.clip(slot1, 0)
        use1 = (slot1 >= 0)[:, None, None]
    outs = []
    for (stack, t, fb, mats, comp) in ((refs_y, 8, 2, _LUMA_H, 0),
                                       (refs_cb, 4, 3, _CHROMA_H, 1),
                                       (refs_cr, 4, 3, _CHROMA_H, 2)):
        if comp == 0:
            base_r, base_c, cw, chh = r * 8, c * 8, pic_w, pic_h
        else:
            base_r, base_c = r * 4, c * 4
            cw, chh = pic_w // 2, pic_h // 2
        p0 = _interp_cells(stack, s0, mv0[:, 0], mv0[:, 1], t,
                           base_r, base_c, mats, fb, cw, chh)
        w0 = _cell_w(wts0, slot0, slot0 >= 0, comp)
        if has_l1:
            p1 = _interp_cells(stack, s1, mv1[:, 0], mv1[:, 1], t,
                               base_r, base_c, mats, fb, cw, chh)
            w1 = _cell_w(wts1, slot1, slot1 >= 0, comp)
            blk = _combine(p0, p1, use0, use1, w0, w1)
        else:
            blk = _combine(p0, p0, use0, jnp.zeros_like(use0), w0, w0)
        pph = stack.shape[1]
        outs.append(_untile(blk.astype(jnp.uint8), pph // t,
                            stack.shape[2] // t))
    return tuple(outs)


@partial(jax.jit,
         static_argnames=("has_l1", "h8", "w8", "pic_w", "pic_h"))
def mc_planes_jit(refs_y, refs_cb, refs_cr, slot0, mv0, slot1, mv1,
                  wts0, wts1, has_l1: bool, h8: int, w8: int,
                  pic_w: int, pic_h: int):
    return _mc_core(refs_y, refs_cb, refs_cr, slot0, mv0, slot1, mv1,
                    wts0, wts1, has_l1, h8, w8, pic_w, pic_h)


def mc_planes(refs_y, refs_cb, refs_cr, slot0, mv0, slot1=None, mv1=None,
              wts0=None, wts1=None, pic_w=None, pic_h=None):
    """Numpy-convenience wrapper: stacks are (R, ph, pw) etc.; slots/mvs
    are (h8, w8)/(h8, w8, 2) grids, mv = [x, y] quarter-pel luma.
    Returns numpy uint8 planes (padded plane size)."""
    h8, w8 = slot0.shape
    has_l1 = slot1 is not None
    if not has_l1:
        slot1 = np.full_like(slot0, -1)
        mv1 = np.zeros_like(mv0)
    if pic_w is None:
        pic_w, pic_h = refs_y.shape[2], refs_y.shape[1]

    def to_w(w):
        return None if w is None else tuple(jnp.asarray(a) for a in w)

    out = mc_planes_jit(
        jnp.asarray(np.asarray(refs_y, np.int32)),
        jnp.asarray(np.asarray(refs_cb, np.int32)),
        jnp.asarray(np.asarray(refs_cr, np.int32)),
        jnp.asarray(slot0.reshape(-1).astype(np.int32)),
        jnp.asarray(mv0.reshape(-1, 2).astype(np.int32)),
        jnp.asarray(slot1.reshape(-1).astype(np.int32)),
        jnp.asarray(mv1.reshape(-1, 2).astype(np.int32)),
        to_w(wts0), to_w(wts1), has_l1, h8, w8, int(pic_w), int(pic_h))
    return tuple(np.asarray(o) for o in out)
