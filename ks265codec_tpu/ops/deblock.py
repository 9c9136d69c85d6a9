"""Device-side deblocking filter: whole-frame dense edge passes.

TPU-native replacement for the reference's per-CTU deblockCtu loop and for
the host-vectorized oracle in decode/filters.py (ComDeblockFilter,
SURVEY.md 2.2): HEVC deblocking is data-parallel by construction — all
vertical 8x8-grid edges are sample-independent, then all horizontal edges.
Instead of gathering variable edge lists (dynamic shapes), every INTERNAL
edge position is processed densely via a shifted reshape: plane columns
[4, W-4) tile exactly into 8-wide windows centered on each vertical edge,
so the whole pass is reshape -> elementwise filter -> reshape, the ideal
VPU shape. Edges with bs == 0 keep their samples (masked).

Bit-exact vs decode/filters.deblock_frame (A/B tested by
tests/test_device_filters.py). The bs maps arrive precomputed (for intra
frames bs = 2 on every TU/CU edge, derivable from the CU size map before
the wavefront pass runs; inter frames use decode/filters.compute_bs)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hevc.tables import BETA_TABLE, TC_TABLE, chroma_qp

_BETA = tuple(BETA_TABLE)
_TC = tuple(TC_TABLE)
_CHROMA_QP = tuple(chroma_qp(i) for i in range(80))


def _clip3(lo, hi, v):
    return jnp.clip(v, lo, hi)


def _luma_pass(y, bs_e, qp_p, qp_q, boff: int, toff: int):
    """One direction of the luma filter in the vertical layout: y (H, W)
    int32, internal vertical edges at x = 8k, k = 1..W/8-1.

    bs_e / qp_p / qp_q: (h4, nE) per-edge-segment values (segment = 4
    consecutive rows at one edge column); bs_e is pre-masked to 0 outside
    the real picture. Returns the filtered plane."""
    H, W = y.shape
    nE = W // 8 - 1
    h4 = H // 4
    beta_t = jnp.asarray(np.asarray(_BETA, np.int32))
    tc_t = jnp.asarray(np.asarray(_TC, np.int32))
    qpl = (qp_p + qp_q + 1) >> 1
    beta = beta_t[jnp.clip(qpl + (boff << 1), 0, 51)]
    tc = tc_t[jnp.clip(qpl + 2 * (bs_e - 1) + (toff << 1), 0, 53)]
    seg = y[:, 4:W - 4].reshape(h4, 4, nE, 8).transpose(0, 2, 1, 3)
    p = seg[:, :, :, 3::-1]                      # (h4, nE, 4, p0..p3)
    q = seg[:, :, :, 4:8]
    dp = jnp.abs(p[..., 2] - 2 * p[..., 1] + p[..., 0])   # (h4, nE, 4)
    dq = jnp.abs(q[..., 2] - 2 * q[..., 1] + q[..., 0])
    d = dp[..., 0] + dq[..., 0] + dp[..., 3] + dq[..., 3]
    filt = d < beta

    def dsam(i):
        return ((2 * (dp[..., i] + dq[..., i]) < (beta >> 2))
                & (jnp.abs(p[..., i, 3] - p[..., i, 0])
                   + jnp.abs(q[..., i, 0] - q[..., i, 3]) < (beta >> 3))
                & (jnp.abs(p[..., i, 0] - q[..., i, 0])
                   < ((5 * tc + 1) >> 1)))

    strong = dsam(0) & dsam(3)
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    t2 = (2 * tc)[..., None]
    sp0 = _clip3(p0 - t2, p0 + t2,
                 (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = _clip3(p1 - t2, p1 + t2, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = _clip3(p2 - t2, p2 + t2,
                 (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = _clip3(q0 - t2, q0 + t2,
                 (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
    sq1 = _clip3(q1 - t2, q1 + t2, (q2 + q1 + q0 + p0 + 2) >> 2)
    sq2 = _clip3(q2 - t2, q2 + t2,
                 (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)
    tcv = tc[..., None]
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    apply = jnp.abs(delta) < tcv * 10
    delta = _clip3(-tcv, tcv, delta)
    wp0 = jnp.where(apply, jnp.clip(p0 + delta, 0, 255), p0)
    wq0 = jnp.where(apply, jnp.clip(q0 - delta, 0, 255), q0)
    tc2 = (tc >> 1)[..., None]
    dep1 = ((dp[..., 0] + dp[..., 3])
            < ((beta + (beta >> 1)) >> 3))[..., None]
    deq1 = ((dq[..., 0] + dq[..., 3])
            < ((beta + (beta >> 1)) >> 3))[..., None]
    dp1 = _clip3(-tc2, tc2, (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1)
    wp1 = jnp.where(dep1 & apply, jnp.clip(p1 + dp1, 0, 255), p1)
    dq1 = _clip3(-tc2, tc2, (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1)
    wq1 = jnp.where(deq1 & apply, jnp.clip(q1 + dq1, 0, 255), q1)
    sm = strong[..., None]
    changed = ((bs_e > 0) & filt & (strong | (tc > 0)))[..., None]
    np0 = jnp.where(changed, jnp.where(sm, sp0, wp0), p0)
    np1 = jnp.where(changed, jnp.where(sm, sp1, wp1), p1)
    np2 = jnp.where(changed, jnp.where(sm, sp2, p2), p2)
    nq0 = jnp.where(changed, jnp.where(sm, sq0, wq0), q0)
    nq1 = jnp.where(changed, jnp.where(sm, sq1, wq1), q1)
    nq2 = jnp.where(changed, jnp.where(sm, sq2, q2), q2)
    new_seg = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)
    out = new_seg.transpose(0, 2, 1, 3).reshape(H, W - 8)
    return y.at[:, 4:W - 4].set(out)


def _chroma_pass(c, on, tc):
    """Chroma filter in the vertical layout: c (Hc, Wc) int32, internal
    edges at xc = 8k (16-luma grid). on: (h4, nEc) bool (bs == 2 at an
    in-picture edge); tc (h4, nEc) per-segment tc (one per 2 chroma rows
    = 4 luma rows)."""
    Hc, Wc = c.shape
    nEc = Wc // 8 - 1
    h2 = Hc // 2
    # window [p1 p0 | q0 q1] = columns xc-2 .. xc+1
    seg = c[:, 6:Wc - 2].reshape(h2, 2, nEc, 8)[..., :4] \
        .transpose(0, 2, 1, 3)                       # (h2, nEc, 2, 4)
    p1, p0, q0, q1 = (seg[..., 0], seg[..., 1], seg[..., 2], seg[..., 3])
    tcv = tc[..., None]
    delta = _clip3(-tcv, tcv, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
    onv = ((tc > 0) & on)[..., None]
    np0 = jnp.where(onv, jnp.clip(p0 + delta, 0, 255), p0)
    nq0 = jnp.where(onv, jnp.clip(q0 - delta, 0, 255), q0)
    new_seg = jnp.stack([p1, np0, nq0, q1], axis=-1) \
        .transpose(0, 2, 1, 3)                       # (h2, 2, nEc, 4)
    full = c[:, 6:Wc - 2].reshape(h2, 2, nEc, 8)
    full = full.at[:, :, :, :4].set(new_seg)
    return c.at[:, 6:Wc - 2].set(full.reshape(Hc, Wc - 8))


def deblock_planes(y, cb, cr, bs_v, bs_h, qp4, boff: int, toff: int,
                   cb_qp_offset: int, cr_qp_offset: int,
                   width: int, height: int):
    """Full-frame deblock of int32 planes on device. bs_v/bs_h: (h4, w4)
    int boundary strengths for vertical/horizontal edges; qp4 per-4x4 QP.
    Mirrors decode/filters.deblock_frame pass order: V luma+chroma, then
    H luma+chroma. Returns (y, cb, cr)."""
    cqp_t = jnp.asarray(np.asarray(_CHROMA_QP, np.int32))
    tc_t = jnp.asarray(np.asarray(_TC, np.int32))

    def one_direction(y, cb, cr, bs4, qp4v, w, h):
        h4, w4 = bs4.shape
        nE = w4 // 2 - 1
        cols = 2 * (1 + jnp.arange(nE))
        # mask out-of-picture edges once: segment start row < h (the
        # oracle's y < ph gate) and edge column < w (x < pw gate)
        okay = ((4 * jnp.arange(h4))[:, None] < h) \
            & ((4 * cols)[None, :] < w)
        bs_e = jnp.where(okay, bs4[:, cols].astype(jnp.int32), 0)
        qp_q = qp4v[:, cols].astype(jnp.int32)
        qp_p = qp4v[:, cols - 1].astype(jnp.int32)
        y = _luma_pass(y, bs_e, qp_p, qp_q, boff, toff)
        # chroma: only edges on the 16-luma grid (odd edge number k = 2m)
        ecols = jnp.arange(1, nE, 2)      # edge k=2,4,.. -> index 1,3,..
        on = bs_e[:, ecols] == 2
        qpl = (qp_p[:, ecols] + qp_q[:, ecols] + 1) >> 1
        for plane, qpoff, which in ((cb, cb_qp_offset, 0),
                                    (cr, cr_qp_offset, 1)):
            qpc = cqp_t[jnp.clip(qpl + qpoff, 0, 79)]
            tc = tc_t[jnp.clip(qpc + 2 + (toff << 1), 0, 53)]
            f = _chroma_pass(plane, on, tc)
            if which == 0:
                cb = f
            else:
                cr = f
        return y, cb, cr

    y, cb, cr = one_direction(y, cb, cr, bs_v, qp4, width, height)
    yt, cbt, crt = one_direction(
        y.T, cb.T, cr.T, bs_h.T, qp4.T, height, width)
    return yt.T, cbt.T, crt.T


@partial(jax.jit, static_argnames=("boff", "toff", "cbo", "cro",
                                   "width", "height"))
def deblock_frame_device(y, cb, cr, bs_v, bs_h, qp4, boff: int, toff: int,
                         cbo: int, cro: int, width: int, height: int):
    """Standalone jitted entry (the fused encoder pipeline calls
    deblock_planes inside its own jit)."""
    out = deblock_planes(y.astype(jnp.int32), cb.astype(jnp.int32),
                         cr.astype(jnp.int32), bs_v, bs_h, qp4,
                         boff, toff, cbo, cro, width, height)
    return tuple(o.astype(jnp.uint8) for o in out)


def intra_bs_maps(log2m: np.ndarray):
    """Host helper: boundary-strength maps for an all-intra frame from the
    8-cell CU-size map (every CU/TU edge has intra on both sides -> bs 2;
    the batched intra path codes TU = CU, min CU 8). Returns (bs_v, bs_h)
    (h4, w4) int8 on the 4x4 grid (edges only at 8-multiples)."""
    h8, w8 = log2m.shape
    x8 = np.arange(w8)[None, :]
    y8 = np.arange(h8)[:, None]
    size8 = (1 << log2m.astype(np.int32)) >> 3
    left_edge8 = (x8 & (size8 - 1)) == 0
    top_edge8 = (y8 & (size8 - 1)) == 0
    bs_v = np.zeros((2 * h8, 2 * w8), np.int8)
    bs_h = np.zeros((2 * h8, 2 * w8), np.int8)
    bs_v[:, ::2] = np.repeat(np.where(left_edge8, 2, 0), 2, axis=0)
    bs_h[::2, :] = np.repeat(np.where(top_edge8, 2, 0), 2, axis=1)
    bs_v[:, 0] = 0
    bs_h[0, :] = 0
    return bs_v, bs_h
