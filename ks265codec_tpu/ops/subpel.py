"""Batched sub-pel motion refinement + bi-prediction evaluation.

TPU mapping of the reference's subMeHpel_RealInterp / subMeQpel_RealInterp /
interMeBiFull_opt (SURVEY.md 2.3 "Motion estimation"): every candidate
offset has a STATIC fractional phase, so refinement is a fixed set of
static-phase separable filters applied to a batch of per-block reference
windows — no data-dependent control flow on device.

Interpolation is bit-exact with the decoder MC path (decode/inter.py):
8-tap luma, horizontal then vertical (>>6), uni combine (x+32)>>6.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hevc.tables import LUMA_FILTER

MARGIN = 5               # window margin each side of the integer base


def gather_windows(ref: np.ndarray, base_xy: np.ndarray, bs: int,
                   pic_w: int, pic_h: int) -> np.ndarray:
    """Per-block (bs+2*MARGIN)^2 windows at integer positions base_xy
    (N,2), edge-clamped. ref is the full (padded) plane."""
    n = base_xy.shape[0]
    win = bs + 2 * MARGIN
    ys = np.clip(base_xy[:, 1, None] - MARGIN + np.arange(win)[None, :],
                 0, pic_h - 1)
    xs = np.clip(base_xy[:, 0, None] - MARGIN + np.arange(win)[None, :],
                 0, pic_w - 1)
    return ref[ys[:, :, None], xs[:, None, :]].astype(np.int32)


def _interp_cand(windows, bs: int, qx: int, qy: int):
    """14-bit prediction for quarter-pel offset (qx,qy) relative to the
    window's integer base at index MARGIN. Static phase/slice per call."""
    fx, fy = qx & 3, qy & 3
    ix = MARGIN + (qx >> 2)
    iy = MARGIN + (qy >> 2)
    fh = LUMA_FILTER[fx]
    fv = LUMA_FILTER[fy]
    if fx == 0 and fy == 0:
        return windows[:, iy:iy + bs, ix:ix + bs].astype(jnp.int32) << 6
    if fy == 0:
        acc = jnp.zeros(windows[:, :bs, :bs].shape, jnp.int32)
        for k in range(8):
            c = int(fh[k])
            if c:
                acc = acc + c * windows[:, iy:iy + bs, ix - 3 + k:ix - 3 + k + bs]
        return acc
    if fx == 0:
        acc = jnp.zeros(windows[:, :bs, :bs].shape, jnp.int32)
        for k in range(8):
            c = int(fv[k])
            if c:
                acc = acc + c * windows[:, iy - 3 + k:iy - 3 + k + bs, ix:ix + bs]
        return acc
    # horizontal into rows [iy-3, iy+bs+4), then vertical >> 6
    rows = bs + 7
    tmp = jnp.zeros(windows[:, :rows, :bs].shape, jnp.int32)
    for k in range(8):
        c = int(fh[k])
        if c:
            tmp = tmp + c * windows[:, iy - 3:iy - 3 + rows,
                                    ix - 3 + k:ix - 3 + k + bs]
    acc = jnp.zeros(windows[:, :bs, :bs].shape, jnp.int32)
    for k in range(8):
        c = int(fv[k])
        if c:
            acc = acc + c * tmp[:, k:k + bs, :]
    return acc >> 6


def _satd8_batch(a, b):
    from .cost import satd
    return satd(a, b, 8)


@partial(jax.jit, static_argnames=("bs", "cands"))
def subpel_costs(windows: jax.Array, src: jax.Array, bs: int,
                 cands: tuple) -> jax.Array:
    """SATD cost of each quarter-pel candidate offset. windows (N,W,W),
    src (N,bs,bs). cands: static tuple of (qx,qy). Returns (N, len(cands))."""
    outs = []
    for (qx, qy) in cands:
        pred14 = _interp_cand(windows, bs, qx, qy)
        pix = jnp.clip((pred14 + 32) >> 6, 0, 255)
        outs.append(_satd8_batch(pix, src))
    return jnp.stack(outs, axis=1)


@partial(jax.jit, static_argnames=("bs", "phases"))
def interp14_by_phase(windows: jax.Array, bs: int, phases: tuple):
    """14-bit preds for a static list of (qx,qy); returns (len, N, bs, bs)."""
    return jnp.stack([_interp_cand(windows, bs, qx, qy) for qx, qy in phases])


# full quarter-pel neighborhood (±0.75 pel = the reach of half-then-quarter
# pattern refinement) — one STATIC candidate set, one jit
SUBPEL_CANDS = tuple((dx, dy) for dy in range(-3, 4) for dx in range(-3, 4))


def refine_subpel_frame(src_y: np.ndarray, ref_y: np.ndarray,
                        mv_full: np.ndarray, bs: int,
                        pic_w: int | None = None, pic_h: int | None = None,
                        mv_pred_q: np.ndarray | None = None,
                        lam: float = 0.0):
    """Refine a frame's per-block integer MVs (full-pel, (nby,nbx,2)) to
    quarter-pel. pic_w/pic_h: valid reference area for edge clamping
    (defaults to the plane size). With mv_pred_q (quarter-pel predictor
    field, same shape) and lam, each candidate also pays an mvd-rate term
    — the reference's rate-in-subpel behavior (its half/quarter loops
    carry lambda*mvdBits); without it refined MVs drift off the
    predictors and every CU pays the drift back in mvd bins.
    Returns (mv_q, cost)."""
    h, w = src_y.shape
    pic_w = pic_w or w
    pic_h = pic_h or h
    nby, nbx = h // bs, w // bs
    blocks = (src_y.astype(np.int32)
              .reshape(nby, bs, nbx, bs).swapaxes(1, 2).reshape(-1, bs, bs))
    mvf = mv_full.reshape(-1, 2)
    bx = np.tile(np.arange(nbx) * bs, nby)
    by = np.repeat(np.arange(nby) * bs, nbx)
    base = np.stack([bx + mvf[:, 0], by + mvf[:, 1]], axis=1)
    windows = gather_windows(ref_y.astype(np.int32), base, bs, pic_w, pic_h)
    costs = np.asarray(subpel_costs(jnp.asarray(windows),
                                    jnp.asarray(blocks), bs, SUBPEL_CANDS))
    if mv_pred_q is not None and lam > 0.0:
        cand = np.asarray(SUBPEL_CANDS)                       # [49, 2]
        mvq_all = mvf[:, None, :] * 4 + cand[None]            # [N, 49, 2]
        d = np.abs(mvq_all - mv_pred_q.reshape(-1, 2)[:, None, :])
        bits = (2.0 + 2.0 * np.log2(1.0 + d[..., 0])
                + 2.0 * np.log2(1.0 + d[..., 1]))
        costs = costs + lam * bits
    bi = np.argmin(costs, axis=1)
    best = np.asarray(SUBPEL_CANDS)[bi]
    mv_q = mvf * 4 + best
    return (mv_q.reshape(nby, nbx, 2),
            costs[np.arange(len(bi)), bi].reshape(nby, nbx))


def bi_pred_cost(src_y, ref0, ref1, mv0_q, mv1_q, bs,
                 pic_w=None, pic_h=None):
    """Exact bi prediction cost per block for the chosen (mv0, mv1):
    blocks grouped by phase pair so interpolation stays static."""
    h, w = src_y.shape
    pic_w = pic_w or w
    pic_h = pic_h or h
    nby, nbx = h // bs, w // bs
    blocks = (src_y.astype(np.int32)
              .reshape(nby, bs, nbx, bs).swapaxes(1, 2).reshape(-1, bs, bs))
    n = blocks.shape[0]
    m0 = mv0_q.reshape(-1, 2)
    m1 = mv1_q.reshape(-1, 2)
    bxs = np.tile(np.arange(nbx) * bs, nby)
    bys = np.repeat(np.arange(nby) * bs, nbx)
    preds = np.zeros((2, n, bs, bs), np.int32)
    for li, (ref, mq) in enumerate(((ref0, m0), (ref1, m1))):
        base = np.stack([bxs + (mq[:, 0] >> 2), bys + (mq[:, 1] >> 2)],
                        axis=1)
        win = gather_windows(ref.astype(np.int32), base, bs, pic_w, pic_h)
        phases = mq & 3
        # all 16 phases for all blocks in ONE static jit; select per block
        # (16x compute beats shape-polymorphic recompiles; device is cheap)
        all_phases = tuple((fx, fy) for fy in range(4) for fx in range(4))
        p_all = np.asarray(interp14_by_phase(jnp.asarray(win), bs,
                                             all_phases))
        idx = phases[:, 1] * 4 + phases[:, 0]
        preds[li] = p_all[idx, np.arange(n)]
    bi = np.clip((preds[0] + preds[1] + 64) >> 7, 0, 255)
    from .cost import satd
    cost = np.asarray(satd(jnp.asarray(bi), jnp.asarray(blocks), 8))
    return cost.reshape(nby, nbx)
