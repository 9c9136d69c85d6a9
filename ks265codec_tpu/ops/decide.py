"""Whole-frame intra decision on device: reference construction, 35-mode
prediction, SATD and the split/mode argmin for all three CU sizes in ONE
jitted dispatch over a BATCH of frames.

Replaces the host-side _build_source_refs + per-size dispatch flow: the
only host->device traffic is the uint8 source planes (decisions come back
as tiny maps), which matters when the chip sits behind a narrow transfer
link. Semantics mirror encode/intra_frame.decide_frame exactly (same
source-pixel references, raster-causal availability, [1 2 1] filtering,
SATD + per-size header-bit bias) — A/B tested against it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cost as jcost
from . import intra as jintra

_HDR_BITS = {8: 14.0, 16: 8.0, 32: 6.0}


def _source_refs(plane, n: int):
    """(nby, nbx, 4n+1) int32 refs from source pixels, raster-causal."""
    h, w = plane.shape
    nby, nbx = h // n, w // n
    n2 = 2 * n
    by = jnp.arange(nby)[:, None, None]
    bx = jnp.arange(nbx)[None, :, None]
    i = jnp.arange(n2)[None, None, :]
    # left column top->bottom, clamped at the bottom edge
    ly = jnp.minimum(by * n + i, h - 1)
    lx = jnp.maximum(bx * n - 1, 0)
    ly, lx = jnp.broadcast_arrays(ly, lx)      # (nby, nbx, 2n)
    left = plane[ly, lx]
    # top row, clamped at the right edge
    ty = jnp.maximum(by * n - 1, 0)
    tx = jnp.minimum(bx * n + i, w - 1)
    ty, tx = jnp.broadcast_arrays(ty, tx)      # (nby, nbx, 2n)
    top = plane[ty, tx]
    corner = plane[jnp.maximum(by[..., 0] * n - 1, 0),
                   jnp.maximum(bx[..., 0] * n - 1, 0)]
    has_l = jnp.broadcast_to(jnp.arange(nbx)[None, :] > 0, (nby, nbx))
    has_t = jnp.broadcast_to(jnp.arange(nby)[:, None] > 0, (nby, nbx))
    l0 = left[:, :, :1]
    t0 = top[:, :, :1]
    left = jnp.where(has_l[:, :, None], left, t0)
    top = jnp.where(has_t[:, :, None], top, l0)
    corner = jnp.where(has_l & has_t, corner,
                       jnp.where(has_t, t0[:, :, 0],
                                 jnp.where(has_l, l0[:, :, 0], 0)))
    refs = jnp.concatenate([left, corner[:, :, None], top], axis=2)
    refs = jnp.where((has_l | has_t)[:, :, None], refs, 128)
    return refs.astype(jnp.int32)


def _filter_refs(refs, n: int):
    """[1 2 1] smoothing over the bottom-left..top-right contour."""
    if n == 4:
        return refs
    n2 = 2 * n
    ext = jnp.concatenate([refs[..., :n2][..., ::-1], refs[..., n2:n2 + 1],
                           refs[..., n2 + 1:]], axis=-1)
    sm = ext.at[..., 1:-1].set(
        (ext[..., :-2] + 2 * ext[..., 1:-1] + ext[..., 2:] + 2) >> 2)
    return jnp.concatenate([sm[..., :n2][..., ::-1], sm[..., n2:n2 + 1],
                            sm[..., n2 + 1:]], axis=-1)


def _size_decision(plane, lam_bits, n: int):
    """(mode, cost) maps for one size on one frame plane."""
    h, w = plane.shape
    nby, nbx = h // n, w // n
    refs = _source_refs(plane, n).reshape(-1, 4 * n + 1)
    refs_f = _filter_refs(refs, n)
    blocks = plane.reshape(nby, n, nbx, n).swapaxes(1, 2).reshape(-1, n, n)
    preds = jintra.predict_all_modes(refs, refs_f, n, True)
    costs = jcost.satd(preds, blocks[:, None], 8)
    best = jnp.argmin(costs, axis=1)
    return (best.reshape(nby, nbx).astype(jnp.int32),
            (jnp.min(costs, axis=1) + lam_bits).reshape(nby, nbx))


def _decide_one(plane, lam8, lam16, lam32):
    plane = plane.astype(jnp.int32)
    mode8, cost8 = _size_decision(plane, lam8, 8)
    mode16, cost16 = _size_decision(plane, lam16, 16)
    mode32, cost32 = _size_decision(plane, lam32, 32)
    h8, w8 = cost8.shape
    c8sum = cost8.reshape(h8 // 2, 2, w8 // 2, 2).sum(axis=(1, 3))
    split16 = c8sum < cost16
    best16 = jnp.minimum(c8sum, cost16)
    c16sum = best16.reshape(best16.shape[0] // 2, 2,
                            best16.shape[1] // 2, 2).sum(axis=(1, 3))
    split32 = c16sum < cost32
    cplx = jnp.minimum(c16sum, cost32).sum()
    return split32, mode16, mode32, cplx, split16, mode8


@jax.jit
def decide_frames_jit(planes, lam8, lam16, lam32):
    """Batched over frames: planes (F, ph, pw) uint8; lam* (F,)."""
    return jax.vmap(_decide_one)(planes, lam8, lam16, lam32)


def decide_frames(src_planes: np.ndarray, qps, lam_scale: float = 1.0):
    """Host wrapper. src_planes (F, ph, pw) uint8/int; qps list of ints.
    Returns per-frame tuples like intra_frame.decide_frame."""
    qps = np.asarray(qps, np.float64)
    lam = 0.85 * lam_scale * 2.0 ** ((qps - 12) / 3.0)
    ls = np.sqrt(lam)
    out = decide_frames_jit(
        jnp.asarray(np.asarray(src_planes, np.uint8)),
        jnp.asarray(ls * _HDR_BITS[8]), jnp.asarray(ls * _HDR_BITS[16]),
        jnp.asarray(ls * _HDR_BITS[32]))
    s32, m16, m32, cplx, s16, m8 = (np.asarray(o) for o in out)
    return [(s32[f], m16[f], m32[f], float(cplx[f]), s16[f], m8[f])
            for f in range(len(qps))]
