"""Batched motion estimation: dense integer full-search SAD over a
candidate window for every block of a frame in one jitted op.

TPU-first redesign of the reference's sequential DIA/HEX/UMH search loops
(interMe* — SURVEY.md 2.3 "Motion estimation"): on the MXU/VPU the cheap
move is to evaluate the ENTIRE (2R+1)^2 candidate grid for ALL blocks as a
dense tensor op (trade FLOPs for control flow, SURVEY.md 7.3#3). The
pattern-search presets map to candidate masks over this grid rather than
data-dependent loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def extract_patches(ref: np.ndarray, bs: int, sr: int) -> np.ndarray:
    """Host helper: per-block padded search windows.

    ref: (H, W) int — the (edge-padded to block grid) reference plane.
    Returns (nby*nbx, bs+2sr, bs+2sr) windows centered on each block,
    edge-clamped at picture borders.
    """
    h, w = ref.shape
    pad = np.pad(ref, sr, mode="edge")
    nby, nbx = h // bs, w // bs
    win = bs + 2 * sr
    out = np.empty((nby * nbx, win, win), ref.dtype)
    k = 0
    for by in range(nby):
        for bx in range(nbx):
            y0, x0 = by * bs, bx * bs   # +sr offset cancels with pad
            out[k] = pad[y0:y0 + win, x0:x0 + win]
            k += 1
    return out


@partial(jax.jit, static_argnames=("bs", "sr"))
def full_search(src_blocks: jax.Array, windows: jax.Array, bs: int, sr: int,
                lam4: jax.Array):
    """Dense SAD over all (2sr+1)^2 integer offsets for every block.

    src_blocks: (N, bs, bs); windows: (N, bs+2sr, bs+2sr).
    lam4: scalar rate weight; cost = SAD + lam4 * (|dx|+|dy| bit proxy).
    Returns (mv (N,2) int32 in full-pel (dx, dy), best cost (N,), sad (N,)).
    """
    n_off = 2 * sr + 1
    offs = jnp.arange(n_off)
    # XLA-native sliding-window patch extraction (compiles fast, maps to
    # efficient window ops — the fancy-gather formulation lowers poorly)
    patches = jax.lax.conv_general_dilated_patches(
        windows[:, None].astype(jnp.float32), (bs, bs), (1, 1), "VALID")
    # (N, bs*bs, n_off, n_off)
    src = src_blocks.reshape(src_blocks.shape[0], bs * bs, 1, 1)
    sad = jnp.sum(jnp.abs(patches.astype(jnp.int32) - src), axis=1)
    # (N, n_off(dy), n_off(dx))
    d = jnp.abs(offs - sr)
    rate = (2 * jnp.log2(1.0 + d[:, None]) + 2 * jnp.log2(1.0 + d[None, :]))
    cost = sad + (lam4 * 4 * rate).astype(jnp.int32)   # mvd in quarter-pel
    flat = cost.reshape(cost.shape[0], -1)
    best = jnp.argmin(flat, axis=1)
    by, bx = best // n_off, best % n_off
    mv = jnp.stack([bx - sr, by - sr], axis=1)    # (dx, dy) full-pel
    bsad = jnp.take_along_axis(sad.reshape(sad.shape[0], -1), best[:, None],
                               axis=1)[:, 0]
    bcost = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    return mv.astype(jnp.int32), bcost, bsad


def motion_search_frame(src_y: np.ndarray, ref_y: np.ndarray, bs: int,
                        sr: int, lam: float):
    """Host wrapper: blocks + windows -> per-block integer MVs (quarter-pel
    scaled) and costs. Shapes: planes padded to the block grid.

    Two-round predictor-aware selection (the reference's EPZS/UMH searches
    start from neighbor predictors — SURVEY.md 2.3 interMe): round 1 takes
    the unbiased SAD argmin per block; round 2 re-ranks the full candidate
    grid with the mvd-rate measured against the MEDIAN of the round-1
    neighbor MVs (a parallel analog of the sequential predictor chain).
    A zero-centered bias instead pulls the field toward (0,0) and costs
    ~2 dB of MC quality on mixed-motion content."""
    h, w = src_y.shape
    nby, nbx = h // bs, w // bs
    blocks = (src_y.astype(np.int32)
              .reshape(nby, bs, nbx, bs).swapaxes(1, 2)
              .reshape(-1, bs, bs))
    windows = extract_patches(ref_y.astype(np.int32), bs, sr)
    sad = np.asarray(full_search_grid(
        jnp.asarray(blocks), jnp.asarray(windows), bs, sr))
    n_off = 2 * sr + 1
    flat = sad.reshape(-1, n_off * n_off)
    best1 = np.argmin(flat, axis=1)
    mv1y = (best1 // n_off - sr).reshape(nby, nbx)
    mv1x = (best1 % n_off - sr).reshape(nby, nbx)

    def med3(a):
        p = np.pad(a, 1, mode="edge")
        return np.median(np.stack([p[1:-1, :-2], p[:-2, 1:-1],
                                   p[:-2, 2:]]), axis=0).astype(np.int32)

    px = np.clip(med3(mv1x), -sr, sr).reshape(-1)
    py = np.clip(med3(mv1y), -sr, sr).reshape(-1)
    offs = np.arange(n_off) - sr
    rx = 2.0 * np.log2(1.0 + 4 * np.abs(offs[None, :] - px[:, None]))
    ry = 2.0 * np.log2(1.0 + 4 * np.abs(offs[None, :] - py[:, None]))
    rate = ry[:, :, None] + rx[:, None, :]            # (N, dy, dx)
    cost = sad + (lam * rate).astype(np.int64)
    flatc = cost.reshape(-1, n_off * n_off)
    best = np.argmin(flatc, axis=1)
    mv = np.stack([best % n_off - sr, best // n_off - sr], axis=1) * 4
    bsad = np.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    bcost = np.take_along_axis(flatc, best[:, None], axis=1)[:, 0]
    return (mv.astype(np.int32).reshape(nby, nbx, 2),
            bcost.reshape(nby, nbx), bsad.reshape(nby, nbx))


@partial(jax.jit, static_argnames=("bs", "sr"))
def full_search_grid(src_blocks: jax.Array, windows: jax.Array, bs: int,
                     sr: int):
    """Dense SAD grid over all offsets: (N, 2sr+1, 2sr+1) int32."""
    patches = jax.lax.conv_general_dilated_patches(
        windows[:, None].astype(jnp.float32), (bs, bs), (1, 1), "VALID")
    src = src_blocks.reshape(src_blocks.shape[0], bs * bs, 1, 1)
    return jnp.sum(jnp.abs(patches.astype(jnp.int32) - src), axis=1)


def refine_around(src_y: np.ndarray, ref_y: np.ndarray, bs: int,
                  centers: np.ndarray, rr: int):
    """+-rr full-pel dense refinement around per-block centers.
    centers (nby, nbx, 2) full-pel (dx, dy). The window gather is a host
    vectorized fancy-index; the SAD grid stays on device.
    Returns (mv full-pel (nby, nbx, 2), sad (nby, nbx))."""
    h, w = src_y.shape
    nby, nbx = h // bs, w // bs
    win = bs + 2 * rr
    pad = np.pad(np.asarray(ref_y, np.int32), rr + 1, mode="edge")
    cy = (np.arange(nby) * bs)[:, None] + np.zeros((1, nbx), np.intp)
    cx = (np.arange(nbx) * bs)[None, :] + np.zeros((nby, 1), np.intp)
    oy = np.clip(centers[..., 1], -cy, h - cy - bs)  # windows stay in pad
    ox = np.clip(centers[..., 0], -cx, w - cx - bs)
    y0 = (cy + oy + 1).astype(np.intp)
    x0 = (cx + ox + 1).astype(np.intp)
    wins = pad[y0.reshape(-1)[:, None, None]
               + np.arange(win)[None, :, None],
               x0.reshape(-1)[:, None, None]
               + np.arange(win)[None, None, :]]
    blocks = (src_y.astype(np.int32)
              .reshape(nby, bs, nbx, bs).swapaxes(1, 2)
              .reshape(-1, bs, bs))
    sad = np.asarray(full_search_grid(jnp.asarray(blocks),
                                      jnp.asarray(wins), bs, rr))
    n_off = 2 * rr + 1
    flat = sad.reshape(-1, n_off * n_off)
    best = np.argmin(flat, axis=1)
    dy = best // n_off - rr
    dx = best % n_off - rr
    mv = np.stack([ox.reshape(-1) + dx, oy.reshape(-1) + dy],
                  axis=1).astype(np.int32)
    bsad = np.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    return mv.reshape(nby, nbx, 2), bsad.reshape(nby, nbx)


def _down2(p):
    p = np.asarray(p, np.int32)
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
            + p[1::2, 1::2] + 2) >> 2


def motion_search_frame_hier(src_y: np.ndarray, ref_y: np.ndarray,
                             bs: int, merange: int, lam: float):
    """Wide-range pyramid search (the reference's UMH/EPZS tiers default
    merange 57-64; a dense grid that wide is quadratic): dense full
    search at QUARTER resolution covering ~4x the grid range, then +-3
    refinements at half and full resolution. Returns quarter-pel MVs like
    motion_search_frame."""
    h, w = src_y.shape
    nby, nbx = h // bs, w // bs
    hs, hr = _down2(src_y), _down2(ref_y)
    qs, qr = _down2(hs), _down2(hr)
    sr_q = int(np.clip(merange // 4, 8, 16))
    bq = max(bs // 4, 4)
    mv_q, _, _ = motion_search_frame(qs, qr, bq, sr_q, lam)
    # quarter-level blocks may be coarser than bs/4: replicate to grid
    mv_q = (np.asarray(mv_q) >> 2)                   # full-pel @ quarter
    qby, qbx = mv_q.shape[:2]
    ry = max(1, nby // qby)
    rx = max(1, nbx // qbx)
    cen_h = np.repeat(np.repeat(mv_q * 2, ry, 0), rx, 1)[:nby, :nbx]
    mv_h, _ = refine_around(hs, hr, max(bs // 2, 4), cen_h, 3)
    cen_f = mv_h * 2
    mv_f, sad = refine_around(src_y, ref_y, bs, cen_f, 3)
    return mv_f * 4, sad.astype(np.int64).copy(), sad
