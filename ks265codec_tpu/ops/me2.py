"""Fused device motion estimation: the whole multi-reference pyramid
search (3-level integer + quarter-pel refinement + optional bi-direction
decision) as ONE jitted dispatch per frame.

Replaces the staged host-glued pipeline (ops/me.motion_search_frame_hier +
ops/subpel.refine_subpel_frame + bi_pred_cost), whose per-stage host
argmin/median glue cost 5+ device round-trips per reference per frame —
the dominant term of the inter-frame profile on the TPU tunnel. Reference
equivalents: interMe{Hex,UMH,EPZS} + subMe*_RealInterp + interMeBiFull_opt
(SURVEY.md 2.3), restructured as dense tensor ops per 7.3#3.

Levels (8x8 full-res blocks, merange up to 64):
  L2 quarter-res: dense +-(merange/4) SAD over 4x4 blocks (16x16 full),
     offset grid evaluated by a lax.scan of shifted-plane block-SADs
     (no (N, bs^2, grid^2) patch blowup), median-predictor re-rank.
  L1 half-res:   +-3 refine around 2x the L2 winner (static 49 slices).
  L0 full-res:   +-3 refine around 2x the L1 winner.
  subpel:        49 quarter-pel candidates via static-phase interpolation
                 (bit-exact MC filters), SATD + mvd-rate vs the median
                 predictor field.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .subpel import MARGIN, _interp_cand

_INT_OFFS = tuple((dx, dy) for dy in range(-3, 4) for dx in range(-3, 4))
_QPEL_OFFS = tuple((dx, dy) for dy in range(-3, 4) for dx in range(-3, 4))


def _down2(p):
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
            + p[1::2, 1::2] + 2) >> 2


def _blocks(plane, bs):
    h, w = plane.shape
    nby, nbx = h // bs, w // bs
    return plane.reshape(nby, bs, nbx, bs).swapaxes(1, 2) \
        .reshape(-1, bs, bs), nby, nbx


def _med3(a):
    """Median of (left, top, top-right) neighbors per grid cell."""
    p = jnp.pad(a, ((1, 1), (1, 1), (0, 0)), mode="edge")
    st = jnp.stack([p[1:-1, :-2], p[:-2, 1:-1], p[:-2, 2:]])
    return jnp.median(st, axis=0).astype(jnp.int32)


def _dense_l2(src_q, ref_q, sr: int, lam: float):
    """Dense +-sr full-search for 4x4 blocks at quarter res via a scan of
    shifted-plane block SADs. Returns (nby, nbx, 2) full-pel MVs."""
    H, W = src_q.shape
    nby, nbx = H // 4, W // 4
    pad = jnp.pad(ref_q, sr, mode="edge")
    n = 2 * sr + 1
    src = src_q.astype(jnp.int32)

    def one(o):
        dy, dx = o // n, o % n
        sh = jax.lax.dynamic_slice(pad, (dy, dx), (H, W))
        d = jnp.abs(src - sh)
        return d.reshape(nby, 4, nbx, 4).sum(axis=(1, 3))

    # chunked scan-of-vmap: a plain scan serializes n^2 (up to 1089 at
    # merange 64) tiny shifted-SAD steps that each underfill the chip —
    # 16 offsets per step keeps the VPU busy without the (n2, H, W)
    # full-materialization a bare vmap would cost
    n2 = n * n
    CH = 16
    npad = (-n2) % CH
    offs_all = jnp.concatenate(
        [jnp.arange(n2), jnp.zeros((npad,), jnp.int32)]) \
        .reshape(-1, CH)

    def step(_, oc):
        return None, jax.vmap(one)(oc)

    _, grid = jax.lax.scan(step, None, offs_all)   # (n2/CH, CH, nby, nbx)
    grid = grid.reshape(-1, nby, nbx)[:n2]
    grid = grid.transpose(1, 2, 0)                          # (nby, nbx, n2)
    best1 = jnp.argmin(grid, axis=2)
    mv1 = jnp.stack([best1 % n - sr, best1 // n - sr], axis=-1)
    # median-predictor re-rank (parallel analog of the EPZS/UMH predictor
    # chain — mirrors ops/me.motion_search_frame round 2)
    pred = jnp.clip(_med3(mv1), -sr, sr)
    offs = jnp.arange(n) - sr
    rx = 2.0 * jnp.log2(1.0 + 4.0 * jnp.abs(
        offs[None, None, :] - pred[:, :, 0:1]))
    ry = 2.0 * jnp.log2(1.0 + 4.0 * jnp.abs(
        offs[None, None, :] - pred[:, :, 1:2]))
    rate = (ry[:, :, :, None] + rx[:, :, None, :]).reshape(nby, nbx, n * n)
    cost = grid.astype(jnp.float32) + lam * rate
    best = jnp.argmin(cost, axis=2)
    return jnp.stack([best % n - sr, best // n - sr], axis=-1)


def _win_slices(ref, by0, bx0, win: int, pic_w: int, pic_h: int):
    """(K, win, win) windows at dynamic starts — batched dynamic_slice on
    an edge-replicated margin pad, bit-identical to per-element coordinate
    clamping (see ops/mc._interp_cells) and ~3x faster than the fancy
    gather it replaces."""
    M = win + 1
    padded = jnp.pad(ref[:pic_h, :pic_w], ((M, M), (M, M)), mode="edge")
    y0 = jnp.clip(by0, -M, pic_h - 1) + M
    x0 = jnp.clip(bx0, -M, pic_w - 1) + M

    def _one(y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (win, win))

    return jax.vmap(_one)(y0, x0)


def _refine3(src, ref, bs: int, centers, pic_w: int, pic_h: int):
    """+-3 full-pel refinement around per-block centers (block size bs).
    centers (nby, nbx, 2) full-pel. Returns (mv, sad)."""
    H, W = src.shape
    nby, nbx = H // bs, W // bs
    blocks, _, _ = _blocks(src.astype(jnp.int32), bs)
    cy = jnp.arange(nby)[:, None] * bs
    cx = jnp.arange(nbx)[None, :] * bs
    bx0 = (cx + centers[:, :, 0] - 3).reshape(-1)
    by0 = (cy + centers[:, :, 1] - 3).reshape(-1)
    win = bs + 6
    w = _win_slices(ref, by0, bx0, win, pic_w, pic_h).astype(jnp.int32)
    sads = jnp.stack(
        [jnp.abs(w[:, dy + 3:dy + 3 + bs, dx + 3:dx + 3 + bs]
                 - blocks).sum(axis=(1, 2)) for dx, dy in _INT_OFFS],
        axis=1)                                            # (K, 49)
    best = jnp.argmin(sads, axis=1)
    off = jnp.asarray(np.asarray(_INT_OFFS, np.int32))
    mv = centers.reshape(-1, 2) + off[best]
    sad = jnp.take_along_axis(sads, best[:, None], axis=1)[:, 0]
    return mv.reshape(nby, nbx, 2), sad.reshape(nby, nbx)


def _satd8(a, b):
    from .cost import satd
    return satd(a, b, 8)


def _subpel8(src, ref, mv_full, lam: float, pic_w: int, pic_h: int):
    """Quarter-pel refinement of per-8x8-block integer MVs: 49 static
    phases, SATD + mvd rate vs the median predictor. Returns (mv_q, cost)
    with cost = SATD + rate (the engine's selection metric)."""
    H, W = src.shape
    nby, nbx = H // 8, W // 8
    blocks, _, _ = _blocks(src.astype(jnp.int32), 8)
    cy = jnp.arange(nby)[:, None] * 8
    cx = jnp.arange(nbx)[None, :] * 8
    bx0 = (cx + mv_full[:, :, 0] - MARGIN).reshape(-1)
    by0 = (cy + mv_full[:, :, 1] - MARGIN).reshape(-1)
    win = 8 + 2 * MARGIN
    windows = _win_slices(ref, by0, bx0, win, pic_w,
                          pic_h).astype(jnp.int32)
    pred_q = _med3(mv_full * 4).reshape(-1, 2)
    mvq0 = mv_full.reshape(-1, 2) * 4
    costs = []
    for (qx, qy) in _QPEL_OFFS:
        p14 = _interp_cand(windows, 8, qx, qy)
        pix = jnp.clip((p14 + 32) >> 6, 0, 255)
        c = _satd8(pix, blocks).astype(jnp.float32)
        d = jnp.abs(mvq0 + np.asarray([qx, qy], np.int32) - pred_q)
        c = c + lam * (2.0 + 2.0 * jnp.log2(1.0 + d[:, 0])
                       + 2.0 * jnp.log2(1.0 + d[:, 1]))
        costs.append(c)
    costs = jnp.stack(costs, axis=1)
    best = jnp.argmin(costs, axis=1)
    off = jnp.asarray(np.asarray(_QPEL_OFFS, np.int32))
    mv_q = mvq0 + off[best]
    cost = jnp.take_along_axis(costs, best[:, None], axis=1)[:, 0]
    return mv_q.reshape(nby, nbx, 2), cost.reshape(nby, nbx)


def _bi_cost8(src, ref0, ref1, mv0q, mv1q, pic_w: int, pic_h: int):
    """SATD of the bi prediction for chosen per-8-block (mv0, mv1)."""
    H, W = src.shape
    nby, nbx = H // 8, W // 8
    blocks, _, _ = _blocks(src.astype(jnp.int32), 8)
    cy = (jnp.arange(nby)[:, None] * 8 + jnp.zeros((1, nbx), jnp.int32))
    cx = (jnp.arange(nbx)[None, :] * 8 + jnp.zeros((nby, 1), jnp.int32))
    preds = []
    for ref, mq in ((ref0, mv0q), (ref1, mv1q)):
        mqf = mq.reshape(-1, 2)
        bx0 = (cx.reshape(-1) + (mqf[:, 0] >> 2)) - MARGIN
        by0 = (cy.reshape(-1) + (mqf[:, 1] >> 2)) - MARGIN
        win = 8 + 2 * MARGIN
        w = _win_slices(ref, by0, bx0, win, pic_w,
                        pic_h).astype(jnp.int32)
        ph = jnp.stack([_interp_cand(w, 8, fx, fy)
                        for fy in range(4) for fx in range(4)])  # (16,K,8,8)
        idx = (mqf[:, 1] & 3) * 4 + (mqf[:, 0] & 3)
        sel = jax.nn.one_hot(idx, 16, dtype=jnp.float32)
        p = jnp.einsum("pkij,kp->kij", ph.astype(jnp.float32), sel,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        preds.append(p)
    bi = jnp.clip((preds[0] + preds[1] + 64) >> 7, 0, 255)
    return _satd8(bi, blocks).reshape(nby, nbx)


def _me_fused_core(src_y, refs_y, lam8, sr_q: int, pic_w: int, pic_h: int,
                   bi: bool):
    """Full pyramid + subpel for R references in one traced graph.
    src_y (ph, pw) uint8; refs_y (R, ph, pw) uint8.
    Returns (mv_q (R, nby8, nbx8, 2), cost (R, nby8, nbx8) f32,
             [dir8, sad_merged, bi ok only when bi=True])."""
    src = src_y.astype(jnp.int32)
    src_h = _down2(src)
    src_q = _down2(src_h)

    def one_ref(ref_u8):
        ref = ref_u8.astype(jnp.int32)
        ref_h = _down2(ref)
        ref_q = _down2(ref_h)
        mv2 = _dense_l2(src_q, ref_q, sr_q, lam8)        # per 16 full-res
        nby8 = src.shape[0] // 8
        nbx8 = src.shape[1] // 8
        # quarter blocks cover 16x16 -> replicate to the half grid (4x4
        # half-res blocks = 8x8 full-res)
        cen_h = jnp.repeat(jnp.repeat(mv2 * 2, 2, 0), 2, 1)
        cen_h = cen_h[:src_h.shape[0] // 4, :src_h.shape[1] // 4]
        mv_h, _ = _refine3(src_h, ref_h, 4, cen_h,
                           pic_w // 2, pic_h // 2)
        mv_f, _ = _refine3(src, ref, 8, mv_h * 2, pic_w, pic_h)
        mv_q, cost = _subpel8(src, ref, mv_f, lam8, pic_w, pic_h)
        return mv_q, cost

    mv_q, cost = jax.lax.map(one_ref, refs_y)
    if not bi:
        return mv_q, cost
    sbi = _bi_cost8(src, refs_y[0].astype(jnp.int32),
                    refs_y[1].astype(jnp.int32), mv_q[0], mv_q[1],
                    pic_w, pic_h)
    bi_bias = lam8 * 8.0
    best_uni = jnp.minimum(cost[0], cost[1])
    dir8 = jnp.where(sbi + bi_bias < best_uni, 2,
                     (cost[1] < cost[0]).astype(jnp.int8)).astype(jnp.int8)
    sad8 = jnp.minimum(best_uni, sbi + bi_bias)
    return mv_q, cost, dir8, sad8


me_fused_jit = partial(
    jax.jit, static_argnames=("sr_q", "pic_w", "pic_h", "bi"))(
        _me_fused_core)


def me_fused(src_y, refs_y, merange: int, lam8: float,
             pic_w: int, pic_h: int, bi: bool = False):
    """Host wrapper: one device dispatch for all refs (+ bi decision).
    src_y / refs_y may be numpy planes or already-on-device uint8 arrays
    (refs come from the device DPB). Returns numpy
    (mv_q (R, h8, w8, 2), cost (R, h8, w8)[, dir8, sad8])."""
    sr_q = int(np.clip(max(merange, 16) // 4, 8, 16))
    if isinstance(refs_y, jnp.ndarray):
        stack = refs_y
    else:
        stack = jnp.asarray(np.stack([np.asarray(r, np.uint8)
                                      for r in refs_y]))
    src = src_y if isinstance(src_y, jnp.ndarray) \
        else jnp.asarray(np.asarray(src_y, np.uint8))
    out = me_fused_jit(src, stack, jnp.float32(lam8),
                       sr_q=sr_q, pic_w=pic_w, pic_h=pic_h, bi=bi)
    return tuple(np.asarray(o) for o in out)
