"""Lookahead feature extraction on device (EncPreAnalyze analog).

The reference runs a pre-analysis thread pool over downsampled frames
(CInputPicManage/CPreAnalyzeTaskManager, SURVEY.md 2.3: scenecut, frame
cost, CU-tree, adaptive quant). The TPU-native shape: ONE jitted pass per
pushed frame computing every per-8x8-block feature on the half-resolution
luma — 4-mode intra cost, small-range inter cost vs the previous half-res
frame, and block variance (AQ energy) — plus the 2x2 box downsample
itself. The host keeps only tiny per-frame reductions (scene-cut rule,
AQ offset normalization, RC feed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BS = 8          # feature block size on the half-res plane
_SR = 8          # inter search range (half-res pels)


@jax.jit
def downsample2x(y):
    """(H, W) uint8 -> (H/2, W/2) uint8 2x2 box filter."""
    h, w = y.shape
    a = y.astype(jnp.uint16).reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    return ((a + 2) >> 2).astype(jnp.uint8)


def _block_stats(p):
    """Per-8x8-block (mean-removed SAD energy, variance) of a plane."""
    h, w = p.shape
    b = p.astype(jnp.int32).reshape(h // _BS, _BS, w // _BS, _BS) \
        .transpose(0, 2, 1, 3)
    mean = b.mean(axis=(2, 3), keepdims=True)
    var = ((b - mean) ** 2).mean(axis=(2, 3))
    return var


def _intra_cost(p):
    """4-candidate intra proxy per 8x8 block: DC / horizontal / vertical /
    planar-ish gradient continuation from the block's top/left border
    (causal, like the real 35-mode search but 100x cheaper — the x264
    lookahead uses the same reduction)."""
    h, w = p.shape
    x = p.astype(jnp.int32)
    top = jnp.concatenate([x[:1], x[:-1]], axis=0)     # row above
    left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    nby, nbx = h // _BS, w // _BS

    def blk(a):
        return a.reshape(nby, _BS, nbx, _BS).transpose(0, 2, 1, 3)

    b = blk(x)
    trow = blk(top)[:, :, 0:1, :]                      # top border row
    lcol = blk(left)[:, :, :, 0:1]                     # left border col
    dc = (trow.sum(axis=3, keepdims=True)
          + lcol.sum(axis=2, keepdims=True) + _BS) // (2 * _BS)
    c_dc = jnp.abs(b - dc).sum(axis=(2, 3))
    c_v = jnp.abs(b - trow).sum(axis=(2, 3))
    c_h = jnp.abs(b - lcol).sum(axis=(2, 3))
    pl = (trow + lcol) // 2
    c_p = jnp.abs(b - pl).sum(axis=(2, 3))
    return jnp.minimum(jnp.minimum(c_dc, c_v), jnp.minimum(c_h, c_p))


def _inter_cost(cur, prev):
    """Small full-search inter cost per 8x8 block vs the previous
    half-res frame (dense (2*_SR+1)^2 SAD, min over offsets). Two-level
    XLA window extraction — no data-dependent gathers. Returns
    (cost, dx, dy) per block: the winning offset feeds the CU-tree
    propagation (which prev-frame blocks this block references)."""
    h, w = cur.shape
    nby, nbx = h // _BS, w // _BS
    win = _BS + 2 * _SR
    nsr = 2 * _SR + 1
    pad = jnp.pad(prev.astype(jnp.int32), _SR, mode="edge")
    pw_ = jax.lax.conv_general_dilated_patches(
        pad[None, None].astype(jnp.float32), (win, win), (_BS, _BS),
        "VALID")                                   # (1, win*win, nby, nbx)
    wins = pw_[0].transpose(1, 2, 0).reshape(nby * nbx, 1, win, win)
    patches = jax.lax.conv_general_dilated_patches(
        wins, (_BS, _BS), (1, 1), "VALID")         # (N, 64, 17, 17)
    blocks = cur.astype(jnp.int32).reshape(nby, _BS, nbx, _BS) \
        .transpose(0, 2, 1, 3).reshape(-1, _BS * _BS, 1, 1)
    sad = jnp.sum(jnp.abs(patches.astype(jnp.int32) - blocks), axis=1)
    flat = sad.reshape(sad.shape[0], -1)
    ai = jnp.argmin(flat, axis=1)
    best = jnp.take_along_axis(flat, ai[:, None], axis=1)[:, 0]
    dy = ai // nsr - _SR
    dx = ai % nsr - _SR
    return (best.reshape(nby, nbx), dx.reshape(nby, nbx),
            dy.reshape(nby, nbx))


def _features_core(half_cur, half_prev, want_var: bool = True,
                   want_tree: bool = False):
    """ONE packed f32 vector per frame: [icost_sum, pcost_sum,
    min(icost,pcost)_sum, var map..., icost map, pcost map, dx map,
    dy map] — a single tiny D2H fetch (the tunnel charges ~tens of ms
    per fetch; per-map fetches dominated the lookahead's cost). The
    tail maps are present only with want_tree (CU-tree propagation,
    cuTreePropagate analog)."""
    ic = _intra_cost(half_cur)
    pc, dx, dy = _inter_cost(half_cur, half_prev)
    head = jnp.stack([ic.sum(), pc.sum(),
                      jnp.minimum(ic, pc).sum()]).astype(jnp.float32)
    parts = [head]
    if want_var:
        var = _block_stats(half_cur).astype(jnp.float32)
        parts.append(var.reshape(-1))
    if want_tree:
        parts += [ic.astype(jnp.float32).reshape(-1),
                  pc.astype(jnp.float32).reshape(-1),
                  dx.astype(jnp.float32).reshape(-1),
                  dy.astype(jnp.float32).reshape(-1)]
    return jnp.concatenate(parts) if len(parts) > 1 else head


frame_features = partial(jax.jit, static_argnames=("want_var",
                                                   "want_tree"))(
    _features_core)


@partial(jax.jit, static_argnames=("want_var", "want_tree"))
def frame_features_batch(curs, prevs, want_var: bool = True,
                         want_tree: bool = False):
    """Batched over frames: ONE dispatch + ONE fetch per lookahead
    flush."""
    return jax.vmap(
        lambda c, p: _features_core(c, p, want_var, want_tree))(curs, prevs)


@partial(jax.jit, static_argnames=("want_var", "want_tree"))
def frame_features_first(half_cur, want_var: bool = True,
                         want_tree: bool = False):
    """First frame: no inter reference."""
    ic = _intra_cost(half_cur)
    s = ic.sum().astype(jnp.float32)
    head = jnp.stack([s, s * 0 + jnp.float32(1e18), s])
    parts = [head]
    if want_var:
        var = _block_stats(half_cur).astype(jnp.float32)
        parts.append(var.reshape(-1))
    if want_tree:
        icf = ic.astype(jnp.float32).reshape(-1)
        z = jnp.zeros_like(icf)
        parts += [icf, z + jnp.float32(1e9), z, z]
    return jnp.concatenate(parts) if len(parts) > 1 else head
