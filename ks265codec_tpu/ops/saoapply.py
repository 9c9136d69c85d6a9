"""Device SAO application (spec 8.7.3): per-CTB params broadcast to pixel
maps, both offset types evaluated in a few full-plane ops — the jnp twin
of decode/filters.sao_frame's vectorized form (bit-exact: integer ops
only), so the batched encode path can keep the reconstruction ON DEVICE
(the recon fetch dominated the D2H budget through the device tunnel).
Reference equivalent: qy265SaoApplyOffset* (SURVEY.md 2.2)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EO_OFFS = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (-1, 1, 1, -1))


def _apply_plane(plane, t_g, off_g, bpos_g, eoc_g, csz: int, w: int,
                 h: int):
    """plane uint8 (ph, pw); params (ncty, nctx[, 4])."""
    src = plane[:h, :w].astype(jnp.int32)

    def rep(a):
        return jnp.repeat(jnp.repeat(a, csz, 0), csz, 1)[:h, :w]

    t_px = rep(t_g.astype(jnp.int32))
    offs_px = [rep(off_g[:, :, k].astype(jnp.int32)) for k in range(4)]
    band = src >> 3
    bidx = (band - rep(bpos_g.astype(jnp.int32))) & 31
    bo = jnp.zeros_like(src)
    for k in range(4):
        bo = jnp.where(bidx == k, offs_px[k], bo)
    out_bo = jnp.clip(src + bo, 0, 255)
    pad = jnp.pad(src, 1, mode="edge")
    eoc_px = rep(eoc_g.astype(jnp.int32))
    sgn_a = jnp.zeros_like(src)
    sgn_b = jnp.zeros_like(src)
    valid = jnp.zeros(src.shape, bool)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    for cls, (ay, ax, by2, bx2) in enumerate(_EO_OFFS):
        m = eoc_px == cls
        a = pad[1 + ay:1 + ay + h, 1 + ax:1 + ax + w]
        b = pad[1 + by2:1 + by2 + h, 1 + bx2:1 + bx2 + w]
        sgn_a = jnp.where(m, jnp.sign(src - a), sgn_a)
        sgn_b = jnp.where(m, jnp.sign(src - b), sgn_b)
        v = ((ys + ay >= 0) & (ys + ay < h) & (ys + by2 >= 0)
             & (ys + by2 < h) & (xs + ax >= 0) & (xs + ax < w)
             & (xs + bx2 >= 0) & (xs + bx2 < w))
        valid = jnp.where(m, v, valid)
    edge_idx = 2 + sgn_a + sgn_b
    eo = jnp.zeros_like(src)
    for ei, k in ((0, 0), (1, 1), (3, 2), (4, 3)):
        eo = jnp.where(edge_idx == ei, offs_px[k], eo)
    out_eo = jnp.where(valid, jnp.clip(src + eo, 0, 255), src)
    out = jnp.where(t_px == 0, src,
                    jnp.where(t_px == 1, out_bo, out_eo))
    return plane.at[:h, :w].set(out.astype(plane.dtype))


def sao_apply_core(y, cb, cr, type_, offs, bpos, eocl,
                   sao_luma: bool, sao_chroma: bool,
                   w: int, h: int, cs: int):
    """One frame: params (3, ncty, nctx[,4]) int8. Returns planes."""
    if sao_luma:
        y = _apply_plane(y, type_[0], offs[0], bpos[0], eocl[0], cs, w, h)
    if sao_chroma:
        cb = _apply_plane(cb, type_[1], offs[1], bpos[1], eocl[1],
                          cs // 2, w // 2, h // 2)
        cr = _apply_plane(cr, type_[2], offs[2], bpos[2], eocl[2],
                          cs // 2, w // 2, h // 2)
    return y, cb, cr


@partial(jax.jit, static_argnames=("sao_luma", "sao_chroma", "w", "h",
                                   "cs"))
def sao_apply_batch(y, cb, cr, type_, offs, bpos, eocl,
                    sao_luma: bool, sao_chroma: bool,
                    w: int, h: int, cs: int):
    """Batched over frames: planes (F, ...), params (F, 3, ...).
    lax.map (sequential per frame), NOT vmap: the full-plane where-chains
    would otherwise materialize per-frame temps for the whole batch at
    once (21 GB HLO temp at 16x720p) for an op that is memory-bound
    anyway."""
    return jax.lax.map(
        lambda args: sao_apply_core(*args, sao_luma, sao_chroma, w, h, cs),
        (y, cb, cr, type_, offs, bpos, eocl))
