"""Batched intra prediction: ALL 35 HEVC modes for a batch of blocks in one
jitted op — two static gathers + one integer lerp.

TPU-native redesign of the reference's 35 mode-specialized scalar/SIMD
kernels (IntraPredPlanar_0_c .. IntraPredAngVerPlus_34_c, SURVEY.md 2.2
"Intra prediction"): instead of branching per mode, the angular projection
(spec 8.4.4.2.6) is precomputed as static index/factor tables per
(mode, size) at import time, so the whole RMD/RDO candidate set is

    E[b, m, :] = refs[b, filt[m], EXT_IDX[m, :]]          (gather 1)
    P[b, m, y, x] = ((32-F[m,y,x]) * E[b,m,G[m,y,x]]
                     + F[m,y,x] * E[b,m,G[m,y,x]+1] + 16) >> 5   (gather 2)

which the encoder consumes wholesale (argmin over modes) and property-tests
against decode/recon.py's scalar oracle.

refs layout per block: [left[0..2n-1] (top->bottom) | corner | top[0..2n-1]]
(length 4n+1), one unfiltered + one filtered copy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hevc.tables import intra_inv_angle, intra_pred_angle

# mode-dependent reference filtering (spec 8.4.4.2.3): filterFlag per size
_FILTER_THRESH = {4: 10, 8: 7, 16: 1, 32: 0}


def use_filtered_refs(mode: int, n: int) -> bool:
    if mode == 1 or n == 4:
        return False
    if mode == 0:
        return n >= 8
    min_dist = min(abs(mode - 26), abs(mode - 10))
    return min_dist > _FILTER_THRESH[n]


def _build_tables(n: int):
    """Static (33, 3n+2) ext-gather index, (33, n, n) pred index + factor."""
    L = 4 * n + 1           # refs vector length
    # refs indices: left[i] = i (top->bottom), corner = 2n, top[i] = 2n+1+i
    def left_i(i):  # i in 0..2n-1, top to bottom
        return i
    corner_i = 2 * n
    def top_i(i):
        return 2 * n + 1 + i

    ext_idx = np.zeros((33, 3 * n + 2), np.int32)
    g = np.zeros((33, n, n), np.int32)
    f = np.zeros((33, n, n), np.int32)
    for mi, mode in enumerate(range(2, 35)):
        ang = intra_pred_angle(mode)
        ver = mode >= 18
        # ext[n + k] layout as in recon.py: ext[n]=corner, ext[n+1+i]=main[i]
        main = top_i if ver else left_i
        side = left_i if ver else top_i
        ext = np.zeros(3 * n + 2, np.int32)
        ext[n] = corner_i
        for i in range(2 * n):
            ext[n + 1 + i] = main(i)
        if ang < 0:
            inv = intra_inv_angle(mode)
            lo = (n * ang) >> 5
            for xx in range(-1, lo - 1, -1):
                ext[n + xx] = side(min(((xx * inv + 128) >> 8) - 1, 2 * n - 1))
        ext_idx[mi] = ext
        dist = np.arange(1, n + 1, dtype=np.int64)
        idx = (dist * ang) >> 5
        fact = (dist * ang) & 31
        pos = n + 1 + idx               # ext index of offset-0 term
        off = np.arange(n)
        if ver:                          # P[y, x] along x
            g[mi] = pos[:, None] + off[None, :]
            f[mi] = np.broadcast_to(fact[:, None], (n, n))
        else:                            # transposed: P[y, x] = pred_t[x, y]
            g[mi] = pos[None, :] + off[:, None]
            f[mi] = np.broadcast_to(fact[None, :], (n, n))
    filt = np.array([1 if use_filtered_refs(m, n) else 0
                     for m in range(2, 35)], np.int32)
    # numpy, not jnp: these are captured by jitted predict fns, and a
    # captured device-array constant poisons the axon tunnel dispatch
    # path process-wide (see ops/transforms.py)
    return ext_idx, g, f, filt


_TABLES = {n: _build_tables(n) for n in (4, 8, 16, 32)}
_PLANAR_FILT = {n: int(use_filtered_refs(0, n)) for n in (4, 8, 16, 32)}


@partial(jax.jit, static_argnames=("n", "is_luma", "bd"))
def predict_all_modes(refs_u: jax.Array, refs_f: jax.Array, n: int,
                      is_luma: bool = True, bd: int = 8) -> jax.Array:
    """All 35 intra predictions for a batch.

    refs_u/refs_f: (N, 4n+1) unfiltered / filtered reference vectors.
    Returns (N, 35, n, n) int32. Chroma passes refs_f = refs_u.
    """
    ext_idx, g, f, filt = _TABLES[n]
    both = jnp.stack([refs_u, refs_f], axis=1)        # (N, 2, L)
    # gather 1: per-mode ext arrays from the mode's chosen ref set
    sel = filt if is_luma else np.zeros_like(filt)
    e = both[:, sel[:, None], ext_idx]                # (N, 33, 3n+2)
    # gather 2: angular lerp
    m_ix = jnp.arange(33)[:, None, None]
    p1 = e[:, m_ix, g]
    p2 = e[:, m_ix, g + 1]
    ang = ((32 - f) * p1 + f * p2 + 16) >> 5          # (N, 33, n, n)

    maxv = (1 << bd) - 1
    pl_refs = refs_f if (is_luma and _PLANAR_FILT[n]) else refs_u
    left = pl_refs[:, :2 * n]
    top = pl_refs[:, 2 * n + 1:]
    # planar (spec 8.4.4.2.4)
    x = jnp.arange(n, dtype=jnp.int32)
    tr = top[:, n][:, None, None]
    bl = left[:, n][:, None, None]
    planar = ((n - 1 - x)[None, None, :] * left[:, :n, None]
              + (x + 1)[None, None, :] * tr
              + (n - 1 - x)[None, :, None] * top[:, None, :n]
              + (x + 1)[None, :, None] * bl + n) >> (n.bit_length())
    # DC (spec 8.4.4.2.5) — always unfiltered refs
    lu = refs_u[:, :2 * n]
    tu = refs_u[:, 2 * n + 1:]
    cu = refs_u[:, 2 * n]
    dc = (jnp.sum(lu[:, :n], axis=1) + jnp.sum(tu[:, :n], axis=1)
          + n) >> (n.bit_length())
    dcp = jnp.broadcast_to(dc[:, None, None], (refs_u.shape[0], n, n))
    if is_luma and n < 32:
        row0 = (tu[:, :n] + 3 * dc[:, None] + 2) >> 2
        col0 = (lu[:, :n] + 3 * dc[:, None] + 2) >> 2
        c00 = (lu[:, 0] + 2 * dc + tu[:, 0] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(row0)
        dcp = dcp.at[:, 1:, 0].set(col0[:, 1:])
        dcp = dcp.at[:, 0, 0].set(c00)
        # pure-vertical/horizontal edge compensation (spec 8.4.4.2.6)
        v26 = jnp.clip(tu[:, 0][:, None] + ((lu[:, :n] - cu[:, None]) >> 1),
                       0, maxv)
        h10 = jnp.clip(lu[:, 0][:, None] + ((tu[:, :n] - cu[:, None]) >> 1),
                       0, maxv)
        ang = ang.at[:, 26 - 2, :, 0].set(v26)
        ang = ang.at[:, 10 - 2, 0, :].set(h10)
    return jnp.concatenate(
        [planar[:, None].astype(jnp.int32), dcp[:, None].astype(jnp.int32),
         ang.astype(jnp.int32)], axis=1)


def build_refs_np(plane: np.ndarray, x0: int, y0: int, n: int,
                  avail_fn, pic_w: int, pic_h: int,
                  strong: bool, bd: int = 8, is_luma: bool = True):
    """Host-side reference construction + substitution (spec 8.4.4.2.2) and
    filtering (8.4.4.2.3) for one block. Returns (refs_u, refs_f) (4n+1,).

    avail_fn(x, y) -> bool: sample availability in plane-local coords.
    """
    n2 = 2 * n
    vals = np.zeros(2 * n2 + 1, np.int64)
    ok = np.zeros(2 * n2 + 1, bool)

    def avail(x, y):
        if x < 0 or y < 0 or x >= pic_w or y >= pic_h:
            return False
        return bool(avail_fn(x, y))

    for i in range(n2):          # bottom-left upward
        yy = y0 + n2 - 1 - i
        if avail(x0 - 1, yy):
            vals[i] = plane[yy, x0 - 1]
            ok[i] = True
    if avail(x0 - 1, y0 - 1):
        vals[n2] = plane[y0 - 1, x0 - 1]
        ok[n2] = True
    for i in range(n2):
        xx = x0 + i
        if avail(xx, y0 - 1):
            vals[n2 + 1 + i] = plane[y0 - 1, xx]
            ok[n2 + 1 + i] = True
    if not ok.any():
        vals[:] = 1 << (bd - 1)
    else:
        if not ok[0]:
            vals[0] = vals[np.argmax(ok)]
            ok[0] = True
        for i in range(1, 2 * n2 + 1):
            if not ok[i]:
                vals[i] = vals[i - 1]
    left = vals[:n2][::-1]       # top -> bottom
    corner = vals[n2]
    top = vals[n2 + 1:]
    refs_u = np.concatenate([left, [corner], top]).astype(np.int32)
    if not is_luma:
        return refs_u, refs_u
    # 3-tap [1 2 1] smoothing over bottom-left..top-right, or strong bilinear
    if (strong and n == 32 and
            abs(int(corner) + int(top[n2 - 1]) - 2 * int(top[n - 1])) < (1 << (bd - 5)) and
            abs(int(corner) + int(left[n2 - 1]) - 2 * int(left[n - 1])) < (1 << (bd - 5))):
        idx = np.arange(1, n2 + 1, dtype=np.int64)
        ft = ((64 - idx) * corner + idx * int(top[n2 - 1]) + 32) >> 6
        fl = ((64 - idx) * corner + idx * int(left[n2 - 1]) + 32) >> 6
        ft[n2 - 1] = top[n2 - 1]
        fl[n2 - 1] = left[n2 - 1]
        refs_f = np.concatenate([fl, [corner], ft]).astype(np.int32)
        return refs_u, refs_f
    ext = vals                  # bottom-left..corner..top-right
    sm = ext.copy()
    sm[1:-1] = (ext[:-2] + 2 * ext[1:-1] + ext[2:] + 2) >> 2
    fl = sm[:n2][::-1]
    fc = sm[n2]
    ft = sm[n2 + 1:]
    refs_f = np.concatenate([fl, [fc], ft]).astype(np.int32)
    return refs_u, refs_f
