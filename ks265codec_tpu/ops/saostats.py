"""Device-side SAO statistics: per-CTU edge-offset and band-offset
count/error sums as ONE jitted pass per plane.

TPU-native replacement for the reference's per-CTU statBoEo01 /
EoTypeDistEstimation host loops (SURVEY.md 2.3 "In-loop filters"): the
per-pixel classification is pure elementwise work over the whole frame
(ideal VPU shape), and the per-CTU reduction is a blocked reshape-sum.
The host keeps only the tiny per-CTU offset search (encode/sao.py
_best_offset), consuming these exact-integer sums — decisions are
bit-identical to the host-only oracle path (A/B tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# EO class -> neighbor offset pair, same order as encode/sao.py _EO_OFFS
_EO_OFFS = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (-1, 1, 1, -1))


def _shift(x, dy: int, dx: int):
    """x[y+dy, x+dx] with edge clamp (out-of-range masked by validity)."""
    H, W = x.shape
    p = jnp.pad(x, 1, mode="edge")
    return p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]


def sao_stats_plane_core(rec, src, w: int, h: int, cs: int,
                         classes: int = 4, bo: bool = True):
    """rec/src (H, W) int32 padded planes; w/h the real picture dims;
    cs the CTU size in this plane's units.

    classes/bo gate the work to what the preset's SAO tier can ever pick
    (superfast: EO classes 0/1, no band offset) — the full stats were
    ~300 KB/frame over the device tunnel and most of the pass's FLOPs.

    Returns (eo_cnt, eo_err, bo_cnt, bo_err):
      eo_cnt/eo_err: (classes, 5 cats, ncty, nctx) int32
      bo_cnt/bo_err: (32 bands, ncty, nctx) int32, or None when not bo
    """
    H, W = rec.shape
    rec = rec.astype(jnp.int32)
    diff = src.astype(jnp.int32) - rec
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inpic = (ys < h) & (xs < w)
    ncty, nctx = H // cs, W // cs

    def seg(v):
        return v.reshape(ncty, cs, nctx, cs).sum(axis=(1, 3),
                                                 dtype=jnp.int32)

    eo_cnt, eo_err = [], []
    for (ay, ax, by, bx) in _EO_OFFS[:classes]:
        a = _shift(rec, ay, ax)
        b = _shift(rec, by, bx)
        valid = (inpic
                 & (ys + ay >= 0) & (ys + ay < h)
                 & (xs + ax >= 0) & (xs + ax < w)
                 & (ys + by >= 0) & (ys + by < h)
                 & (xs + bx >= 0) & (xs + bx < w))
        idx = 2 + jnp.sign(rec - a) + jnp.sign(rec - b)
        cnts, errs = [], []
        for cat in range(5):
            m = (valid & (idx == cat)).astype(jnp.int32)
            cnts.append(seg(m))
            errs.append(seg(m * diff))
        eo_cnt.append(jnp.stack(cnts))
        eo_err.append(jnp.stack(errs))
    if not bo:
        return jnp.stack(eo_cnt), jnp.stack(eo_err), None, None
    band = rec >> 3
    bo_cnt, bo_err = [], []
    for bpos in range(32):
        m = (inpic & (band == bpos)).astype(jnp.int32)
        bo_cnt.append(seg(m))
        bo_err.append(seg(m * diff))
    return (jnp.stack(eo_cnt), jnp.stack(eo_err),
            jnp.stack(bo_cnt), jnp.stack(bo_err))


_sao_stats_plane = jax.jit(sao_stats_plane_core,
                           static_argnames=("w", "h", "cs", "classes",
                                            "bo"))


def sao_frame_stats(fs, src_y, src_cb, src_cr):
    """Run the device stats pass for all three planes -> numpy arrays."""
    sps = fs.sps
    cs = sps.ctb_size
    out = []
    for rec, src, shift in ((fs.y, src_y, 0), (fs.cb, src_cb, 1),
                            (fs.cr, src_cr, 1)):
        r = _sao_stats_plane(jnp.asarray(np.asarray(rec, np.int32)),
                             jnp.asarray(np.asarray(src, np.int32)),
                             sps.width >> shift, sps.height >> shift,
                             cs >> shift)
        out.append(tuple(np.asarray(a) for a in r))
    return out
