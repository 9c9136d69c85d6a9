"""Device-side SAO mode decision: per-CTU offset search + type choice
from the exact integer stats, inside the same traced graph as the stats
(no host round trip, no ~300 KB/frame stats fetch — only the ~5 KB chosen
parameters travel to the host for syntax).

jnp twin of encode/sao.decide_from_stats_arrays (the reference's
CEncSao::modeDecisionCtu / estIterOffset ladder, SURVEY.md 2.3). Costs are
f32 here (TPU has no f64); ties that the host breaks with 1e-9 epsilons
are broken structurally (first-minimum argmin = smaller EO class, larger
|h| preferred inside a class scan) — any choice is conformant, and the
apply uses the same params the syntax writes, so recon always matches.
"""

from __future__ import annotations

import jax.numpy as jnp

_CATS = (0, 1, 3, 4)
_BOUNDS = ((0.0, 7.0), (0.0, 7.0), (-7.0, 0.0), (-7.0, 0.0))


def _best_offsets(cnt, err, lo: float, hi: float, lam: float):
    """Vectorized estIterOffset: offset in [lo,hi] minimizing
    N*h^2 - 2*h*E + lam*(|h|+1), scanning from the clipped rounded
    optimum toward zero (larger |h| wins ties; the 0-baseline wins its
    ties). cnt/err any shape. Returns (h, cost) f32 arrays."""
    cnt = cnt.astype(jnp.float32)
    err = err.astype(jnp.float32)
    start = jnp.clip(jnp.round(err / jnp.maximum(cnt, 1.0)), lo, hi)
    hs = jnp.arange(-7, 8, dtype=jnp.float32)
    shp = (1,) * cnt.ndim
    hs_b = hs.reshape(hs.shape + shp)
    cost = (cnt[None] * hs_b * hs_b - 2.0 * hs_b * err[None]
            + lam * (jnp.abs(hs_b) + 1.0))
    valid = ((hs_b != 0) & (jnp.abs(hs_b) <= jnp.abs(start[None]))
             & (jnp.sign(hs_b) == jnp.sign(start[None]))
             & (hs_b >= lo) & (hs_b <= hi) & (cnt[None] > 0))
    # larger |h| wins exact ties (scan order). Two-stage argmin — a
    # single "cost*16-|h|" key underflows in f32 (ULP(cost*16) > 7 for
    # large-CTU stats, silently dropping the |h| term): find the minimal
    # cost, then the largest |h| among exactly cost-minimal entries.
    cost_v = jnp.where(valid, cost, jnp.inf)
    cmin = jnp.min(cost_v, axis=0)
    adj = jnp.where(cost_v == cmin[None], -jnp.abs(hs_b), jnp.inf)
    k = jnp.argmin(adj, axis=0)
    h = jnp.take_along_axis(jnp.broadcast_to(hs_b, cost.shape),
                            k[None], axis=0)[0]
    c = jnp.take_along_axis(cost, k[None], axis=0)[0]
    # candidate must STRICTLY beat the do-nothing baseline (cost 0)
    use = (c < 0.0) & jnp.take_along_axis(valid, k[None], axis=0)[0]
    return jnp.where(use, h, 0.0), jnp.where(use, c, 0.0)


def sao_decide_core(stats, qp: int, tier: int):
    """stats: list over planes of (eo_cnt (ncl,5,ncty,nctx),
    eo_err, bo_cnt (32,ncty,nctx)|None, bo_err|None) device arrays.
    Returns (type_, offs, bpos, eocl) int8 device arrays shaped
    (3, ncty, nctx[, 4])."""
    lam = float(0.85 * 2.0 ** ((qp - 12) / 3.0))
    ncty, nctx = stats[0][0].shape[2:]
    type_ = jnp.zeros((3, ncty, nctx), jnp.int8)
    offs = jnp.zeros((3, ncty, nctx, 4), jnp.int8)
    bpos = jnp.zeros((3, ncty, nctx), jnp.int8)
    eocl = jnp.zeros((3, ncty, nctx), jnp.int8)
    for c in range(3):
        if c > 0 and tier < 3:
            continue
        eo_cnt, eo_err, bo_cnt, bo_err = stats[c]
        ncl = eo_cnt.shape[0]
        best_cost = jnp.zeros((ncty, nctx), jnp.float32)
        eo_classes = (0, 1) if tier <= 1 else tuple(range(ncl))
        eo_h = jnp.zeros((4, 4, ncty, nctx), jnp.float32)
        eo_cost = jnp.full((4, ncty, nctx), jnp.inf, jnp.float32)
        for eo in eo_classes:
            cost = jnp.full((ncty, nctx), lam * 3.0, jnp.float32)
            hs = []
            for k, cat in enumerate(_CATS):
                lo, hi = _BOUNDS[k]
                h, cst = _best_offsets(eo_cnt[eo, cat], eo_err[eo, cat],
                                       lo, hi, lam)
                hs.append(h)
                cost = cost + cst
            eo_cost = eo_cost.at[eo].set(cost)
            for k in range(4):
                eo_h = eo_h.at[eo, k].set(hs[k])
        if c == 2:
            # Cr inherits Cb's type/class; only that class is searched
            sel_t1 = type_[1]
            sel_e1 = eocl[1].astype(jnp.int32)
            adj = jnp.where(
                sel_t1[None] == 2,
                jnp.where(jnp.arange(4)[:, None, None] == sel_e1[None],
                          eo_cost, jnp.inf), jnp.inf)
        else:
            adj = eo_cost
        bcls = jnp.argmin(adj, axis=0)            # first min = class order
        bcost = jnp.take_along_axis(adj, bcls[None], axis=0)[0]
        use_eo = bcost < best_cost
        best_cost = jnp.where(use_eo, jnp.take_along_axis(
            eo_cost, bcls[None], axis=0)[0], best_cost)
        type_ = type_.at[c].set(
            jnp.where(use_eo, 2, type_[c]).astype(jnp.int8))
        eocl = eocl.at[c].set(
            jnp.where(use_eo, bcls, eocl[c]).astype(jnp.int8))
        for k in range(4):
            sel_h = jnp.take_along_axis(eo_h[:, k], bcls[None], axis=0)[0]
            offs = offs.at[c, :, :, k].set(
                jnp.where(use_eo, sel_h, offs[c, :, :, k].astype(
                    jnp.float32)).astype(jnp.int8))
        do_bo = (tier >= 3 and c != 2 and bo_cnt is not None)
        bo_allowed = None
        if c == 2 and tier >= 3 and bo_cnt is not None:
            do_bo = True
            bo_allowed = type_[1] == 1
        if do_bo:
            bh, bc = _best_offsets(bo_cnt, bo_err, -7.0, 7.0, lam)
            wc = jnp.stack([bc[b:b + 4].sum(axis=0) for b in range(29)])
            wpos = jnp.argmin(wc, axis=0)
            wcost = jnp.take_along_axis(wc, wpos[None], axis=0)[0] \
                + lam * 8.0
            use_bo = wcost < best_cost
            if bo_allowed is not None:
                use_bo = use_bo & bo_allowed
            type_ = type_.at[c].set(
                jnp.where(use_bo, 1, type_[c]).astype(jnp.int8))
            bpos = bpos.at[c].set(
                jnp.where(use_bo, wpos, bpos[c]).astype(jnp.int8))
            eocl = eocl.at[c].set(
                jnp.where(use_bo, 0, eocl[c]).astype(jnp.int8))
            for k in range(4):
                hk = jnp.take_along_axis(bh, (wpos + k)[None], axis=0)[0]
                offs = offs.at[c, :, :, k].set(
                    jnp.where(use_bo, hk,
                              offs[c, :, :, k].astype(jnp.float32))
                    .astype(jnp.int8))
        if c == 1:
            type_ = type_.at[2].set(type_[1])
            eocl = eocl.at[2].set(eocl[1])
    return type_, offs, bpos, eocl
