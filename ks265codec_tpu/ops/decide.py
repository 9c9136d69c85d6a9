"""Whole-frame intra decision on device: reference construction, 35-mode
prediction, SATD + lambda*bits mode costs and the split/mode argmin for all
three CU sizes in ONE jitted dispatch over a BATCH of frames.

Replaces the host-side _build_source_refs + per-size dispatch flow: the
only host->device traffic is the uint8 source planes (decisions come back
as tiny maps), which matters when the chip sits behind a narrow transfer
link.

The cost model is the reference's Rough bit-counter tier (SURVEY.md 2.3
CBitCounterRough) rather than raw SATD: per block the SATD-best mode's
residual is actually transformed + quantized (the same integer kernels as
the coding pass), distortion is the dequantized coefficient-domain SSE
(Parseval-scaled to pixel SSE), and rate is a closed-form estimate of the
CABAC residual bits from the level magnitudes, plus MPM-aware mode bits
(two-round neighbor-grid estimate) and per-size header bits. The
split/merge comparison then runs in true D + lambda*R units, which is
what makes the encoder pick the reference's large-CU layout (SATD-only
proxies systematically over-split). Chroma modes are searched over the
5 syntax candidates (planar/26/10/1/DM, duplicate->34, spec 8.4.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cost as jcost
from . import intra as jintra
# import EAGERLY: these modules hold module-level jnp constant tables; a
# lazy first import DURING a jit trace binds those constants to that
# trace, and any later trace (new shapes, e.g. 4K stripes) dies with
# UnexpectedTracerError
from . import transforms as _transforms_eager  # noqa: F401
from . import wavefront as _wavefront_eager    # noqa: F401

_HDR_BITS = {8: 7.0, 16: 5.0, 32: 4.0}
# luma mode bits: prev_intra_pred_flag + mpm_idx / 5-bit rem_mode
_BITS_MPM0, _BITS_MPM12, _BITS_REM = 2.0, 3.0, 6.0
# chroma: 1-bit DM flag, or flag + 2 bypass bins
# non-DM chroma costs ~3 coded bins but its SATD gain is usually noise:
# the reference picks DM ~2x as often as our SATD-only chroma search did
# (stream-stats comparison). 7.0 biases toward DM and measured -1.7%
# bits at +0.01 dB on the medium RD harness; the true-RD chroma search
# of the reference is approximated by this penalty, not replicated.
_BITS_DM, _BITS_CHROMA = 1.0, 7.0


def _rough_tu_cost(res, qp, n: int, log2: int, D_scale: float):
    """Rough-RD of one TU batch: real fwd transform + quant (the coding
    pass kernels), dequantized coefficient-domain SSE as distortion and a
    closed-form CABAC-bit estimate from level magnitudes.

    res (B, n, n) int32 residual; qp (B,) int32.
    Returns (D_pix (B,) f32, bits (B,) f32)."""
    from .transforms import _LEVEL_SCALE, _QUANT_SCALE, _T
    from .wavefront import _mm_lhs, _mm_rhs
    t = _T[n]
    shift1 = log2 + 8 - 9
    shift2 = log2 + 6
    e = _mm_lhs(t, res)
    if shift1 > 0:
        e = (e + (1 << (shift1 - 1))) >> shift1
    c = (_mm_rhs(e, t.T) + (1 << (shift2 - 1))) >> shift2
    qpv = qp[:, None, None]
    qbits = 29 + qpv // 6 - 8 - log2
    scale = jnp.asarray(_QUANT_SCALE)[qpv % 6]
    rnd = jnp.int32(171) << (qbits - 9)
    a = jnp.abs(c)
    lev = jnp.clip((a * scale + rnd) >> qbits, 0, 32767)
    # dequant (mirror of the decoder, no inverse transform needed)
    s = 8 + log2 - 5
    p = qpv // 6
    tv = lev * (16 * jnp.asarray(_LEVEL_SCALE)[qpv % 6])
    sp = jnp.maximum(s - p, 0)
    ps = jnp.maximum(p - s, 0)
    drnd = jnp.where(s - p >= 1,
                     jnp.int32(1) << jnp.maximum(s - p - 1, 0), 0)
    deq = jnp.clip((tv + drnd) >> sp << ps, -32768, 32767)
    derr = (a - deq).astype(jnp.float32)
    # Parseval: pixel SSE = coeff SSE * 4^(log2-7) for this int-DCT scaling
    D = (derr * derr).sum(axis=(1, 2)) * D_scale
    # rough residual bits: sig+sign+gt-flags+escape golomb per nonzero,
    # ~1 bit/coded-subblock overhead via the nonzero count itself
    lf = lev.astype(jnp.float32)
    nz = lf > 0
    bits = jnp.where(nz, 3.1 + 2.0 * jnp.log2(jnp.maximum(lf, 1.0)), 0.0) \
        .sum(axis=(1, 2))
    return D, bits


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


def _mpm_lists(modes, n: int, nby: int, nbx: int):
    """Vectorized MPM candidate lists (spec 8.4.2) from the same-size
    neighbor grid of first-round modes. Above neighbors in a different CTB
    row count as DC (the line-buffer rule). Returns (m0, m1, m2) each
    (nby, nbx)."""
    m = modes.reshape(nby, nbx)
    left = jnp.concatenate([jnp.ones((nby, 1), m.dtype), m[:, :-1]], axis=1)
    above = jnp.concatenate([jnp.ones((1, nbx), m.dtype), m[:-1, :]], axis=0)
    # above across a CTB row boundary -> DC
    same_ctb_row = (jnp.arange(nby) * n) % 64 != 0
    above = jnp.where(same_ctb_row[:, None], above, 1)
    a, b = left.astype(jnp.int32), above.astype(jnp.int32)
    eq = a == b
    ang = a >= 2
    # equal-angular branch
    e0, e1 = a, 2 + ((a + 29) % 32)
    e2 = 2 + ((a - 1) % 32)
    # equal-nonangular branch: [0, 1, 26]
    m0 = jnp.where(eq, jnp.where(ang, e0, 0), a)
    m1 = jnp.where(eq, jnp.where(ang, e1, 1), b)
    third = jnp.where((a != 0) & (b != 0), 0,
                      jnp.where((a != 1) & (b != 1), 1, 26))
    m2 = jnp.where(eq, jnp.where(ang, e2, 26), third)
    return m0, m1, m2


def _size_decision(plane, cbp, crp, qp, qpc, lam, ls, n: int,
                   effort: int, seed_modes=None):
    """(luma mode, rough-RD cost, chroma mode) maps for one size on one
    frame. qp/qpc: scalar luma/chroma QP; lam full lambda (D+lam*R);
    ls = sqrt(lam) for the SATD-domain mode argmins. effort 0 = fast
    presets (single RDO candidate, DM chroma); 1 = full (top-3 RDO list,
    5-candidate chroma search) — the reference's per-preset md ladder.

    seed_modes (fast-md tier): per-block parent winner map (from the
    2n size decision) — the search narrows from all 35 modes to
    {parent, parent+-1, planar, DC, V, H} (the reference's
    decideBestLumaModeBySadFast shape), ~4x less predict+SATD work."""
    h, w = plane.shape
    nby, nbx = h // n, w // n
    log2 = n.bit_length() - 1
    refs = _source_refs(plane, n).reshape(-1, 4 * n + 1)
    refs_f = _filter_refs(refs, n)
    blocks = plane.reshape(nby, n, nbx, n).swapaxes(1, 2).reshape(-1, n, n)
    B = blocks.shape[0]
    if seed_modes is not None:
        # Seeded (fast-md) tier. Static all-35 prediction is ~25x cheaper
        # on TPU than per-block dynamic-mode gathers (_predict_dyn lowers
        # to lane gathers), so predict everything and restrict the SEARCH
        # to the seeded candidate set by masking the (B, 35) cost matrix.
        par = seed_modes.reshape(-1).astype(jnp.int32)         # (B,)
        ang = jnp.maximum(par, 2)
        cand = jnp.stack([
            par,
            jnp.where(par >= 2, 2 + ((ang - 2 + 1) % 33), 0),
            jnp.where(par >= 2, 2 + ((ang - 2 + 32) % 33), 1),
            jnp.full_like(par, 0), jnp.full_like(par, 1),
            jnp.full_like(par, 26), jnp.full_like(par, 10)], axis=1)
        preds = jintra.predict_all_modes(refs, refs_f, n, True)
        costs = jcost.satd(preds, blocks[:, None], 8).astype(jnp.float32)
        allm = jnp.arange(35, dtype=jnp.int32)[None, :]        # (1, 35)
        in_cand = (cand[:, :, None] == allm[None]).any(axis=1)  # (B, 35)
        costs_m = jnp.where(in_cand, costs, jnp.inf)
        best0 = jnp.argmin(costs_m, axis=1).astype(jnp.int32)
        m0, m1, m2 = _mpm_lists(best0, n, nby, nbx)
        mbits = jnp.where(allm == m0.reshape(-1)[:, None], _BITS_MPM0,
                          jnp.where((allm == m1.reshape(-1)[:, None])
                                    | (allm == m2.reshape(-1)[:, None]),
                                    _BITS_MPM12, _BITS_REM))
        jlc = jnp.where(in_cand, costs + ls * mbits, jnp.inf)
        best = jnp.argmin(jlc, axis=1).astype(jnp.int32)
        mode_bits = jnp.take_along_axis(mbits, best[:, None], axis=1)[:, 0]
        pred_b = jnp.take_along_axis(
            preds, best[:, None, None, None], axis=1)[:, 0]
        qpb = jnp.full((B,), qp, jnp.int32)
        D, rbits = _rough_tu_cost(blocks - pred_b, qpb, n, log2,
                                  4.0 ** (log2 - 7))
        return _chroma_and_cost(cbp, crp, qpc, lam, ls, n, nby, nbx,
                                log2, B, 0, best, D, rbits, mode_bits)
    preds = jintra.predict_all_modes(refs, refs_f, n, True)
    costs = jcost.satd(preds, blocks[:, None], 8).astype(jnp.float32)
    # round 1: SATD-only argmin feeds the neighbor-mode MPM estimate
    best0 = jnp.argmin(costs, axis=1)
    m0, m1, m2 = _mpm_lists(best0, n, nby, nbx)
    allm = jnp.arange(35, dtype=jnp.int32)[None, :]
    mbits = jnp.where(allm == m0.reshape(-1)[:, None], _BITS_MPM0,
                      jnp.where((allm == m1.reshape(-1)[:, None])
                                | (allm == m2.reshape(-1)[:, None]),
                                _BITS_MPM12, _BITS_REM))
    j = costs + ls * mbits
    # top-K SATD candidates, then pick by rough-RD (the reference's RDO
    # candidate list, CIntraModeDecision -> rdo loop)
    K = 3 if effort else 1
    if K == 1:
        cand_idx = jnp.argmin(j, axis=1).astype(jnp.int32)[:, None]
    else:
        _, cand_idx = jax.lax.top_k(-j, K)                   # (B, K)
        cand_idx = cand_idx.astype(jnp.int32)
    pred_k = jnp.take_along_axis(
        preds, cand_idx[:, :, None, None], axis=1)           # (B, K, n, n)
    qpb = jnp.full((B * K,), qp, jnp.int32)
    res_k = (blocks[:, None] - pred_k).reshape(B * K, n, n)
    Dk, rbk = _rough_tu_cost(res_k, qpb, n, log2, 4.0 ** (log2 - 7))
    mb_k = jnp.take_along_axis(mbits, cand_idx, axis=1)
    jk = (Dk.reshape(B, K) + lam * (rbk.reshape(B, K) + mb_k))
    ki = jnp.argmin(jk, axis=1)
    best = jnp.take_along_axis(cand_idx, ki[:, None], axis=1)[:, 0]
    mode_bits = jnp.take_along_axis(mb_k, ki[:, None], axis=1)[:, 0]
    D = jnp.take_along_axis(Dk.reshape(B, K), ki[:, None], axis=1)[:, 0]
    rbits = jnp.take_along_axis(rbk.reshape(B, K), ki[:, None],
                                axis=1)[:, 0]
    return _chroma_and_cost(cbp, crp, qpc, lam, ls, n, nby, nbx, log2,
                            B, effort, best, D, rbits, mode_bits)


def _chroma_and_cost(cbp, crp, qpc, lam, ls, n, nby, nbx, log2, B,
                     effort, best, D, rbits, mode_bits):
    """Chroma mode decision + the final rough-RD cost map (shared tail
    of _size_decision's full and seeded paths).

    The candidate choice is SATD+rate (the reference's chroma ladder),
    so the rough D/R transform work runs only for the WINNING mode —
    and prediction is the static all-35 kernel + cost gathers, which on
    TPU beats per-block dynamic-mode prediction by a wide margin."""
    nc = n // 2
    dm = best
    if effort:
        cands = jnp.stack([jnp.full_like(dm, 0), jnp.full_like(dm, 26),
                           jnp.full_like(dm, 10), jnp.full_like(dm, 1),
                           dm], axis=1)                        # (B, 5)
        mapped = jnp.where(cands[:, :4] == dm[:, None], 34, cands[:, :4])
        cands = jnp.concatenate([mapped, dm[:, None]], axis=1)
    else:
        cands = dm[:, None]                                    # DM only
    C = cands.shape[1]
    csatd = jnp.zeros((B, C), jnp.float32)
    cpreds_pl = []
    cblocks_pl = []
    for cp in (cbp, crp):
        crefs = _source_refs(cp, nc).reshape(-1, 4 * nc + 1)
        cblocks = cp.reshape(nby, nc, nbx, nc).swapaxes(1, 2) \
            .reshape(-1, nc, nc)
        cpreds = jintra.predict_all_modes(crefs, crefs, nc, False)
        sat_all = jcost.satd(cpreds, cblocks[:, None],
                             8).astype(jnp.float32)            # (B, 35)
        csatd = csatd + jnp.take_along_axis(sat_all, cands, axis=1)
        cpreds_pl.append(cpreds)
        cblocks_pl.append(cblocks)
    if effort:
        cbits = jnp.concatenate(
            [jnp.full((B, 4), _BITS_CHROMA), jnp.full((B, 1), _BITS_DM)],
            axis=1)
    else:
        cbits = jnp.full((B, 1), _BITS_DM)
    cj = csatd + ls * cbits
    ci = jnp.argmin(cj, axis=1)
    cmode = jnp.take_along_axis(cands, ci[:, None], axis=1)[:, 0]
    cmode_bits = jnp.take_along_axis(cbits, ci[:, None], axis=1)[:, 0]
    cost_luma = D + lam * (rbits + mode_bits + _HDR_BITS[n])
    qpcb = jnp.full((B,), qpc, jnp.int32)
    for cpreds, cblocks in zip(cpreds_pl, cblocks_pl):
        cpred_w = jnp.take_along_axis(
            cpreds, cmode[:, None, None, None], axis=1)[:, 0]
        Dc, rbc = _rough_tu_cost(cblocks - cpred_w, qpcb, nc, log2 - 1,
                                 4.0 ** (log2 - 1 - 7))
        D = D + Dc
        rbits = rbits + rbc
    cost = D + lam * (rbits + mode_bits + cmode_bits + _HDR_BITS[n])
    return (best.reshape(nby, nbx), cost.reshape(nby, nbx),
            cmode.reshape(nby, nbx).astype(jnp.int32),
            cost_luma.reshape(nby, nbx))


def _size4_luma(plane, qp, lam, ls):
    """4x4 luma mode decision (the NxN tier): full 35-mode SATD + MPM
    rate + rough-RD of the winner. HEVC never smooths 4x4 luma refs."""
    n = 4
    h, w = plane.shape
    nby, nbx = h // n, w // n
    refs = _source_refs(plane, n).reshape(-1, 4 * n + 1)
    blocks = plane.reshape(nby, n, nbx, n).swapaxes(1, 2).reshape(-1, n, n)
    B = blocks.shape[0]
    preds = jintra.predict_all_modes(refs, refs, n, True)
    costs = jcost.satd(preds, blocks[:, None], 4).astype(jnp.float32)
    best0 = jnp.argmin(costs, axis=1)
    m0, m1, m2 = _mpm_lists(best0, n, nby, nbx)
    allm = jnp.arange(35, dtype=jnp.int32)[None, :]
    mbits = jnp.where(allm == m0.reshape(-1)[:, None], _BITS_MPM0,
                      jnp.where((allm == m1.reshape(-1)[:, None])
                                | (allm == m2.reshape(-1)[:, None]),
                                _BITS_MPM12, _BITS_REM))
    j = costs + ls * mbits
    ki = jnp.argmin(j, axis=1)
    best = ki.astype(jnp.int32)
    mode_bits = jnp.take_along_axis(mbits, ki[:, None], axis=1)[:, 0]
    pred_b = jnp.take_along_axis(
        preds, ki[:, None, None, None], axis=1)[:, 0]
    qpb = jnp.full((B,), qp, jnp.int32)
    D, rbits = _rough_tu_cost(blocks - pred_b, qpb, n, 2, 4.0 ** (2 - 7))
    cost = D + lam * (rbits + mode_bits + 1.0)    # per-PU cbf_luma bin
    return best.reshape(nby, nbx), cost.reshape(nby, nbx)


def _decide_one(plane, cbp, crp, qp, qpc, lam, ls, effort: int,
                nxn: bool = False):
    plane = plane.astype(jnp.int32)
    cbp = cbp.astype(jnp.int32)
    crp = crp.astype(jnp.int32)
    mode16, cost16, cm16, _ = _size_decision(plane, cbp, crp, qp, qpc,
                                             lam, ls, 16, effort)
    if effort == 0:
        # fast md: only the 16 tier runs the full 35-mode sweep; 8 and
        # 32 narrow to parent/child-seeded candidate sets (~60% less
        # decide compute, the dominant pass at the fast presets)
        seed8 = jnp.repeat(jnp.repeat(mode16, 2, 0), 2, 1)
        mode8, cost8, cm8, cl8 = _size_decision(plane, cbp, crp, qp, qpc,
                                                lam, ls, 8, effort,
                                                seed_modes=seed8)
        mode32, cost32, cm32, _ = _size_decision(
            plane, cbp, crp, qp, qpc, lam, ls, 32, effort,
            seed_modes=mode16[::2, ::2])
    else:
        mode8, cost8, cm8, cl8 = _size_decision(plane, cbp, crp, qp, qpc,
                                                lam, ls, 8, effort)
        mode32, cost32, cm32, _ = _size_decision(plane, cbp, crp, qp, qpc,
                                                 lam, ls, 32, effort)
    h8, w8 = cost8.shape
    if effort >= 1 and nxn:
        # NxN tier (part_mode NxN at the min CB): four 4x4 luma PUs with
        # their own modes + DST 4x4 TUs; chroma unchanged (one 4x4 TU).
        # Compare luma-only costs — the chroma term is identical on both
        # sides of the 8x8-vs-NxN choice.
        mode4, cost4 = _size4_luma(plane, qp, lam, ls)
        c4sum = cost4.reshape(h8, 2, w8, 2).sum(axis=(1, 3))
        # overhead beyond the per-PU terms already in cost4: part bin +
        # four separate last-pos/CG codings the closed-form rate model
        # undercounts (tuned on the RD harness: +4 was a high-QP loss)
        nxn_cost = c4sum + lam * 16.0
        nxn8 = nxn_cost < cl8
        cost8 = jnp.where(nxn8, cost8 - cl8 + nxn_cost, cost8)
    else:
        mode4 = jnp.zeros((h8 * 2, w8 * 2), jnp.int32)
        nxn8 = jnp.zeros((h8, w8), bool)
    c8sum = cost8.reshape(h8 // 2, 2, w8 // 2, 2).sum(axis=(1, 3))
    split16 = c8sum < cost16
    best16 = jnp.minimum(c8sum, cost16)
    c16sum = best16.reshape(best16.shape[0] // 2, 2,
                            best16.shape[1] // 2, 2).sum(axis=(1, 3))
    split32 = c16sum < cost32
    cplx = jnp.minimum(c16sum, cost32).sum()
    return (split32, mode16, mode32, cplx, split16, mode8,
            cm8, cm16, cm32, cost8, cost16, mode4,
            nxn8.astype(jnp.uint8))


@partial(jax.jit, static_argnames=("effort", "nxn", "costs"))
def decide_frames_jit(planes, cbs, crs, qp, qpc, lam, ls, effort: int,
                      nxn: bool = False, costs: bool = True):
    """Batched over frames: planes (F, ph, pw) uint8; qp/qpc/lam/ls (F,).
    Returns ONE packed uint8 vector (a single D2H fetch: the per-map
    fetches cost ~tens of ms each through the device tunnel). Mode maps
    travel as uint8 (values 0..34) and the rough-RD cost maps / NxN tier
    only when a consumer asked (`costs` — the inter engine's icost maps;
    `nxn`) — the full int32 pack was ~500 KB/frame at 720p, several
    tunnel-seconds per 16-frame batch."""
    outs = list(jax.vmap(partial(_decide_one, effort=effort, nxn=nxn))(
        planes, cbs, crs, qp, qpc, lam, ls))
    for i in (1, 2, 5, 6, 7, 8, 11):          # mode maps: values < 256
        outs[i] = outs[i].astype(jnp.uint8)
    sel = list(range(9)) + ([9, 10] if costs else []) \
        + ([11, 12] if nxn else [])
    parts = []
    for i in sel:
        o = outs[i]
        if o.dtype == jnp.bool_:
            o = o.astype(jnp.uint8)
        if o.dtype == jnp.uint8:
            parts.append(o.reshape(-1))
        else:
            parts.append(
                jax.lax.bitcast_convert_type(o, jnp.uint8).reshape(-1))
    return jnp.concatenate(parts)


def decide_frames(src_planes, src_cbs, src_crs, qps,
                  lam_scale: float = 1.0, effort: int = 1,
                  nxn: bool = False, want_costs: bool = True):
    """Host wrapper. src_planes (F, ph, pw) uint8/int (+ chroma at half
    res); qps list of ints. Returns per-frame tuples
    (split32, mode16, mode32, cplx, split16, mode8, cm8, cm16, cm32,
    cost8, cost16, mode4, nxn8). With want_costs=False the cost maps come
    back as zeros (and with nxn=False the mode4/nxn8 maps) — callers that
    only need the maps skip the fetch bytes."""
    from ..hevc.tables import chroma_qp
    qpa = np.asarray(qps, np.int32)
    lam = (0.57 * lam_scale
           * 2.0 ** ((qpa.astype(np.float64) - 12) / 3.0))
    ls = np.sqrt(lam)
    qpc = np.asarray([chroma_qp(int(q)) for q in qpa], np.int32)

    def dev(a):
        # device arrays pass through untouched (the caller uploads the
        # sources ONCE and shares them with the coding dispatch — the
        # duplicate int32 upload cost seconds per batch on the tunnel)
        if isinstance(a, jnp.ndarray) and a.dtype == jnp.uint8:
            return a
        return jnp.asarray(np.asarray(a, np.uint8))

    F, ph, pw = src_planes.shape
    # large frames (4K) run as row STRIPES: the full-frame decide kernel
    # faults the TPU worker above ~2.5 MP (observed 3840x2160 crash, not
    # an OOM — 12 GB allocs succeed). Stripe seams only perturb the MPM
    # neighbor estimate of each stripe's first block row.
    import os
    cap_px = int(os.environ.get("KS265_DECIDE_STRIPE_PX", 2_500_000))
    stripe_rows = ph
    if ph * pw > cap_px:
        # floor at 32 (the decide grid granularity), never above the cap:
        # a fixed 512-row floor re-created >cap stripes for very wide
        # frames, re-exposing the kernel fault the striping works around
        stripe_rows = max(32, ((cap_px // pw) // 32) * 32)
        if ph % 32 != 0:
            # stripes must cut on 32-row grid lines; a non-32-multiple
            # padded height (CTB 16 streams) can't, and the full-frame
            # dispatch is the documented TPU fault — fail loudly instead
            raise ValueError(
                "decide pass: frame %dx%d exceeds the safe dispatch size "
                "(%d px) but padded height is not a multiple of 32; "
                "raise KS265_DECIDE_STRIPE_PX only if the backend "
                "tolerates it" % (pw, ph, cap_px))
    if stripe_rows < ph:
        dy, dcb, dcr = dev(src_planes), dev(src_cbs), dev(src_crs)
        parts = []
        for y0 in range(0, ph, stripe_rows):
            y1 = min(y0 + stripe_rows, ph)
            parts.append((y1 - y0, np.asarray(decide_frames_jit(
                dy[:, y0:y1], dcb[:, y0 // 2:y1 // 2],
                dcr[:, y0 // 2:y1 // 2],
                jnp.asarray(qpa), jnp.asarray(qpc),
                jnp.asarray(lam.astype(np.float32)),
                jnp.asarray(ls.astype(np.float32)), int(effort),
                bool(nxn), bool(want_costs)))))
        per_stripe = [
            _unpack_decide(buf_s, F, hs, pw, want_costs, nxn, qps)
            for hs, buf_s in parts]
        out = []
        for f in range(F):
            cat = []
            for i in range(13):
                vals = [st[f][i] for st in per_stripe]
                if i == 3:      # scalar complexity: sum over stripes
                    cat.append(float(np.sum(vals)))
                else:
                    cat.append(np.concatenate(vals, axis=0))
            out.append(tuple(cat))
        return out
    buf = np.asarray(decide_frames_jit(
        dev(src_planes), dev(src_cbs), dev(src_crs),
        jnp.asarray(qpa), jnp.asarray(qpc),
        jnp.asarray(lam.astype(np.float32)),
        jnp.asarray(ls.astype(np.float32)), int(effort), bool(nxn),
        bool(want_costs)))
    return _unpack_decide(buf, F, ph, pw, want_costs, nxn, qps)


def _unpack_decide(buf, F, ph, pw, want_costs, nxn, qps):
    h32, w32 = ph // 32, pw // 32
    h16, w16 = ph // 16, pw // 16
    h8, w8 = ph // 8, pw // 8
    specs = [(np.uint8, (F, h32, w32)), (np.uint8, (F, h16, w16)),
             (np.uint8, (F, h32, w32)), (np.float32, (F,)),
             (np.uint8, (F, h16, w16)), (np.uint8, (F, h8, w8)),
             (np.uint8, (F, h8, w8)), (np.uint8, (F, h16, w16)),
             (np.uint8, (F, h32, w32))]
    if want_costs:
        specs += [(np.float32, (F, h8, w8)), (np.float32, (F, h16, w16))]
    if nxn:
        specs += [(np.uint8, (F, h8 * 2, w8 * 2)), (np.uint8, (F, h8, w8))]
    outs = []
    off = 0
    for dt, shape in specs:
        n = int(np.prod(shape))
        outs.append(np.frombuffer(buf, dt, n, off).reshape(shape))
        off += n * np.dtype(dt).itemsize
    assert off == buf.size, (off, buf.size)
    if not want_costs:
        outs[9:9] = [np.zeros((F, h8, w8), np.float32),
                     np.zeros((F, h16, w16), np.float32)]
    if not nxn:
        outs += [np.zeros((F, h8 * 2, w8 * 2), np.uint8),
                 np.zeros((F, h8, w8), np.uint8)]
    return [(outs[0][f].astype(bool), outs[1][f].astype(np.int32),
             outs[2][f].astype(np.int32),
             float(outs[3][f]), outs[4][f].astype(bool),
             outs[5][f].astype(np.int32), outs[6][f].astype(np.int32),
             outs[7][f].astype(np.int32), outs[8][f].astype(np.int32),
             outs[9][f], outs[10][f],
             outs[11][f].astype(np.int32), outs[12][f].astype(bool))
            for f in range(len(qps))]
