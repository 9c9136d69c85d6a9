"""Device inter mode decision: merge-candidate evaluation + rough-RD
arbitration (merge vs ME/AMVP vs intra) for every CU of a tier in one
jitted dispatch.

TPU-first restructure of the reference's per-CU decision chain
(processCuMdInter: checkPuMerge -> motionSearch -> tuDecision, SURVEY.md
3.2): candidates come from the pre-pass APPROXIMATE motion field (dense ME
winners), are evaluated densely for the whole frame, and the host's later
syntax walk re-derives the TRUE merge lists (decoder-identical) and maps
each decided motion onto merge_idx / AMVP+mvd syntax — so decision quality
rides the approximation but bitstream correctness never does.

Costs are the Rough bit-counter tier (CBitCounterRough analog): real
forward transform + inter-deadzone quant of the actual MC residual,
dequantized coefficient-domain SSE (Parseval-scaled) + closed-form level
bits — identical units to ops/decide's intra costs so intra/inter
arbitration is a plain argmin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mc import _combine, _interp_cells, chroma_mats, luma_mats
from .transforms import _LEVEL_SCALE, _QUANT_SCALE, _T
from .wavefront import _mm_lhs, _mm_rhs


def _pred_blocks(refs_y, s0, v0, s1, v1, xs, ys, n: int,
                 pic_w: int, pic_h: int, has_l1: bool, chroma: bool):
    """(K, n, n) 8-bit combined prediction at arbitrary origins."""
    mats = chroma_mats(n) if chroma else luma_mats(n)
    fb = 3 if chroma else 2
    use0 = (s0 >= 0)[:, None, None]
    p0 = _interp_cells(refs_y, jnp.clip(s0, 0), v0[:, 0], v0[:, 1], n,
                       ys, xs, mats, fb, pic_w, pic_h)
    if has_l1:
        use1 = (s1 >= 0)[:, None, None]
        p1 = _interp_cells(refs_y, jnp.clip(s1, 0), v1[:, 0], v1[:, 1], n,
                           ys, xs, mats, fb, pic_w, pic_h)
        return _combine(p0, p1, use0, use1)
    return _combine(p0, p0, use0, jnp.zeros_like(use0))


def _take(plane, xs, ys, n: int):
    """(K, n, n) source blocks at in-bounds grid origins — batched
    dynamic_slice (~3x the throughput of an outer-product fancy gather
    through XLA's gather path on TPU)."""
    def _one(y, x):
        return jax.lax.dynamic_slice(plane, (y, x), (n, n))

    return jax.vmap(_one)(ys, xs)


def _map_cands(f, args, B: int, n: int, bi: bool):
    """Evaluate f over the candidate axis with bounded parallelism.

    lax.map serializes the C merge candidates (each step's gathers+SADs
    underfill the chip -> pure latency); a bare vmap materializes
    C * B * (n+7)^2 patches at once (4K frames: GBs). Chunk C so each
    step stays under a ~32M-element working set, vmap inside the chunk,
    lax.map over chunks only when needed."""
    C = args[0].shape[0]
    per = max(1, B * (n + 7) * (n + 7) * (2 if bi else 1))
    chunk = int(max(1, min(C, 32_000_000 // per)))
    if chunk >= C:
        return jax.vmap(f)(args)
    npad = (-C) % chunk
    padded = tuple(jnp.concatenate([a, jnp.repeat(a[:1], npad, axis=0)])
                   if npad else a for a in args)
    shaped = tuple(a.reshape((-1, chunk) + a.shape[1:]) for a in padded)
    out = jax.lax.map(lambda ch: jax.vmap(f)(ch), shaped)
    out = out.reshape((-1,) + out.shape[2:])[:C]
    return out


def _rough_tu_inter(res, qp, n: int, log2: int):
    """(D_pix, bits, all_zero) rough-RD of one inter TU batch (deadzone
    1/6 rounding — the inter twin of decide._rough_tu_cost)."""
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
    rnd = jnp.int32(85) << (qbits - 9)
    a = jnp.abs(c)
    lev = jnp.clip((a * scale + rnd) >> qbits, 0, 32767)
    s = 8 + log2 - 5
    p = qpv // 6
    tv = lev * (16 * jnp.asarray(_LEVEL_SCALE)[qpv % 6])
    sp = jnp.maximum(s - p, 0)
    ps = jnp.maximum(p - s, 0)
    drnd = jnp.where(s - p >= 1,
                     jnp.int32(1) << jnp.maximum(s - p - 1, 0), 0)
    deq = jnp.clip((tv + drnd) >> sp << ps, 0, 1 << 30)
    derr = (a - deq).astype(jnp.float32)
    D = (derr * derr).sum(axis=(1, 2)) * (4.0 ** (log2 - 7))
    lf = lev.astype(jnp.float32)
    nz = lf > 0
    bits = jnp.where(nz, 3.1 + 2.0 * jnp.log2(jnp.maximum(lf, 1.0)), 0.0) \
        .sum(axis=(1, 2))
    return D, bits, ~nz.any(axis=(1, 2))


def _rough_cu(src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
              s0, v0, s1, v1, xs, ys, n: int, qp, qpcb, qpcr,
              pic_w: int, pic_h: int, has_l1: bool):
    """Rough-RD (D, bits, zero) of coding this motion's residual at CU
    size n: luma TU n (split into 32s when n == 64) + chroma n/2."""
    log2 = n.bit_length() - 1
    py = _pred_blocks(refs_y, s0, v0, s1, v1, xs, ys, n,
                      pic_w, pic_h, has_l1, False)
    ry = _take(src_y, xs, ys, n).astype(jnp.int32) - py
    if n == 64:
        B = ry.shape[0]
        q = ry.reshape(B, 2, 32, 2, 32).transpose(0, 1, 3, 2, 4) \
            .reshape(B * 4, 32, 32)
        Dy, by, zy = _rough_tu_inter(q, jnp.repeat(qp, 4), 32, 5)
        Dy = Dy.reshape(B, 4).sum(1)
        by = by.reshape(B, 4).sum(1)
        zy = zy.reshape(B, 4).all(1)
    else:
        Dy, by, zy = _rough_tu_inter(ry, qp, n, log2)
    nc = n >> 1
    clog2 = log2 - 1
    D, bits, zero = Dy, by, zy
    for (stack, srcp, qpc) in ((refs_cb, src_cb, qpcb),
                               (refs_cr, src_cr, qpcr)):
        pc = _pred_blocks(stack, s0, v0, s1, v1, xs >> 1, ys >> 1, nc,
                          pic_w // 2, pic_h // 2, has_l1, True)
        rc = _take(srcp, xs >> 1, ys >> 1, nc).astype(jnp.int32) - pc
        if nc == 32:
            B = rc.shape[0]
            qr = rc.reshape(B, 2, 16, 2, 16).transpose(0, 1, 3, 2, 4) \
                .reshape(B * 4, 16, 16)
            Dc, bc, zc = _rough_tu_inter(qr, jnp.repeat(qpc, 4), 16, 4)
            Dc = Dc.reshape(B, 4).sum(1)
            bc = bc.reshape(B, 4).sum(1)
            zc = zc.reshape(B, 4).all(1)
        else:
            Dc, bc, zc = _rough_tu_inter(rc, qpc, nc, clog2)
        D = D + Dc
        bits = bits + bc
        zero = zero & zc
    return D, bits, zero


def _tier_core(src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
               xs, ys, cs0, cmv0, cs1, cmv1, cvalid,
               ms0, mmv0, ms1, mmv1, me_bits, icost,
               qp, qpcb, qpcr, lam, lam_satd,
               n: int, pic_w: int, pic_h: int, has_l1: bool,
               zero_only: bool):
    """Decide one tier. Returns per-block:
    choice (0=merge, 1=me, 2=intra), merge best index, final motion
    (slot0, mv0, slot1, mv1), rough-RD cost of the winner, and (when
    zero_only) the all-zero-residual flag of the best zero candidate."""
    # args arrive in narrow dtypes (int8 slots/qp, int16 mv) to shrink
    # the per-frame H2D upload; compute in int32 on device
    i32 = jnp.int32
    cs0, cs1 = cs0.astype(i32), cs1.astype(i32)
    cmv0, cmv1 = cmv0.astype(i32), cmv1.astype(i32)
    ms0, ms1 = ms0.astype(i32), ms1.astype(i32)
    mmv0, mmv1 = mmv0.astype(i32), mmv1.astype(i32)
    qp, qpcb, qpcr = qp.astype(i32), qpcb.astype(i32), qpcr.astype(i32)
    C = cs0.shape[0]
    src_blk = _take(src_y, xs, ys, n).astype(jnp.int32)

    def cand_sad(args):
        s0, v0, s1, v1 = args
        p = _pred_blocks(refs_y, s0, v0, s1, v1, xs, ys, n,
                         pic_w, pic_h, has_l1, False)
        return jnp.abs(src_blk - p).sum(axis=(1, 2)).astype(jnp.float32)

    sads = _map_cands(cand_sad, (cs0, cmv0, cs1, cmv1),
                      cs0.shape[1], n, has_l1)               # (C, B)
    csel = sads + lam_satd[None, :] * (2.0 + jnp.arange(C)[:, None])
    csel = jnp.where(cvalid, csel, jnp.inf)
    best = jnp.argmin(csel, axis=0)                          # (B,)
    bi = (best[None, :] == jnp.arange(C)[:, None])

    def pick(a):
        return (a * bi.astype(a.dtype)).sum(axis=0) if a.ndim == 2 \
            else (a * bi[:, :, None].astype(a.dtype)).sum(axis=0)

    bs0, bs1 = pick(cs0), pick(cs1)
    bmv0, bmv1 = pick(cmv0), pick(cmv1)
    any_valid = cvalid.any(axis=0)
    bs0 = jnp.where(any_valid, bs0, -1)
    bs1 = jnp.where(any_valid, bs1, -1)
    if zero_only:
        # 64-tier: only a fully-zero-residual merge CU is codeable (the
        # slice writer codes 64 CUs as SKIP / rqt_root_cbf=0 only); find
        # the first candidate whose quantized residual vanishes entirely
        def cand_zero(args):
            s0, v0, s1, v1 = args
            _, _, z = _rough_cu(src_y, src_cb, src_cr, refs_y, refs_cb,
                                refs_cr, s0, v0, s1, v1, xs, ys, n,
                                qp, qpcb, qpcr, pic_w, pic_h, has_l1)
            return z

        zall = _map_cands(cand_zero, (cs0, cmv0, cs1, cmv1),
                          cs0.shape[1], n, has_l1) & cvalid
        first = jnp.argmax(zall, axis=0)
        has_zero = zall.any(axis=0)
        return has_zero, first.astype(jnp.int32)
    Dm, bm, _ = _rough_cu(src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
                          bs0, bmv0, bs1, bmv1, xs, ys, n,
                          qp, qpcb, qpcr, pic_w, pic_h, has_l1)
    merge_cost = jnp.where(any_valid,
                           Dm + lam * (bm + 2.0 + best.astype(jnp.float32)),
                           jnp.inf)
    Dme, bme, _ = _rough_cu(src_y, src_cb, src_cr, refs_y, refs_cb,
                            refs_cr, ms0, mmv0, ms1, mmv1, xs, ys, n,
                            qp, qpcb, qpcr, pic_w, pic_h, has_l1)
    me_valid = (ms0 >= 0) | (ms1 >= 0)
    me_cost = jnp.where(me_valid, Dme + lam * (bme + me_bits), jnp.inf)
    intra_cost = jnp.where(icost < jnp.inf, icost + lam * 1.5, jnp.inf)
    costs = jnp.stack([merge_cost, me_cost, intra_cost])
    choice = jnp.argmin(costs, axis=0).astype(jnp.int8)
    cost = jnp.min(costs, axis=0)
    is_m = (choice == 0)
    fs0 = jnp.where(is_m, bs0, ms0)
    fs1 = jnp.where(is_m, bs1, ms1)
    fmv0 = jnp.where(is_m[:, None], bmv0, mmv0)
    fmv1 = jnp.where(is_m[:, None], bmv1, mmv1)
    return choice, best.astype(jnp.int8), cost, fs0, fmv0, fs1, fmv1


decide_tier_jit = partial(
    jax.jit, static_argnames=("n", "pic_w", "pic_h", "has_l1",
                              "zero_only"))(_tier_core)


def _b1(a):
    if a.dtype == jnp.uint8:
        return a.reshape(-1)
    return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)


def _tiers_fused_core(src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
                      tier_args, meta, pic_w: int, pic_h: int,
                      has_l1: bool):
    """ALL CU tiers' decisions in one traced graph, one packed uint8 row
    out (choice/bidx/cost per tier; has_zero/first for zero_only tiers).
    The per-tier dispatches cost ~30 ms of link round-trip each on the
    device tunnel — 8 per frame at two decision iterations.

    meta: static tuple of (n, zero_only) per tier; tier_args: matching
    tuple of per-tier traced-input tuples."""
    parts = []
    for (n, zero_only), ta in zip(meta, tier_args):
        (xs, ys, cs0, cmv0, cs1, cmv1, cvalid, ms0, mmv0, ms1, mmv1,
         me_bits, icost, qp, qpcb, qpcr, lam, lams) = ta
        out = _tier_core(src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
                         xs, ys, cs0, cmv0, cs1, cmv1, cvalid,
                         ms0, mmv0, ms1, mmv1, me_bits, icost,
                         qp, qpcb, qpcr, lam, lams,
                         n=n, pic_w=pic_w, pic_h=pic_h, has_l1=has_l1,
                         zero_only=zero_only)
        if zero_only:
            parts += [_b1(out[0].astype(jnp.uint8)),
                      _b1(out[1].astype(jnp.uint8))]
        else:
            parts += [_b1(out[0].astype(jnp.uint8)),
                      _b1(out[1].astype(jnp.uint8)), _b1(out[2])]
    return jnp.concatenate(parts)


decide_tiers_fused_jit = partial(
    jax.jit, static_argnames=("meta", "pic_w", "pic_h",
                              "has_l1"))(_tiers_fused_core)


def _snap_sads_core(src_y, refs_y, tier_args, meta, pic_w: int,
                    pic_h: int, has_l1: bool):
    """Candidate SADs for several tiers in one dispatch, packed f32."""
    parts = []
    for n, ta in zip(meta, tier_args):
        xs, ys, cs0, cmv0, cs1, cmv1 = ta
        s = _cand_sads_core(src_y, refs_y, xs, ys, cs0, cmv0, cs1, cmv1,
                            n=n, pic_w=pic_w, pic_h=pic_h, has_l1=has_l1)
        parts.append(_b1(s))
    return jnp.concatenate(parts)


snap_sads_fused_jit = partial(
    jax.jit, static_argnames=("meta", "pic_w", "pic_h",
                              "has_l1"))(_snap_sads_core)


def _cand_sads_core(src_y, refs_y, xs, ys, cs0, cmv0, cs1, cmv1,
                    n: int, pic_w: int, pic_h: int, has_l1: bool):
    """Luma SAD of each candidate (C, B) at block origins (B,)."""
    cs0, cs1 = cs0.astype(jnp.int32), cs1.astype(jnp.int32)
    cmv0, cmv1 = cmv0.astype(jnp.int32), cmv1.astype(jnp.int32)
    src_blk = _take(src_y.astype(jnp.int32), xs, ys, n)

    def f(args):
        s0, v0, s1, v1 = args
        p = _pred_blocks(refs_y, s0, v0, s1, v1, xs, ys, n,
                         pic_w, pic_h, has_l1, False)
        return jnp.abs(src_blk - p).sum(axis=(1, 2)).astype(jnp.float32)

    return _map_cands(f, (cs0, cmv0, cs1, cmv1), cs0.shape[1], n, has_l1)


cand_sads_jit = partial(
    jax.jit, static_argnames=("n", "pic_w", "pic_h",
                              "has_l1"))(_cand_sads_core)
