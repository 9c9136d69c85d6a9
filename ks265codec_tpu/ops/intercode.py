"""Device inter-frame coding pass: MC -> residual transform/quant/recon ->
intra-in-inter wavefront -> boundary-strength build -> deblock -> SAO stats,
all inside ONE jitted dispatch per frame.

This replaces the reference's per-CTU P/B hot loop (CCtuEnc::processOneCtu
covering inter slices: interpolatePu* + H265_CalResidual + H265_2dDct +
H265Quant + reconstruct + CLoopFilterCtu, SURVEY.md 3.2) with a TPU-native
restructure: inter CUs have no intra-style neighbor dependency, so the whole
frame's MC + residual coding runs as flat batches per TU size class; only the
(sparse) intra CUs inside the frame need sequencing, and they run as a small
border-carry wavefront seeded from the inter reconstruction. The CU-level
zero-forcing decision (drop a residual whose distortion gain is not worth its
rate — the reference's tuDecisionSkipMerge analog) runs on device as a
segment-sum over each CU's TUs.

Host-side work is reduced to integer map assembly and the CABAC syntax walk.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mc import _mc_core
from .wavefront import (_bitcast_rows, _code_intra_frame_core, _dequant_itx,
                        _fwd_quant, _tile, _untile, borders_from_planes)

# TU classes: (luma?, n). Chroma TUs carry a plane selector (0=Cb, 1=Cr).
LUMA_CLASSES = (8, 16, 32)
CHROMA_CLASSES = (4, 8, 16)


def _take_blocks(plane, xs, ys, n: int):
    """Gather (K, n, n) blocks at pixel origins (xs, ys) from a plane."""
    dy = jnp.arange(n)
    rows = ys[:, None] + dy[None, :]
    cols = xs[:, None] + dy[None, :]
    return plane[rows[:, :, None], cols[:, None, :]]


def _put_blocks(plane, blocks, xs, ys, valid, n: int):
    """Scatter (K, n, n) blocks into the plane (drop out-of-range)."""
    H, W = plane.shape
    dy = jnp.arange(n)
    rows = ys[:, None] + dy[None, :]
    cols = xs[:, None] + dy[None, :]
    rows = jnp.where(valid[:, None], rows, H)
    return plane.at[rows[:, :, None], cols[:, None, :]].set(
        blocks.astype(plane.dtype), mode="drop")


def _code_tu_class(src, pred, xs, ys, qp, cu_id, valid, n: int,
                   sbh: bool, n_cu: int):
    """Transform+quant one TU size class; returns per-TU levels, recon
    residual, and per-CU accumulators (d_skip, d_coded, bits)."""
    from ..encode.sbh import apply_sbh_jnp
    log2 = n.bit_length() - 1
    s = _take_blocks(src, xs, ys, n)
    p = _take_blocks(pred, xs, ys, n).astype(jnp.int32)
    resi = s.astype(jnp.int32) - p
    lev = _fwd_quant(resi, qp, n, log2, intra=False)
    if sbh:
        lev = apply_sbh_jnp(lev, jnp.zeros_like(qp), n)   # diag scan
    rec_resi = _dequant_itx(lev, qp, n, log2)
    # per-TU RD pieces (pixel domain; valid-masked)
    v = valid.astype(jnp.float32)
    rf = resi.astype(jnp.float32)
    df = (resi - rec_resi).astype(jnp.float32)
    d_skip = (rf * rf).sum(axis=(1, 2)) * v
    d_coded = (df * df).sum(axis=(1, 2)) * v
    a = jnp.abs(lev).astype(jnp.float32)
    nz = a > 0
    bits = (3.1 * nz.sum(axis=(1, 2))
            + 2.0 * jnp.where(nz, jnp.log2(jnp.maximum(a, 1.0)), 0.0)
            .sum(axis=(1, 2))) * v
    cid = jnp.where(valid, cu_id, n_cu)
    acc = tuple(jnp.zeros((n_cu + 1,), jnp.float32).at[cid].add(x)
                for x in (d_skip, d_coded, bits))
    return lev, rec_resi, p, acc


def _effective_qp4(qp4, cbfq4, zin4, zcu4, slice_qp, wpp: bool, cs: int,
                   pic_w: int, pic_h: int):
    """Decoder-side effective per-4x4 QP under cu_qp_delta (QG = CTB):
    cells of CUs before the first residual-bearing CU of a CTB take the
    predicted qPY_PREV; the chain resets at slice/WPP-row starts (mirror
    of encode/map_writer.apply_effective_qp, run-verified HM semantics).
    Device twin so deblock tc/beta see the same QPs the decoder will.
    zin4/zcu4: per-cell in-CTB z value / z value of the cell's CU origin
    (statics from the host); cbfq4: per-cell any-plane nonzero."""
    c4 = cs >> 2
    h4, w4 = qp4.shape
    nr, nc = h4 // c4, w4 // c4

    def blk(a):
        return a.reshape(nr, c4, nc, c4).transpose(0, 2, 1, 3)

    y4 = jnp.arange(h4)[:, None]
    x4 = jnp.arange(w4)[None, :]
    valid = (x4 < (pic_w >> 2)) & (y4 < (pic_h >> 2))
    zb = blk(jnp.broadcast_to(zin4, (h4, w4)))
    zcb = blk(jnp.broadcast_to(zcu4, (h4, w4)))
    cb = blk(cbfq4 & valid)
    vb = blk(jnp.broadcast_to(valid, (h4, w4)))
    # first coded CU = min CU-origin z over cells with coefficients
    zfirst = jnp.min(jnp.where(cb, zcb, 1 << 30), axis=(2, 3))
    anyc = cb.any(axis=(2, 3))
    # planned QP of the LAST in-picture cell (z order) of each CTB
    qb = blk(qp4)
    zlast = jnp.where(vb, zb, -1).reshape(nr, nc, -1)
    li = jnp.argmax(zlast, axis=2)
    planned_last = jnp.take_along_axis(qb.reshape(nr, nc, -1),
                                       li[:, :, None], axis=2)[:, :, 0]
    # qPY_PREV chain: last planned-last among strictly-earlier CTBs with
    # any coded CU, else the slice QP. WPP rows chain independently.
    if wpp:
        idx = jnp.where(anyc, jnp.arange(nc)[None, :], -1)
        idx_excl = jnp.concatenate(
            [jnp.full((nr, 1), -1, idx.dtype), idx[:, :-1]], axis=1)
        last = jax.lax.associative_scan(jnp.maximum, idx_excl, axis=1)
        qprev = jnp.where(
            last >= 0,
            jnp.take_along_axis(planned_last, jnp.clip(last, 0), axis=1),
            slice_qp)
    else:
        fl_any = anyc.reshape(-1)
        fl_pl = planned_last.reshape(-1)
        idx = jnp.where(fl_any, jnp.arange(nr * nc), -1)
        idx_excl = jnp.concatenate([np.array([-1]), idx[:-1]])
        last = jax.lax.associative_scan(jnp.maximum, idx_excl)
        qprev = jnp.where(last >= 0, fl_pl[jnp.clip(last, 0)],
                          slice_qp).reshape(nr, nc)
    up = lambda a: jnp.repeat(jnp.repeat(a, c4, 0), c4, 1)
    before = jnp.broadcast_to(zin4, (h4, w4)) < up(zfirst)
    return jnp.where(before, up(qprev), qp4)


def _inter_code_core(src_y, src_cb, src_cr,
                     refs_y, refs_cb, refs_cr,
                     slot0, mv0, slot1, mv1, wts0, wts1,
                     tu_packs, cu_lam,
                     intra_segs, intra_cell_mask,
                     e2_v, e2_h, etb_v, etb_h, emv_v, emv_h, qp4,
                     zin4, zcu4,
                     has_l1: bool, sbh: bool, strong: bool,
                     n_cu: int, h8: int, w8: int,
                     pic_w: int, pic_h: int,
                     boff: int, toff: int, cbo: int, cro: int,
                     sao: bool, cs: int, deblock: bool, esc_cap: int,
                     slice_qp: int, dqp: bool, wpp: bool,
                     sao_tier: int = 4):
    """One frame's complete inter coding; returns one packed uint8 row
    plus the final (deblocked + SAO'd) reconstruction planes, which STAY
    on device — they are the next frames' reference pictures (device DPB)
    and the host only ever fetches them lazily (recon consumer / fallback
    paths). The SAO decision itself runs on device (ops/saodecide) so the
    row carries ~5 KB of chosen params instead of ~300 KB of stats.

    tu_packs: dict (is_luma, n) -> (xs, ys, qp, cu_id, valid) padded
    arrays; chroma packs additionally carry plane (0/1) as 6th field.
    intra_segs: wavefront segments covering ONLY the frame's intra CUs
    (None when the frame has none); intra_cell_mask (h8*w8,) bool marks
    8x8 cells owned by intra CUs (their recon comes from the wavefront).
    """
    from .deblock import deblock_planes
    from .saostats import sao_stats_plane_core
    ph, pw = src_y.shape
    # ---- 1. motion compensation (full frame, per-8-cell motion)
    pred_y, pred_cb, pred_cr = _mc_core(
        refs_y, refs_cb, refs_cr, slot0, mv0, slot1, mv1, wts0, wts1,
        has_l1, h8, w8, pic_w, pic_h)
    sy = src_y.astype(jnp.int32)
    scb = src_cb.astype(jnp.int32)
    scr = src_cr.astype(jnp.int32)
    # ---- 2. residual coding per TU class + zero-forcing accumulators
    acc = [jnp.zeros((n_cu + 1,), jnp.float32) for _ in range(3)]
    results = {}
    for key, pack in tu_packs.items():
        is_luma, n = key
        if is_luma:
            xs, ys, qp, cid, valid = pack
            lev, rr, p, a = _code_tu_class(sy, pred_y, xs, ys, qp, cid,
                                           valid, n, sbh, n_cu)
        else:
            xs, ys, qp, cid, valid, plane = pack
            sc = jnp.where(plane[:, None, None] == 0,
                           _take_blocks(scb, xs, ys, n),
                           _take_blocks(scr, xs, ys, n))
            pc = jnp.where(plane[:, None, None] == 0,
                           _take_blocks(pred_cb, xs, ys, n),
                           _take_blocks(pred_cr, xs, ys, n)).astype(
                               jnp.int32)
            resi = sc.astype(jnp.int32) - pc
            log2 = n.bit_length() - 1
            lev = _fwd_quant(resi, qp, n, log2, intra=False)
            if sbh:
                from ..encode.sbh import apply_sbh_jnp
                lev = apply_sbh_jnp(lev, jnp.zeros_like(qp), n)
            rr = _dequant_itx(lev, qp, n, log2)
            v = valid.astype(jnp.float32)
            rf = resi.astype(jnp.float32)
            df = (resi - rr).astype(jnp.float32)
            aabs = jnp.abs(lev).astype(jnp.float32)
            nz = aabs > 0
            bits = (3.1 * nz.sum(axis=(1, 2))
                    + 2.0 * jnp.where(nz, jnp.log2(jnp.maximum(aabs, 1.0)),
                                      0.0).sum(axis=(1, 2))) * v
            cidm = jnp.where(valid, cid, n_cu)
            # chroma contributes RATE but not distortion to the CU-level
            # zero-forcing gate (round-2 host-walk semantics: luma-only D
            # with all-plane bits biases toward dropping cheap residuals)
            zz = jnp.zeros_like(bits)
            a = tuple(jnp.zeros((n_cu + 1,), jnp.float32).at[cidm].add(x)
                      for x in (zz, zz, bits))
            p = pc
        results[key] = (lev, rr, p)
        for i in range(3):
            acc[i] = acc[i] + a[i]
    # ---- 3. CU-level zero-forcing (tuDecisionSkipMerge analog)
    d_skip, d_coded, bits = acc
    drop = (d_skip - d_coded) <= cu_lam * (bits + 10.0)
    # ---- 4. final levels + recon planes
    rec_y = pred_y.astype(jnp.int32)
    rec_cb, rec_cr = pred_cb.astype(jnp.int32), pred_cr.astype(jnp.int32)
    coef_y = jnp.zeros((ph, pw), jnp.int16)
    coef_cb = jnp.zeros((ph // 2, pw // 2), jnp.int16)
    coef_cr = jnp.zeros((ph // 2, pw // 2), jnp.int16)
    cbf4 = jnp.zeros((ph // 4, pw // 4), bool)     # luma cbf per 4x4

    def _mark4(grid, xs4, ys4, n4, cond):
        d4 = jnp.arange(n4)
        r4 = ys4[:, None, None] + d4[None, :, None]
        c4 = xs4[:, None, None] + d4[None, None, :]
        r4 = jnp.where(cond[:, None, None], r4, ph // 4)
        return grid.at[r4, c4].set(True, mode="drop")

    for key, pack in tu_packs.items():
        is_luma, n = key
        lev, rr, p = results[key]
        if is_luma:
            xs, ys, qp, cid, valid = pack
        else:
            xs, ys, qp, cid, valid, plane = pack
        dcu = drop[jnp.clip(cid, 0, n_cu)]
        lev = jnp.where(dcu[:, None, None], 0, lev)
        rec = jnp.clip(p + jnp.where(dcu[:, None, None], 0, rr), 0, 255)
        nz = (lev != 0).any(axis=(1, 2))
        if is_luma:
            rec_y = _put_blocks(rec_y, rec, xs, ys, valid, n)
            coef_y = _put_blocks(coef_y, lev, xs, ys, valid, n)
            cbf4 = _mark4(cbf4, xs >> 2, ys >> 2, n // 4, valid & nz)
        else:
            m0 = plane == 0
            rec_cb = _put_blocks(rec_cb, rec, xs, ys, valid & m0, n)
            rec_cr = _put_blocks(rec_cr, rec, xs, ys, valid & ~m0, n)
            coef_cb = _put_blocks(coef_cb, lev, xs, ys, valid & m0, n)
            coef_cr = _put_blocks(coef_cr, lev, xs, ys, valid & ~m0, n)
    # ---- 5. intra-in-inter CUs: border-carry wavefront seeded from the
    # inter recon (their neighbors' reconstruction already exists)
    if intra_segs is not None:
        init = borders_from_planes(rec_y, rec_cb, rec_cr)
        iy, icb, icr, cy2, ccb2, ccr2 = _code_intra_frame_core(
            src_y, src_cb, src_cr, intra_segs, strong, sbh, False,
            init_borders=init)
        m8 = intra_cell_mask.reshape(h8, w8)
        my = jnp.repeat(jnp.repeat(m8, 8, 0), 8, 1)
        mc = jnp.repeat(jnp.repeat(m8, 4, 0), 4, 1)
        rec_y = jnp.where(my, iy.astype(jnp.int32), rec_y)
        rec_cb = jnp.where(mc, icb.astype(jnp.int32), rec_cb)
        rec_cr = jnp.where(mc, icr.astype(jnp.int32), rec_cr)
        coef_y = jnp.where(my, cy2, coef_y)
        coef_cb = jnp.where(mc, ccb2, coef_cb)
        coef_cr = jnp.where(mc, ccr2, coef_cr)
        m4 = jnp.repeat(jnp.repeat(m8, 2, 0), 2, 1)
        cbf4 = jnp.where(m4, False, cbf4)   # intra edges use bs=2 anyway
    # ---- 6. boundary strengths (spec 8.7.2.4) from final maps + cbf
    cbf_l = jnp.pad(cbf4, ((0, 0), (1, 0)))[:, :-1]
    cbf_t = jnp.pad(cbf4, ((1, 0), (0, 0)))[:-1, :]
    bs_v = jnp.where(e2_v, 2,
                     jnp.where(etb_v & (cbf4 | cbf_l), 1, emv_v)
                     ).astype(jnp.int8)
    bs_h = jnp.where(e2_h, 2,
                     jnp.where(etb_h & (cbf4 | cbf_t), 1, emv_h)
                     ).astype(jnp.int8)
    if not deblock:
        bs_v = jnp.zeros_like(bs_v)
        bs_h = jnp.zeros_like(bs_h)
    if dqp:
        # cu_qp_delta: deblock must see the decoder's EFFECTIVE QPs
        nzY = (coef_y.reshape(ph // 4, 4, pw // 4, 4) != 0).any((1, 3))
        nzCb = (coef_cb.reshape(ph // 4, 2, pw // 4, 2) != 0).any((1, 3))
        nzCr = (coef_cr.reshape(ph // 4, 2, pw // 4, 2) != 0).any((1, 3))
        qp4 = _effective_qp4(qp4, nzY | nzCb | nzCr, zin4, zcu4,
                             slice_qp, wpp, cs, pic_w, pic_h)
    dy_, dcb_, dcr_ = deblock_planes(rec_y, rec_cb, rec_cr, bs_v, bs_h,
                                     qp4, boff, toff, cbo, cro,
                                     pic_w, pic_h)
    # ---- 7. SAO: stats -> device decision -> device apply (one graph)
    flatc = jnp.concatenate([coef_y.reshape(-1), coef_cb.reshape(-1),
                             coef_cr.reshape(-1)])
    from .wavefront import pack_coeffs_sparse
    cparts, _ = pack_coeffs_sparse(flatc, esc_cap)

    def row(a):
        return _bitcast_rows(a[None])[0]

    # pack one D2H row: SPARSE coeffs + chosen SAO params — the D2H
    # tunnel is the bottleneck; recon planes do NOT travel
    parts = list(cparts)
    dy_u8 = dy_.astype(jnp.uint8)
    dcb_u8 = dcb_.astype(jnp.uint8)
    dcr_u8 = dcr_.astype(jnp.uint8)
    if sao:
        from .saodecide import sao_decide_core
        from .saoapply import sao_apply_core
        ncl = 2 if sao_tier <= 1 else 4
        use_bo = sao_tier >= 3
        stats = []
        planes = ((dy_, src_y, 0),) if sao_tier < 3 else \
            ((dy_, src_y, 0), (dcb_, src_cb, 1), (dcr_, src_cr, 1))
        for rec, src, shift in planes:
            stats.append(sao_stats_plane_core(
                rec, src.astype(jnp.int32), pic_w >> shift,
                pic_h >> shift, cs >> shift, classes=ncl, bo=use_bo))
        while len(stats) < 3:
            stats.append(stats[0])     # never read below tier 3
        type_, offs_, bpos_, eocl_ = sao_decide_core(stats, slice_qp,
                                                     sao_tier)
        dy_u8, dcb_u8, dcr_u8 = sao_apply_core(
            dy_u8, dcb_u8, dcr_u8, type_, offs_, bpos_, eocl_,
            True, sao_tier >= 3, pic_w, pic_h, cs)
        parts += [row(a) for a in (type_, offs_, bpos_, eocl_)]
    # recon + dense coefficients stay device-resident (DPB / lazy fetch /
    # sparse-cap fallback)
    return (jnp.concatenate(parts), dy_u8, dcb_u8, dcr_u8,
            coef_y, coef_cb, coef_cr)


code_inter_frame_jit = partial(
    jax.jit, static_argnames=(
        "has_l1", "sbh", "strong", "n_cu", "h8", "w8", "pic_w", "pic_h",
        "boff", "toff", "cbo", "cro", "sao", "cs", "deblock",
        "esc_cap", "slice_qp", "dqp", "wpp", "sao_tier"))(_inter_code_core)
