"""Decoder fast path for P/B pictures: host-side assembly around
ops/wavefront._recon_inter_filter_core.

The scalar decoder reconstructs inter pictures with a per-CU host walk
(MC + per-TU IDCT in numpy); for conformant streams inside the fast
path's coverage (TU == CU, PUs >= 8x8 per dimension — everything this
framework's own encoder emits, see slice_dec FastPathAbort gates) the
whole picture instead reconstructs in ONE device dispatch from the
parsed fields. Reference analog: the decoder's MC + recon stage of
CDecTaskManage (SURVEY.md 2.4) restructured as dense tensor passes.
"""

from __future__ import annotations

import numpy as np

from ..hevc.tables import chroma_qp


def _slot_tables(ref_lists):
    """Unique reference FrameStates -> plane-stack slot per list entry."""
    uniq = []
    slot_of = {}
    for lst in ref_lists:
        for rp in lst:
            if id(rp.fs) not in slot_of:
                slot_of[id(rp.fs)] = len(uniq)
                uniq.append(rp.fs)
    return uniq, slot_of


def _ref_stacks(uniq):
    """(refs_y, refs_cb, refs_cr) int32 device stacks; device-resident
    recon (a previous fast-path picture) stays on device."""
    import jax.numpy as jnp
    ys, cbs, crs = [], [], []
    for fs in uniq:
        dev = getattr(fs, "_dev_planes", None)
        if dev is not None and getattr(fs, "_planes_stale", False):
            ys.append(dev[0].astype(jnp.int32))
            cbs.append(dev[1].astype(jnp.int32))
            crs.append(dev[2].astype(jnp.int32))
        else:
            # COPY host planes: jnp.asarray aliases numpy zero-copy on
            # the CPU backend, and a reference frame can leave the DPB
            # and be RECYCLED (FrameState.reset refills these buffers)
            # while this picture's async dispatch still reads them
            ys.append(jnp.asarray(np.array(fs.y, np.int32)))
            cbs.append(jnp.asarray(np.array(fs.cb, np.int32)))
            crs.append(jnp.asarray(np.array(fs.cr, np.int32)))
    return (jnp.stack(ys), jnp.stack(cbs), jnp.stack(crs))


def _wp_tables(hdr, ref_lists, slot_of, nslots):
    """Explicit-WP tables per list in ops/mc._combine format, or None."""
    import jax.numpy as jnp
    if hdr.weights is None:
        return None, None
    flag = np.zeros((2, nslots, 3), bool)
    wgt = np.full((2, nslots, 3), 64, np.int32)
    off = np.zeros((2, nslots, 3), np.int32)
    for l in range(2):
        wl = hdr.weights[l] if l < len(hdr.weights) else []
        for i, trip in enumerate(wl):
            if i >= len(ref_lists[l]):
                break
            s = slot_of[id(ref_lists[l][i].fs)]
            for c in range(3):
                flag[l, s, c] = bool(trip[c].flag)
                wgt[l, s, c] = trip[c].weight
                off[l, s, c] = trip[c].offset
    lwd = np.array([hdr.luma_log2_weight_denom + 6,
                    hdr.chroma_log2_weight_denom + 6,
                    hdr.chroma_log2_weight_denom + 6], np.int32)
    w0 = tuple(jnp.asarray(a) for a in (flag[0], wgt[0], off[0], lwd))
    w1 = tuple(jnp.asarray(a) for a in (flag[1], wgt[1], off[1], lwd))
    return w0, w1


def _intra_segs_dec(coder, fs, sps, pps, hdr, log2m8, intra8):
    """Wavefront segments over the picture's intra cells (or None)."""
    import jax.numpy as jnp

    from ..encode.merge_vec import zscan_vals
    h8, w8 = fs.ph >> 3, fs.pw >> 3
    if not intra8.any():
        return None
    sched = coder.build_schedule(log2m8, sps.width, sps.height,
                                 sps.log2_ctb, sps.log2_min_cb)
    ox, oy, osz, olv, oal, oac, oat = sched
    sel = intra8[oy >> 3, ox >> 3]
    ox, oy, osz = ox[sel], oy[sel], osz[sel]
    oal, oac, oat = oal[sel], oac[sel], oat[sel]
    # levels: longest path over intra-only dependencies, walked in z order
    zv = zscan_vals(fs.ph >> 2, fs.pw >> 2, sps.log2_ctb)
    order = np.argsort(zv[oy >> 2, ox >> 2], kind="stable")
    lvl8 = np.full((h8, w8), -1, np.int32)
    zv8 = zv[::2, ::2]
    olv = np.zeros(len(ox), np.int32)
    for k in order:
        r, c = int(oy[k]) >> 3, int(ox[k]) >> 3
        n8 = int(osz[k]) >> 3
        m8 = 2 * n8
        lv = 0
        z0 = zv8[r, c]
        if c > 0:
            col = lvl8[r:min(r + m8, h8), c - 1]
            zc = zv8[r:min(r + m8, h8), c - 1]
            good = col[(col >= 0) & (zc < z0)]
            if len(good):
                lv = max(lv, int(good.max()) + 1)
        if r > 0:
            c1 = max(c - 1, 0)
            row = lvl8[r - 1, c1:min(c + m8, w8)]
            zr = zv8[r - 1, c1:min(c + m8, w8)]
            good = row[(row >= 0) & (zr < z0)]
            if len(good):
                lv = max(lv, int(good.max()) + 1)
        olv[k] = lv
        lvl8[r:r + n8, c:c + n8] = lv
    modes8 = np.where(intra8, fs.intra_mode[::2, ::2], 1).astype(np.int32)
    cmodes8 = np.asarray(fs.dec_cmode8, np.int32)
    qp_map8 = np.clip(fs.qp[::2, ::2], 0, 51).astype(np.int32)
    coder._cqp_cb = np.array(
        [chroma_qp(min(q + pps.cb_qp_offset + hdr.cb_qp_offset, 57))
         for q in range(64)], np.int32)
    coder._cqp_cr = np.array(
        [chroma_qp(min(q + pps.cr_qp_offset + hdr.cr_qp_offset, 57))
         for q in range(64)], np.int32)
    packed, _ = coder.pack((ox, oy, osz, olv, oal, oac, oat),
                           modes8, cmodes8, qp_map8, h8, w8)
    return tuple(
        tuple(tuple(jnp.asarray(a) for a in seg[size])
              for size in (8, 16, 32))
        for seg in packed)


def recon_inter_picture(wf_coder, fs, sps, pps, hdr, ref_lists,
                        sao_params, devctx):
    """One-dispatch reconstruction of a parse-only P/B picture.
    Returns device planes (y, cb, cr) uint8."""
    import jax.numpy as jnp

    from ..ops.wavefront import recon_inter_filter_jit
    from .filters import compute_bs
    h8, w8 = fs.ph >> 3, fs.pw >> 3
    parsed8 = fs.mi_parsed[::2, ::2]
    log2m8 = np.where(parsed8,
                      sps.log2_ctb - fs.cu_depth[::2, ::2].astype(np.int32),
                      3).astype(np.uint8)
    intra8 = parsed8 & (fs.pred_mode[::2, ::2] == 1)
    uniq, slot_of = _slot_tables(ref_lists)
    # per-8x8-cell motion (uniform per cell by the sub-8-PU parse gate)
    ref8 = fs.ref_idx[:, ::2, ::2]
    mv8 = fs.mv[:, ::2, ::2]
    slots = []
    for l in range(2):
        tab = np.array([slot_of[id(rp.fs)] for rp in ref_lists[l]] + [0],
                       np.int32)
        r = ref8[l].astype(np.int32)
        slots.append(np.where(r >= 0, tab[np.clip(r, 0, len(tab) - 1)],
                              -1))
    slot0, slot1 = slots
    # intra/unparsed cells predict garbage (overwritten); keep gathers
    # in range
    orphan = (slot0 < 0) & (slot1 < 0)
    slot0 = np.where(orphan, 0, slot0)
    has_l1 = bool((ref8[1] >= 0).any())
    inter_pix = np.repeat(np.repeat(
        parsed8 & (fs.pred_mode[::2, ::2] == 0), 8, 0), 8, 1)
    qp4 = np.clip(fs.qp, 0, 51).astype(np.int32)
    cqpb = np.array([chroma_qp(min(q + pps.cb_qp_offset
                                   + hdr.cb_qp_offset, 57))
                     for q in range(64)], np.int32)
    cqpr = np.array([chroma_qp(min(q + pps.cr_qp_offset
                                   + hdr.cr_qp_offset, 57))
                     for q in range(64)], np.int32)
    qp4_cb = cqpb[qp4][::2, ::2]
    qp4_cr = cqpr[qp4][::2, ::2]
    bs_v = compute_bs(fs, True)
    bs_h = compute_bs(fs, False)
    sao_on = bool(hdr.sao_luma or hdr.sao_chroma)
    with devctx:
        segs = _intra_segs_dec(wf_coder, fs, sps, pps, hdr, log2m8,
                               intra8)
        refs = _ref_stacks(uniq)
        wts0, wts1 = _wp_tables(hdr, ref_lists, slot_of, len(uniq))
        if sao_on and sao_params is not None:
            sp = tuple(jnp.asarray(a) for a in sao_params)
        else:
            sao_on = False
            sp = (jnp.zeros((3, 1, 1), jnp.int8),
                  jnp.zeros((3, 1, 1, 4), jnp.int8),
                  jnp.zeros((3, 1, 1), jnp.int8),
                  jnp.zeros((3, 1, 1), jnp.int8))
        planes = recon_inter_filter_jit(
            *refs,
            jnp.asarray(slot0.reshape(-1)),
            jnp.asarray(np.ascontiguousarray(mv8[0].reshape(-1, 2),
                                             np.int32)),
            jnp.asarray(slot1.reshape(-1)),
            jnp.asarray(np.ascontiguousarray(mv8[1].reshape(-1, 2),
                                             np.int32)),
            wts0, wts1,
            jnp.asarray(fs.dec_coef_y), jnp.asarray(fs.dec_coef_cb),
            jnp.asarray(fs.dec_coef_cr),
            jnp.asarray(log2m8), jnp.asarray(qp4),
            jnp.asarray(qp4_cb), jnp.asarray(qp4_cr),
            jnp.asarray(inter_pix),
            segs, jnp.asarray(bs_v), jnp.asarray(bs_h), sp,
            has_l1=has_l1, strong=bool(sps.strong_intra_smoothing),
            deblock=not bool(hdr.deblocking_filter_disabled),
            sao=sao_on, sao_chroma=bool(hdr.sao_chroma),
            boff=hdr.beta_offset_div2, toff=hdr.tc_offset_div2,
            cbo=pps.cb_qp_offset, cro=pps.cr_qp_offset,
            width=sps.width, height=sps.height, cs=sps.ctb_size)
    return planes
