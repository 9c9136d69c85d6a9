"""Device inter-frame engine: host orchestration of the batched P/B coding
path (ops/interdecide + ops/intercode + encode/merge_vec).

Pipeline per frame (the reference's per-CTU P/B hot loop
CCtuEnc::processOneCtu, SURVEY.md 3.2, restructured TPU-first):
  1. pre-analysis (existing): dense ME fields + batched intra analysis
  2. approximate merge candidate lists from the ME field (merge_vec)
  3. device decision dispatches per CU tier (8/16/32): merge vs ME vs
     intra by rough-RD (real transform+quant); 64-tier zero-residual probe
  4. host map assembly (vectorized): CU pyramid, final motion, TU packs
  5. ONE device coding dispatch: MC + residual chain + zero-forcing +
     seeded intra wavefront + BS build + deblock + SAO stats
  6. vectorized syntax mapping on the FINAL field: true merge lists /
     AMVP (merge_vec) -> merge_idx or mvd syntax, skip conversion.
The per-CU host walk of rounds 1-2 (encode/inter_frame.py) remains the
fallback for configurations the engine does not cover yet (AMP/partitions,
inter TU split, AQ/cutree, tiles/slices, PCM, noise reduction).
"""

from __future__ import annotations

import numpy as np

from ..hevc.tables import chroma_qp
from .merge_vec import (REC, RefCtx, amvp_vec, field_from_fs,
                        merge_lists_vec, zscan_vals)

_ZVAL_CACHE: dict = {}


def _zvals(h4, w4, log2_ctb):
    key = (h4, w4, log2_ctb)
    z = _ZVAL_CACHE.get(key)
    if z is None:
        z = zscan_vals(h4, w4, log2_ctb)
        _ZVAL_CACHE[key] = z
    return z


def _pad_pow2(n, lo=64):
    v = lo
    while v < max(n, 1):
        v *= 2
    return v


def _grid_origins(w, h, n):
    nbx, nby = w // n, h // n
    bx, by = np.meshgrid(np.arange(nbx), np.arange(nby))
    return (bx.reshape(-1) * n).astype(np.int32), \
        (by.reshape(-1) * n).astype(np.int32), nby, nbx


def _mvd_bits(d):
    """Exact mvd_coding bin count per component (spec 7.3.8.9): gt0/gt1
    ctx bins + EG1 bypass remainder + sign. d = |mvd| (any shape)."""
    d = np.abs(d).astype(np.int64)
    m = np.maximum(d - 2, 0) // 2 + 1
    eg1 = 2 * (np.floor(np.log2(np.maximum(m, 1))).astype(np.int64)) + 2
    return np.where(d == 0, 1.0,
                    np.where(d == 1, 3.0, 3.0 + eg1)).astype(np.float32)


def _me_bits_est(mv, pred):
    """AMVP syntax rate for an ME record: true mvd bin counts against the
    predictor proxy + mvp flag (the old 2*log2 curve underpriced large
    motion and overpriced small — the CBitCounterRough shape, now with
    the real binarization)."""
    d = mv.astype(np.int64) - pred.astype(np.int64)
    return 1.0 + _mvd_bits(d[..., 0]) + _mvd_bits(d[..., 1])


class _Maps:
    """Final per-frame decision maps (list-domain motion, 8-cell grid)."""

    def __init__(self, h8, w8):
        self.log2m = np.full((h8, w8), 3, np.uint8)
        self.pmode = np.zeros((h8, w8), np.uint8)       # 0 inter, 1 intra
        self.ref = np.full((2, h8, w8), -1, np.int8)
        self.mv = np.zeros((2, h8, w8, 2), np.int32)
        self.tiers = {}


# ----------------------------------------------------- lean pre-analysis

def _device_inputs(enc):
    """Upload the source ONCE and build the unique-reference device
    stacks from the device DPB (references live on device: the coding
    dispatch put them there — round-3 re-uploaded every ref every frame
    over the tunnel). Sets enc._src_dev, enc._refs_dev, enc._slot_of."""
    import jax.numpy as jnp

    if getattr(enc, "_src_dev", None) is None:
        enc._src_dev = tuple(
            jnp.asarray(a.astype(np.uint8))
            for a in (enc.src_y, enc.src_cb, enc.src_cr))
    if getattr(enc, "_refs_dev", None) is None:
        uniq, slot_of = [], {}
        for lst in enc.ref_lists:
            for rp in lst:
                if id(rp.fs) not in slot_of:
                    slot_of[id(rp.fs)] = len(uniq)
                    uniq.append(rp)
        dpb = getattr(enc, "dev_dpb", None)
        if dpb is not None:
            from .devdpb import stack_refs
            enc._refs_dev = stack_refs(dpb, uniq)
        else:
            enc._refs_dev = (
                jnp.asarray(np.stack([np.asarray(rp.fs.planes()[0],
                                                 np.uint8)
                                      for rp in uniq])),
                jnp.asarray(np.stack([np.asarray(rp.fs.planes()[1],
                                                 np.uint8)
                                      for rp in uniq])),
                jnp.asarray(np.stack([np.asarray(rp.fs.planes()[2],
                                                 np.uint8)
                                      for rp in uniq])))
        enc._slot_of = slot_of
        enc._uniq = uniq
    return enc._src_dev, enc._refs_dev, enc._slot_of


def engine_pre_analysis(enc) -> None:
    """ME + intra analysis for the device engine: ONE hierarchical 8-tier
    search per reference (the 16/32-tier ME candidates are synthesized
    from the best child, then judged properly by the device rough-RD
    arbitration) — replaces the 4-searches-per-ref pre-pass whose dense
    16-tier grid dominated the profile."""
    import jax.numpy as jnp

    from ..ops.me2 import me_fused
    from .intra_frame import decide_frame

    from ..utils.trace import stage
    enc._apply_lam_scale()
    with stage("inter.upload_inputs"):
        src_dev, refs_dev, slot_of = _device_inputs(enc)
    with stage("inter.intra_decide"):
        (_, enc.mode16, _, _, _, enc.mode8, enc.cmode8, enc.cmode16,
         _, enc.icost8, enc.icost16, enc.mode4, enc.nxn8) = decide_frame(
            src_dev[0], src_dev[1], src_dev[2], enc.qp,
            effort=getattr(enc, "decide_effort", 1))
    sps = enc.sps
    pw, ph = sps.width, sps.height
    merange = int(getattr(enc, "merange", 12))
    lam8 = 0.5 * enc.lam_satd
    is_b = enc.hdr.slice_type == 0 and len(enc.ref_lists[1]) > 0

    if is_b:
        rp0, rp1 = enc.ref_lists[0][0], enc.ref_lists[1][0]
        sl = jnp.asarray([slot_of[id(rp0.fs)], slot_of[id(rp1.fs)]])
        with stage("inter.me_fused"):
            mv_q, cost, dir8, sad8 = me_fused(
                src_dev[0], refs_dev[0][sl], merange, lam8, pw, ph,
                bi=True)
            enc.dir8 = np.asarray(dir8)
            enc.sad8 = np.asarray(sad8)
        enc.mv0q8, enc.mv1q8 = mv_q[0], mv_q[1]
        # 16-tier ME record = min-cost child's motion
        enc.dir16, enc.mv0q, enc.mv1q, enc.sad16 = _child_min_b(
            enc.dir8, mv_q[0], mv_q[1], enc.sad8)
    else:
        sl = jnp.asarray([slot_of[id(rp.fs)] for rp in enc.ref_lists[0]])
        with stage("inter.me_fused"):
            mv_q, cost = me_fused(src_dev[0], refs_dev[0][sl],
                                  merange, lam8, pw, ph, bi=False)
        c = cost + enc.lam_satd * 2.0 * np.arange(
            len(enc.ref_lists[0]), dtype=np.float32)[:, None, None]
        ri = np.argmin(c, axis=0)
        enc.ref8 = ri.astype(np.int8)
        enc.mv8 = np.take_along_axis(
            mv_q, ri[None, :, :, None], axis=0)[0]
        enc.sad8 = np.take_along_axis(cost, ri[None], axis=0)[0]
        enc.mv16, enc.ref16, enc.sad16 = _child_min_p(
            enc.mv8, enc.ref8, enc.sad8)
    enc.frame_cplx = float(enc.sad16.sum())


def _child_min_p(mv8, ref8, sad8):
    nby, nbx = sad8.shape[0] // 2, sad8.shape[1] // 2
    s = sad8[:nby * 2, :nbx * 2].reshape(nby, 2, nbx, 2) \
        .transpose(0, 2, 1, 3).reshape(nby, nbx, 4)
    ci = np.argmin(s, axis=2)
    cy = np.arange(nby)[:, None] * 2 + (ci >> 1)
    cx = np.arange(nbx)[None, :] * 2 + (ci & 1)
    return mv8[cy, cx], ref8[cy, cx], s.sum(axis=2)


def _child_min_b(dir8, mv0_8, mv1_8, sad8):
    nby, nbx = sad8.shape[0] // 2, sad8.shape[1] // 2
    s = sad8[:nby * 2, :nbx * 2].reshape(nby, 2, nbx, 2) \
        .transpose(0, 2, 1, 3).reshape(nby, nbx, 4)
    ci = np.argmin(s, axis=2)
    cy = np.arange(nby)[:, None] * 2 + (ci >> 1)
    cx = np.arange(nbx)[None, :] * 2 + (ci & 1)
    return (dir8[cy, cx], mv0_8[cy, cx], mv1_8[cy, cx], s.sum(axis=2))


# =========================================================== main entry

def run_engine(enc) -> None:
    """Fill enc.fs + enc.syn for one P/B frame using the device path.
    `enc` is a PFrameEncoder/BFrameEncoder whose _pre_analyze has run
    (ME fields + intra decision maps present)."""
    import jax.numpy as jnp

    from ..ops.interdecide import decide_tiers_fused_jit

    fs, sps, pps, hdr = enc.fs, enc.sps, enc.pps, enc.hdr
    cfg_w, cfg_h = sps.width, sps.height
    ph, pw = fs.ph, fs.pw
    h8, w8 = ph >> 3, pw >> 3
    h4, w4 = ph >> 2, pw >> 2
    ref_lists = enc.ref_lists
    is_b = hdr.slice_type == 0 and len(ref_lists[1]) > 0
    qp, qp_cb, qp_cr = enc.qp, enc.qp_cb, enc.qp_cr
    lam, lam_satd = float(enc.lam), float(enc.lam_satd)
    # per-8-cell QP map (AQ/cutree per-CTU offsets land here) + lambda
    # lookup tables in the same scale the scalar path uses
    qp_map8 = enc._qp_map8((h8, w8)).astype(np.int32)
    sc = getattr(enc, "lam_scale", 1.0)
    lam_tab = (0.85 * sc * 2.0 ** ((np.arange(64) - 12) / 3.0)) \
        .astype(np.float32)
    lams_tab = np.sqrt(lam_tab).astype(np.float32)
    cqpb_tab = np.array(
        [chroma_qp(min(q + pps.cb_qp_offset + hdr.cb_qp_offset, 57))
         for q in range(64)], np.int32)
    cqpr_tab = np.array(
        [chroma_qp(min(q + pps.cr_qp_offset + hdr.cr_qp_offset, 57))
         for q in range(64)], np.int32)
    enc._qp_tabs = (qp_map8, lam_tab, lams_tab, cqpb_tab, cqpr_tab)

    # ------------------------------------- device inputs (pre-uploaded)
    jsrc, jr, slot_of = _device_inputs(enc)
    uniq = enc._uniq
    sl = [np.array([slot_of[id(rp.fs)] for rp in ref_lists[l]] + [0],
                   np.int32) for l in range(2)]          # +sentinel

    def to_slot(l, r):
        r = np.asarray(r)
        return np.where(r >= 0, sl[l][np.clip(r, 0, len(sl[l]) - 1)],
                        -1).astype(np.int32)

    # ------------------------------------------------- approximate field
    if is_b:
        d8 = enc.dir8
        r0 = np.where(np.isin(d8, (0, 2)), 0, -1).astype(np.int8)
        r1 = np.where(np.isin(d8, (1, 2)), 0, -1).astype(np.int8)
        mv0_8, mv1_8 = enc.mv0q8, enc.mv1q8
    else:
        r0 = enc.ref8.astype(np.int8)
        r1 = np.full_like(r0, -1)
        mv0_8, mv1_8 = enc.mv8, np.zeros_like(enc.mv8)
    afield = dict(mv=np.zeros((2, h4, w4, 2), np.int32),
                  ref=np.full((2, h4, w4), -1, np.int8),
                  inter=np.ones((h4, w4), bool))

    def put4(dst, src):
        s = np.repeat(np.repeat(src, 2, 0), 2, 1)
        dst[:s.shape[0], :s.shape[1]] = s[:dst.shape[0], :dst.shape[1]]

    put4(afield["ref"][0], r0)
    put4(afield["ref"][1], r1)
    put4(afield["mv"][0], np.where((r0 >= 0)[..., None], mv0_8, 0))
    put4(afield["mv"][1], np.where((r1 >= 0)[..., None], mv1_8, 0))

    zv = _zvals(h4, w4, sps.log2_ctb)
    region4 = np.zeros((h4, w4), np.int64)
    col_pic = None
    if hdr.temporal_mvp_enabled:
        lstc = 0 if hdr.collocated_from_l0 else 1
        if hdr.collocated_ref_idx < len(ref_lists[lstc]):
            col_pic = ref_lists[lstc][hdr.collocated_ref_idx]
    ctx = RefCtx(ref_lists, hdr, sps, col_pic)

    # --------------------------------------------------- per-tier decide
    def me_rec_tier(n):
        """(r0, mv0, r1, mv1, bits) ME records for tier n, list domain."""
        if n == 8:
            rr0, rr1, m0, m1 = r0, r1, mv0_8, mv1_8
        else:
            if is_b:
                d16 = enc.dir16
                rr0 = np.where(np.isin(d16, (0, 2)), 0, -1)
                rr1 = np.where(np.isin(d16, (1, 2)), 0, -1)
                m0, m1 = enc.mv0q, enc.mv1q
            else:
                rr0 = enc.ref16
                rr1 = np.full_like(rr0, -1)
                m0, m1 = enc.mv16, np.zeros_like(enc.mv16)
        from .inter_frame import mv_pred_field
        bits = np.full(rr0.shape, 3.0, np.float32)
        for rr, mm in ((rr0, m0), (rr1, m1)):
            u = rr >= 0
            bits = bits + np.where(u, _me_bits_est(mm, mv_pred_field(mm))
                                   + 2.0 * np.maximum(rr, 0), 0.0)
        nbx, nby = cfg_w // n, cfg_h // n
        if n == 32:
            s16 = enc.sad16[:nby * 2, :nbx * 2].reshape(nby, 2, nbx, 2)
            flat = s16.transpose(0, 2, 1, 3).reshape(nby, nbx, 4)
            ci = np.argmin(flat, axis=2)
            cy2 = np.arange(nby)[:, None] * 2 + (ci >> 1)
            cx2 = np.arange(nbx)[None, :] * 2 + (ci & 1)
            rr0, rr1 = rr0[cy2, cx2], rr1[cy2, cx2]
            m0, m1 = m0[cy2, cx2], m1[cy2, cx2]
            bits = bits[cy2, cx2]

        def crop(a):
            return a[:nby, :nbx].reshape(-1, *a.shape[2:])

        return (crop(rr0).astype(np.int32), crop(m0).astype(np.int32),
                crop(rr1).astype(np.int32), crop(m1).astype(np.int32),
                crop(bits))

    # ---- 8-tier pruning (goDownJudge analog): the dense 8-tier decide
    # is ~70% of the fused dispatch's work (14400 blocks at 720p) but
    # most 16-blocks never split. Evaluate only the top quarter of
    # 16-blocks by split-gain score (ME SAD drop of independent children
    # + intra cost drop), children of the rest inherit "don't split".
    # The subset size is STATIC (B16//4) so the dispatch compiles once.
    def _split_subset():
        nby16, nbx16 = cfg_h // 16, cfg_w // 16
        s16 = enc.sad16[:nby16, :nbx16].astype(np.float64)
        s8 = enc.sad8[:nby16 * 2, :nbx16 * 2].astype(np.float64)
        c8sum = s8.reshape(nby16, 2, nbx16, 2).sum(axis=(1, 3))
        gain = s16 - c8sum
        i16 = enc.icost16[:nby16, :nbx16].astype(np.float64)
        i8 = enc.icost8[:nby16 * 2, :nbx16 * 2].astype(np.float64)
        i8sum = i8.reshape(nby16, 2, nbx16, 2).sum(axis=(1, 3))
        score = np.maximum(gain, 0) + np.maximum(i16 - i8sum, 0)
        B16 = nby16 * nbx16
        k16 = max(1, B16 // 4)
        sel16 = np.argsort(-score.reshape(-1), kind="stable")[:k16]
        r16, c16 = sel16 // nbx16, sel16 % nbx16
        # children 8-block flat indices in the 8-grid raster
        nbx8 = cfg_w // 8
        base = (r16 * 2)[:, None] * nbx8 + (c16 * 2)[:, None]
        off = np.array([0, 1, nbx8, nbx8 + 1])
        return np.sort((base + off[None, :]).reshape(-1))

    idx8 = _split_subset()

    def tier_prep(n, me_rec=None, icost=None, zero_only=False,
                  subset=None):
        """Host prep of one tier's decide inputs: merge candidates from
        the approximate field + ME record + intra cost, returned as a
        dict holding the traced-arg tuple for the FUSED decide dispatch.
        With `subset` (flat indices into the full tier grid) only those
        blocks are evaluated; the rest scatter back as 'never chosen'."""
        xs, ys, nby, nbx = _grid_origins(cfg_w, cfg_h, n)
        B_full = len(xs)
        if subset is not None:
            xs, ys = xs[subset], ys[subset]
            if me_rec is not None:
                me_rec = tuple(a[subset] for a in me_rec)
            if icost is not None:
                icost = icost[subset]
        B = len(xs)
        cands = merge_lists_vec(afield, ctx, xs, ys, n, zv, region4,
                                cfg_w, cfg_h)            # (B, C, REC)
        C = cands.shape[1]
        cs0 = to_slot(0, cands[:, :, 0].T)
        cs1 = to_slot(1, cands[:, :, 1].T)
        cmv0 = np.ascontiguousarray(
            cands[:, :, 2:4].transpose(1, 0, 2)).astype(np.int32)
        cmv1 = np.ascontiguousarray(
            cands[:, :, 4:6].transpose(1, 0, 2)).astype(np.int32)
        cvalid = (cs0 >= 0) | (cs1 >= 0)
        for j in range(1, C):           # duplicate records never win
            cvalid[j] &= ~(cands[:, :j] == cands[:, j:j + 1]).all(2).any(1)
        qpb = qp_map8[ys >> 3, xs >> 3]
        if zero_only:
            zi = np.full(B, -1, np.int32)
            zm = np.zeros((B, 2), np.int32)
            ms0j, mmv0, ms1j, mmv1 = zi, zm, zi, zm
            me_bits = np.zeros(B, np.float32)
            icost = np.full(B, np.inf, np.float32)
            me = None
        else:
            ms0, mmv0, ms1, mmv1, me_bits = me_rec
            ms0j, ms1j = to_slot(0, ms0), to_slot(1, ms1)
            me = (ms0, mmv0, ms1, mmv1)
        # narrow dtypes for the H2D upload (the tunnel moves ~20-50 MB/s;
        # the full-int32 tier args were ~2 MB/frame/iteration): mv fits
        # int16 (quarter-pel, |mv| << 2^15 at any legal pic size), slots
        # and qp fit int8. _tier_core upcasts on device.
        args = tuple(jnp.asarray(a) for a in (
            np.asarray(xs, np.int32), np.asarray(ys, np.int32),
            np.asarray(cs0, np.int8), np.asarray(cmv0, np.int16),
            np.asarray(cs1, np.int8), np.asarray(cmv1, np.int16),
            cvalid,
            np.asarray(ms0j, np.int8), np.asarray(mmv0, np.int16),
            np.asarray(ms1j, np.int8), np.asarray(mmv1, np.int16),
            np.asarray(me_bits, np.float32),
            np.asarray(icost, np.float32),
            np.asarray(qpb, np.int8), np.asarray(cqpb_tab[qpb], np.int8),
            np.asarray(cqpr_tab[qpb], np.int8),
            lam_tab[qpb], lams_tab[qpb]))
        return dict(xs=xs, ys=ys, nby=nby, nbx=nbx, cands=cands,
                    me=me, args=args, n=n, zero_only=zero_only, B=B,
                    subset=subset, B_full=B_full)

    def decide_fused(tiers):
        """ONE device dispatch for every tier's decision + one packed
        fetch (per-tier dispatches paid ~30 ms link round-trip each)."""
        from ..utils.trace import stage
        meta = tuple((t["n"], t["zero_only"]) for t in tiers)
        with stage("inter.decide_fused"):
            buf = np.asarray(decide_tiers_fused_jit(
                *jsrc, *jr, tuple(t["args"] for t in tiers), meta=meta,
                pic_w=cfg_w, pic_h=cfg_h, has_l1=is_b))
        off = 0

        def take(dt, nel):
            nonlocal off
            a = np.frombuffer(buf, dt, nel, off)
            off += nel * np.dtype(dt).itemsize
            return a

        for t in tiers:
            B = t["B"]
            if t["zero_only"]:
                t["has_zero"] = take(np.uint8, B).astype(bool)
                t["zidx"] = take(np.uint8, B).astype(np.int32)
            else:
                t["choice"] = take(np.uint8, B).astype(np.int8)
                t["bidx"] = take(np.uint8, B).astype(np.int64)
                t["cost"] = take(np.float32, B).copy()
            if t["subset"] is not None:
                _scatter_subset(t, cfg_w, cfg_h)
        assert off == buf.size, (off, buf.size)
        return tiers

    def crop_cost(a, n):
        return a[:cfg_h // n, :cfg_w // n].astype(np.float32).reshape(-1)

    # Two decision iterations: round 1 derives merge candidates from the
    # ME field; round 2 re-derives them from round 1's DECIDED field —
    # converging toward the true lists the syntax pass will derive (the
    # parallel analog of the sequential walk's skip/merge bootstrap:
    # early-CU skips make later CUs' candidates zero-ish and cheap).
    maps = None
    # decision iterations: round 2 re-derives merge candidates from
    # round 1's decided field (the skip/merge bootstrap analog). The
    # ladder keeps 2 for medium+; fast tiers accept round-1 decisions
    # (KS265_DECIDE_ITERS overrides for experiments).
    import os as _os
    n_iters = int(_os.environ.get("KS265_DECIDE_ITERS", 0) or
                  getattr(enc, "decide_iters", 2))
    for _ in range(n_iters):
        from ..utils.trace import stage as _stage
        with _stage("inter.tier_prep"):
            tiers = [tier_prep(8, me_rec_tier(8), crop_cost(enc.icost8, 8),
                               subset=idx8),
                     tier_prep(16, me_rec_tier(16),
                               crop_cost(enc.icost16, 16))]
        if cfg_w >= 32 and cfg_h >= 32:
            tiers.append(tier_prep(
                32, me_rec_tier(32),
                np.full((cfg_h // 32) * (cfg_w // 32), np.inf,
                        np.float32)))
        if cfg_w >= 64 and cfg_h >= 64:
            tiers.append(tier_prep(64, zero_only=True))
        decide_fused(tiers)
        t8, t16 = tiers[0], tiers[1]
        t32 = tiers[2] if len(tiers) > 2 else None
        t64 = tiers[3] if len(tiers) > 3 else None
        from ..utils.trace import stage as _stage
        with _stage("inter.assemble_maps"):
            maps = _assemble_maps(enc, t8, t16, t32, t64, h8, w8)
        # decided field -> next iteration's candidate source
        afield = dict(
            mv=np.stack([np.repeat(np.repeat(maps.mv[l], 2, 0), 2, 1)
                         for l in range(2)]),
            ref=np.stack([np.repeat(np.repeat(maps.ref[l], 2, 0), 2, 1)
                          for l in range(2)]),
            inter=np.repeat(np.repeat(maps.pmode == 0, 2, 0), 2, 1))
    # snap merge-decided CUs onto their TRUE candidate lists: parallel
    # decisions never converge pointwise (each CU's list depends on its
    # neighbors' final motion), and an unmatched merge degrades to AMVP
    # syntax whose mvd+ref bits dominate cheap B frames. Snapping to the
    # nearest compatible candidate recovers the sequential walk's
    # merge/skip density; the coding pass re-evaluates residuals after.
    _snap_merges(enc, maps, ctx, zv, region4, jr, jsrc, to_slot, is_b)
    from ..utils.trace import stage as _stage0
    with _stage0("inter.dispatch_coding_total"):
        rec_dev, coeffs, sao_arrays = _dispatch_coding(
            enc, maps, jr, jsrc, to_slot, slot_of, is_b)
    from ..utils.trace import stage as _stage
    with _stage("inter.fill_map_syntax"):
        _fill_and_map_syntax(enc, maps, coeffs, ctx, zv, region4)
    # final reconstruction (deblocked + SAO'd on device) stays on device:
    # it is the next frames' reference picture and the host only reads it
    # lazily (recon consumer, PSNR, fallback paths)
    enc.fs.attach_device_planes(rec_dev)
    enc.device_post = dict(deblocked=not pps.deblocking_filter_disabled,
                           sao_arrays=sao_arrays, recon_dev=rec_dev,
                           sao_applied=True)


def _scatter_subset(t, cfg_w, cfg_h):
    """Expand a subset-evaluated tier back to the full grid: unevaluated
    blocks carry infinite cost (never chosen by the split arbitration)."""
    n = t["n"]
    xs, ys, nby, nbx = _grid_origins(cfg_w, cfg_h, n)
    B = len(xs)
    sub = t["subset"]
    cands = np.zeros((B,) + t["cands"].shape[1:], t["cands"].dtype)
    cands[:, :, 0:2] = -1
    cands[sub] = t["cands"]
    choice = np.full(B, 2, np.int8)
    choice[sub] = t["choice"]
    bidx = np.zeros(B, np.int64)
    bidx[sub] = t["bidx"]
    cost = np.full(B, np.inf, np.float32)
    cost[sub] = t["cost"]
    me = t["me"]
    if me is not None:
        ms0 = np.full(B, -1, np.int32)
        ms1 = np.full(B, -1, np.int32)
        mmv0 = np.zeros((B, 2), np.int32)
        mmv1 = np.zeros((B, 2), np.int32)
        ms0[sub], mmv0[sub], ms1[sub], mmv1[sub] = me
        me = (ms0, mmv0, ms1, mmv1)
    t.update(xs=xs, ys=ys, nby=nby, nbx=nbx, cands=cands, choice=choice,
             bidx=bidx, cost=cost, me=me, B=B, subset=None)


# ===================================================== merge snapping

def _snap_merges(enc, maps, ctx, zv, region4, jr, jsrc, to_slot, is_b,
                 rounds: int = 3) -> None:
    """Iteratively re-select each merge-decided CU's motion from its TRUE
    candidate list by real luma SAD (the sequential walk's merge
    evaluation, batched), keeping the decided motion as AMVP when it
    beats every candidate. 64-tier CUs are left alone: their
    zero-residual guarantee was verified for the decided motion."""
    import jax.numpy as jnp

    from ..ops.interdecide import snap_sads_fused_jit

    sps = enc.sps
    cfg_w, cfg_h = sps.width, sps.height
    qp_map8, lam_tab, lams_tab, _, _ = enc._qp_tabs
    for _ in range(rounds):
        field = dict(
            mv=np.stack([np.repeat(np.repeat(maps.mv[l], 2, 0), 2, 1)
                         for l in range(2)]),
            ref=np.stack([np.repeat(np.repeat(maps.ref[l], 2, 0), 2, 1)
                          for l in range(2)]),
            inter=np.repeat(np.repeat(maps.pmode == 0, 2, 0), 2, 1))
        # ---- host prep for every tier, then ONE fused SAD dispatch
        prep = []
        for key, (t, act, n) in maps.tiers.items():
            if n == 64:
                continue
            a = act.reshape(-1)
            ch = t.get("choice")
            sel = a & (ch == 0)
            idxs = np.nonzero(sel)[0]
            if len(idxs) == 0:
                continue
            xs, ys = t["xs"][idxs], t["ys"][idxs]
            c8, r8 = xs >> 3, ys >> 3
            rec = np.stack(
                [maps.ref[0][r8, c8], maps.ref[1][r8, c8],
                 maps.mv[0][r8, c8, 0], maps.mv[0][r8, c8, 1],
                 maps.mv[1][r8, c8, 0], maps.mv[1][r8, c8, 1]],
                1).astype(np.int32)
            lists = merge_lists_vec(field, ctx, xs, ys, n, zv, region4,
                                    cfg_w, cfg_h)
            exact = (lists == rec[:, None, :]).all(2).any(1)
            um = np.nonzero(~exact)[0]
            if len(um) == 0:
                continue
            # evaluate true candidates + the decided motion by real SAD
            # (device batch, padded to pow2 to bound compile variants)
            K = _pad_pow2(len(um), 32)
            pd = lambda a2, f=0: np.concatenate(
                [a2, np.full((K - len(a2),) + a2.shape[1:], f, a2.dtype)])
            xs_u, ys_u = pd(xs[um]), pd(ys[um])
            lu = pd(lists[um])
            ru = pd(rec[um])
            allrec = np.concatenate([lu, ru[:, None, :]], 1)  # (K, C+1, 6)
            cs0 = to_slot(0, allrec[:, :, 0].T).astype(np.int8)
            cs1 = to_slot(1, allrec[:, :, 1].T).astype(np.int8)
            cmv0 = np.ascontiguousarray(
                allrec[:, :, 2:4].transpose(1, 0, 2)).astype(np.int16)
            cmv1 = np.ascontiguousarray(
                allrec[:, :, 4:6].transpose(1, 0, 2)).astype(np.int16)
            args = tuple(jnp.asarray(v) for v in
                         (xs_u, ys_u, cs0, cmv0, cs1, cmv1))
            prep.append(dict(n=n, K=K, C1=allrec.shape[1], xs=xs, ys=ys,
                             r8=r8, c8=c8, um=um, lists=lists,
                             cs0=cs0, cs1=cs1, args=args))
        if not prep:
            break
        meta = tuple(p["n"] for p in prep)
        from ..utils.trace import stage
        with stage("inter.snap_sads"):
            buf = np.asarray(snap_sads_fused_jit(
                jsrc[0], jr[0], tuple(p["args"] for p in prep), meta=meta,
                pic_w=cfg_w, pic_h=cfg_h, has_l1=is_b))
        off = 0
        changed = False
        for p in prep:
            nel = p["C1"] * p["K"]
            sads = np.frombuffer(buf, np.float32, nel, off) \
                .reshape(p["C1"], p["K"])[:, :len(p["um"])]
            off += nel * 4
            um, lists, xs, ys = p["um"], p["lists"], p["xs"], p["ys"]
            r8, c8, n = p["r8"], p["c8"], p["n"]
            lam_s = lams_tab[qp_map8[ys[um] >> 3, xs[um] >> 3]]
            C = lists.shape[1]
            csel = sads[:C] + lam_s[None, :] * (
                2.0 + np.arange(C, dtype=np.float32)[:, None])
            cvalid = (p["cs0"][:C, :len(um)] >= 0) \
                | (p["cs1"][:C, :len(um)] >= 0)
            csel = np.where(cvalid, csel, np.inf)
            best = np.argmin(csel, 0)
            best_cost = csel[best, np.arange(len(um))]
            # keeping the decided motion costs AMVP syntax (~12 bins)
            keep_cost = sads[C] + lam_s * 12.0
            snap = best_cost <= keep_cost
            nrec = lists[um, best]
            nn = n >> 3
            for j in np.nonzero(snap)[0]:
                k = um[j]
                rr, cc = r8[k], c8[k]
                for l in range(2):
                    maps.ref[l][rr:rr + nn, cc:cc + nn] = nrec[j, l]
                    maps.mv[l][rr:rr + nn, cc:cc + nn, 0] = \
                        nrec[j, 2 + 2 * l]
                    maps.mv[l][rr:rr + nn, cc:cc + nn, 1] = \
                        nrec[j, 3 + 2 * l]
                changed = True
        assert off == buf.size, (off, buf.size)
        if not changed:
            break


# ======================================================= map assembly

def _chosen_rec(t):
    """(B, REC) chosen motion records (list domain) per tier block."""
    B = len(t["xs"])
    bidx = np.arange(B)
    mrec = t["cands"][bidx, t["bidx"]]
    ms0, mmv0, ms1, mmv1 = t["me"]
    merec = np.stack([ms0, ms1,
                      mmv0[:, 0] * (ms0 >= 0), mmv0[:, 1] * (ms0 >= 0),
                      mmv1[:, 0] * (ms1 >= 0), mmv1[:, 1] * (ms1 >= 0)],
                     1).astype(np.int32)
    return np.where((t["choice"] == 0)[:, None], mrec, merec)


def _assemble_maps(enc, t8, t16, t32, t64, h8, w8):
    """Tier arbitration (rough-RD pyramid argmin) + final map assembly."""
    sps = enc.sps
    cfg_w, cfg_h = sps.width, sps.height
    lam = float(enc.lam)
    maps = _Maps(h8, w8)

    rec8, rec16 = _chosen_rec(t8), _chosen_rec(t16)
    nby8, nbx8 = t8["nby"], t8["nbx"]
    nby16, nbx16 = t16["nby"], t16["nbx"]
    c8 = t8["cost"].reshape(nby8, nbx8)
    c16 = t16["cost"].reshape(nby16, nbx16)
    c8sum = c8[:nby16 * 2, :nbx16 * 2].reshape(nby16, 2, nbx16, 2) \
        .sum(axis=(1, 3))
    # goDown/goUpJudge analog in true D+lambda*R units: children pay 3
    # extra CU headers (~20 rough bits)
    split16 = (c8sum + lam * 20.0) < c16
    cost16f = np.minimum(c16, c8sum + lam * 20.0)
    use32, rec32 = None, None
    if t32 is not None:
        nby32, nbx32 = t32["nby"], t32["nbx"]
        rec32 = _chosen_rec(t32)
        c32 = t32["cost"].reshape(nby32, nbx32)
        c16s = cost16f[:nby32 * 2, :nbx32 * 2] \
            .reshape(nby32, 2, nbx32, 2).sum(axis=(1, 3))
        use32 = (c32 < c16s + lam * 12.0) & (t32["choice"] != 2) \
            .reshape(nby32, nbx32)
    skip64 = None
    if t64 is not None:
        skip64 = t64["has_zero"].reshape(t64["nby"], t64["nbx"])

    def up8(a, n, fill=False):
        """Tier grid -> (h8, w8) 8-cell mask/value."""
        nn = n >> 3
        out = np.zeros((h8, w8), a.dtype)
        r = np.repeat(np.repeat(a, nn, 0), nn, 1)
        out[:r.shape[0], :r.shape[1]] = r
        return out

    def pad_to(a, shape):
        """Pad (False) / crop a coarser-tier upsampled mask to a finer
        tier's grid (the fine grid may extend past the coarse one when
        the picture size is not a multiple of the coarse CU)."""
        out = np.zeros(shape, a.dtype)
        hh, ww = min(a.shape[0], shape[0]), min(a.shape[1], shape[1])
        out[:hh, :ww] = a[:hh, :ww]
        return out

    # resolve the pyramid: 64 > 32 > 16 > split-8
    act16 = np.ones((nby16, nbx16), bool)
    if use32 is not None:
        act16 &= ~pad_to(np.repeat(np.repeat(use32, 2, 0), 2, 1),
                         (nby16, nbx16))
    act32 = use32.copy() if use32 is not None else None
    if skip64 is not None and skip64.any():
        act16 &= ~pad_to(np.repeat(np.repeat(skip64, 4, 0), 4, 1),
                         (nby16, nbx16))
        if act32 is not None:
            act32 &= ~pad_to(np.repeat(np.repeat(skip64, 2, 0), 2, 1),
                             act32.shape)
    sp = act16 & split16
    act16 = act16 & ~sp
    # 8-cells beyond the 16-tier's coverage (coded dims not a multiple of
    # 16 — cannot happen with the current 16-aligned SPS, but kept safe)
    # are always 8-tier CUs
    act8 = np.ones((nby8, nbx8), bool)
    r8 = np.repeat(np.repeat(sp, 2, 0), 2, 1)
    act8[:min(r8.shape[0], nby8), :min(r8.shape[1], nbx8)] = \
        r8[:nby8, :nbx8]

    def fill_tier(t, rec, n, active):
        nn = n >> 3
        nby, nbx = active.shape
        is_intra = np.zeros((nby, nbx), bool)
        if "choice" in t:
            is_intra = (t["choice"] == 2).reshape(nby, nbx)
        m_int = up8(active & ~is_intra, n)
        m_itr = up8(active & is_intra, n)
        m_all = m_int | m_itr
        maps.log2m = np.where(m_all, n.bit_length() - 1, maps.log2m) \
            .astype(np.uint8)
        maps.pmode = np.where(m_itr, 1,
                              np.where(m_int, 0, maps.pmode)) \
            .astype(np.uint8)
        for l in range(2):
            rl = up8(rec[:, l].reshape(nby, nbx).astype(np.int8), n)
            mx = up8(rec[:, 2 + 2 * l].reshape(nby, nbx), n)
            my = up8(rec[:, 3 + 2 * l].reshape(nby, nbx), n)
            maps.ref[l] = np.where(m_int, rl,
                                   np.where(m_itr, -1, maps.ref[l]))
            maps.mv[l, :, :, 0] = np.where(m_int, mx,
                                           np.where(m_itr, 0,
                                                    maps.mv[l, :, :, 0]))
            maps.mv[l, :, :, 1] = np.where(m_int, my,
                                           np.where(m_itr, 0,
                                                    maps.mv[l, :, :, 1]))

    fill_tier(t8, rec8, 8, act8)
    fill_tier(t16, rec16, 16, act16)
    if act32 is not None and act32.any():
        fill_tier(t32, rec32, 32, act32)
    if skip64 is not None and skip64.any():
        bidx = np.arange(len(t64["xs"]))
        rec64 = t64["cands"][bidx, t64["zidx"]]
        t64["choice"] = np.zeros(len(bidx), np.int8)     # merge-only tier
        t64["bidx"] = t64["zidx"]
        t64["me"] = (np.full(len(bidx), -1, np.int32),
                     np.zeros((len(bidx), 2), np.int32),
                     np.full(len(bidx), -1, np.int32),
                     np.zeros((len(bidx), 2), np.int32))
        fill_tier(t64, rec64, 64, skip64)
    maps.tiers = dict(t8=(t8, act8, 8), t16=(t16, act16, 16))
    if act32 is not None:
        maps.tiers["t32"] = (t32, act32, 32)
    if skip64 is not None:
        maps.tiers["t64"] = (t64, skip64, 64)
    return maps


def up8_generic(a, n, h8, w8):
    nn = n >> 3
    out = np.zeros((h8, w8), a.dtype)
    r = np.repeat(np.repeat(a, nn, 0), nn, 1)
    out[:r.shape[0], :r.shape[1]] = r
    return out


# ==================================================== coding dispatch

def _dispatch_coding(enc, maps, jr, jsrc, to_slot, slot_of, is_b):
    import jax.numpy as jnp

    from ..ops.intercode import code_inter_frame_jit

    fs, sps, pps, hdr = enc.fs, enc.sps, enc.pps, enc.hdr
    cfg_w, cfg_h = sps.width, sps.height
    ph, pw = fs.ph, fs.pw
    h8, w8 = ph >> 3, pw >> 3
    qp_map8, lam_tab, lams_tab, cqpb_tab, cqpr_tab = enc._qp_tabs

    slot0 = to_slot(0, maps.ref[0]).reshape(-1)
    slot1 = to_slot(1, maps.ref[1]).reshape(-1)
    mv0 = maps.mv[0].reshape(-1, 2)
    mv1 = maps.mv[1].reshape(-1, 2)
    # intra cells predict garbage (overwritten by the wavefront): give
    # them slot 0 so the gather stays in range
    orphan = (slot0 < 0) & (slot1 < 0)
    slot0 = np.where(orphan, 0, slot0)

    # --------- explicit WP tables (P slices with weightp)
    wts0 = wts1 = None
    if hdr.weights is not None:
        R = jr[0].shape[0]
        flag = np.zeros((2, R, 3), bool)
        wgt = np.full((2, R, 3), 64, np.int32)
        off = np.zeros((2, R, 3), np.int32)
        for l in range(2):
            wl = hdr.weights[l] if l < len(hdr.weights) else []
            for i, trip in enumerate(wl):
                if i >= len(enc.ref_lists[l]):
                    break
                s = slot_of[id(enc.ref_lists[l][i].fs)]
                for c in range(3):
                    flag[l, s, c] = bool(trip[c].flag)
                    wgt[l, s, c] = trip[c].weight
                    off[l, s, c] = trip[c].offset
        lwd = np.array([hdr.luma_log2_weight_denom + 6,
                        hdr.chroma_log2_weight_denom + 6,
                        hdr.chroma_log2_weight_denom + 6], np.int32)
        wts0 = tuple(jnp.asarray(a) for a in (flag[0], wgt[0], off[0], lwd))
        wts1 = tuple(jnp.asarray(a) for a in (flag[1], wgt[1], off[1], lwd))

    # --------- TU packs (TU == CU; 64 CUs force-dropped carry no TUs)
    tu_packs = {}
    cu_xs, cu_ys, cu_n = [], [], []
    for key, (t, act, n) in maps.tiers.items():
        if n == 64:
            continue
        a = act.reshape(-1)
        ch = t.get("choice")
        inter = a & (ch != 2) if ch is not None else a
        xs = t["xs"][inter]
        ys = t["ys"][inter]
        cu_xs.append(xs)
        cu_ys.append(ys)
        cu_n.append(np.full(len(xs), n, np.int32))
    cu_xs = np.concatenate(cu_xs) if cu_xs else np.zeros(0, np.int32)
    cu_ys = np.concatenate(cu_ys) if cu_ys else np.zeros(0, np.int32)
    cu_n = np.concatenate(cu_n) if cu_n else np.zeros(0, np.int32)
    n_cu = _pad_pow2(len(cu_xs), 16)
    cu_qp = qp_map8[cu_ys >> 3, cu_xs >> 3]
    cu_lam = np.full(n_cu + 1, 1.0, np.float32)
    cu_lam[:len(cu_xs)] = lam_tab[cu_qp]
    for n in (8, 16, 32):
        m = cu_n == n
        xs, ys = cu_xs[m], cu_ys[m]
        cid = np.nonzero(m)[0].astype(np.int32)
        K = _pad_pow2(len(xs), 16)
        pad = lambda a, f=0: np.concatenate(
            [a, np.full(K - len(a), f, a.dtype)])
        valid = pad(np.ones(len(xs), bool))
        qpt = cu_qp[m]
        tu_packs[(True, n)] = tuple(jnp.asarray(v) for v in (
            pad(xs), pad(ys), pad(qpt.astype(np.int32)),
            pad(cid), valid))
        # chroma: cb + cr TUs at n/2
        nc = n >> 1
        cxs = np.concatenate([xs >> 1, xs >> 1]).astype(np.int32)
        cys = np.concatenate([ys >> 1, ys >> 1]).astype(np.int32)
        cqp = np.concatenate([cqpb_tab[qpt], cqpr_tab[qpt]])
        ccid = np.concatenate([cid, cid])
        cpl = np.concatenate([np.zeros(len(xs), np.int32),
                              np.ones(len(xs), np.int32)])
        K2 = _pad_pow2(len(cxs), 32)
        pad2 = lambda a, f=0: np.concatenate(
            [a, np.full(K2 - len(a), f, a.dtype)])
        tu_packs[(False, nc)] = tuple(jnp.asarray(v) for v in (
            pad2(cxs), pad2(cys), pad2(cqp), pad2(ccid),
            pad2(np.ones(len(cxs), bool)), pad2(cpl)))

    # --------- intra-in-inter wavefront schedule
    intra_segs, intra_mask = _intra_segs(enc, maps)

    # --------- deblock edge/BS inputs (final maps; cbf joins on device)
    e2v, e2h, etbv, etbh, emvv, emvh = _bs_inputs(enc, maps)
    qp4 = np.repeat(np.repeat(qp_map8, 2, 0), 2, 1).astype(np.int32)
    # per-cell in-CTB z value + z of the cell's CU origin (dqp chain)
    h4, w4 = ph >> 2, pw >> 2
    zloc = (_zvals(h4, w4, sps.log2_ctb)
            & ((1 << (2 * (sps.log2_ctb - 2))) - 1)).astype(np.int32)
    s4 = 1 << (np.repeat(np.repeat(maps.log2m.astype(np.int32), 2, 0),
                         2, 1) - 2)
    oy4 = np.arange(h4)[:, None] & ~(s4 - 1)
    ox4 = np.arange(w4)[None, :] & ~(s4 - 1)
    zcu4 = zloc[oy4, ox4]

    esc_cap = max(4096, (ph * pw * 3 // 2) // 8)
    sao_tier = int(getattr(enc, "sao_tier", 4))
    from ..utils.trace import stage
    with stage("inter.code_dispatch"):
        buf = code_inter_frame_jit(
        *jsrc, *jr,
        jnp.asarray(slot0), jnp.asarray(mv0),
        jnp.asarray(slot1), jnp.asarray(mv1), wts0, wts1,
        tu_packs, jnp.asarray(cu_lam),
        intra_segs, jnp.asarray(intra_mask.reshape(-1)),
        jnp.asarray(e2v), jnp.asarray(e2h), jnp.asarray(etbv),
        jnp.asarray(etbh), jnp.asarray(emvv), jnp.asarray(emvh),
        jnp.asarray(qp4), jnp.asarray(zloc), jnp.asarray(zcu4),
        has_l1=is_b, sbh=bool(pps.sign_data_hiding_enabled),
        strong=bool(sps.strong_intra_smoothing), n_cu=n_cu,
        h8=h8, w8=w8, pic_w=cfg_w, pic_h=cfg_h,
        boff=hdr.beta_offset_div2, toff=hdr.tc_offset_div2,
        cbo=pps.cb_qp_offset + hdr.cb_qp_offset,
        cro=pps.cr_qp_offset + hdr.cr_qp_offset,
        sao=bool(sps.sao_enabled), cs=sps.ctb_size,
        deblock=not pps.deblocking_filter_disabled, esc_cap=esc_cap,
        slice_qp=int(hdr.slice_qp),
        dqp=bool(pps.cu_qp_delta_enabled),
            wpp=bool(pps.entropy_coding_sync_enabled), sao_tier=sao_tier)
    row, dy, dcb, dcr, cyd, ccbd, ccrd = buf
    with stage("inter.code_fetch"):
        coeffs, sao_arrays = _unpack_row(np.asarray(row), ph, pw, sps,
                                         esc_cap, (cyd, ccbd, ccrd))
    return (dy, dcb, dcr), coeffs, sao_arrays


def _unpack_row(row, ph, pw, sps, esc_cap, dense_dev):
    """Sparse coefficients + chosen SAO params from the packed D2H row
    (reconstruction planes stay on device)."""
    off = 0

    def take(dtype, shape):
        nonlocal off
        n = int(np.prod(shape))
        a = np.frombuffer(row, dtype, n, off).reshape(shape)
        off += n * np.dtype(dtype).itemsize
        return a

    M = ph * pw * 3 // 2

    def dense_fetch():
        return np.concatenate([np.asarray(d).reshape(-1)
                               for d in dense_dev])

    from ..ops.wavefront import unpack_coeffs_sparse
    flat = unpack_coeffs_sparse(take, M, esc_cap, dense_fetch)
    cy = flat[:ph * pw].reshape(ph, pw)
    ccb = flat[ph * pw:ph * pw * 5 // 4].reshape(ph // 2, pw // 2)
    ccr = flat[ph * pw * 5 // 4:].reshape(ph // 2, pw // 2)
    sao_arrays = None
    if sps.sao_enabled:
        ncty = ph // sps.ctb_size
        nctx = pw // sps.ctb_size
        type_ = take(np.int8, (3, ncty, nctx))
        offs_ = take(np.int8, (3, ncty, nctx, 4))
        bpos_ = take(np.int8, (3, ncty, nctx))
        eocl_ = take(np.int8, (3, ncty, nctx))
        sao_arrays = (type_, offs_, bpos_, eocl_)
    assert off == row.size, (off, row.size)
    return (cy, ccb, ccr), sao_arrays


def _intra_segs(enc, maps):
    """Wavefront segments covering only the frame's intra CUs (or None)."""
    import jax.numpy as jnp

    from ..ops.wavefront import WavefrontIntraCoder

    sps, fs = enc.sps, enc.fs
    h8, w8 = fs.ph >> 3, fs.pw >> 3
    intra_mask = maps.pmode == 1
    if not intra_mask.any():
        return None, np.zeros((h8, w8), bool)
    coder = getattr(enc, "_wf_coder", None)
    if coder is None:
        coder = WavefrontIntraCoder()
        enc._wf_coder = coder
    if not coder.available:
        raise RuntimeError("native schedule builder unavailable")
    sched = coder.build_schedule(maps.log2m, sps.width, sps.height,
                                 sps.log2_ctb, sps.log2_min_cb)
    ox, oy, osz, olv, oal, oac, oat = sched
    sel = intra_mask[oy >> 3, ox >> 3]
    ox, oy, osz = ox[sel], oy[sel], osz[sel]
    oal, oac, oat = oal[sel], oac[sel], oat[sel]
    # levels: longest path over intra-only dependencies, walked in z order
    zv = _zvals(fs.ph >> 2, fs.pw >> 2, sps.log2_ctb)
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
    # modes for intra cells
    modes8 = np.full((h8, w8), 1, np.int32)
    cmodes8 = np.full((h8, w8), 1, np.int32)
    cw8, ch8 = sps.width >> 3, sps.height >> 3
    m16 = np.repeat(np.repeat(enc.mode16, 2, 0), 2, 1)
    cm16 = np.repeat(np.repeat(enc.cmode16, 2, 0), 2, 1)
    sz16 = maps.log2m == 4
    modes8[:ch8, :cw8] = np.where(sz16, m16, enc.mode8)[:ch8, :cw8]
    cmodes8[:ch8, :cw8] = np.where(sz16, cm16, enc.cmode8)[:ch8, :cw8]
    qp_map8 = enc._qp_tabs[0]
    coder._cqp_cb = np.array(
        [chroma_qp(min(q + enc.pps.cb_qp_offset + enc.hdr.cb_qp_offset,
                       57)) for q in range(64)], np.int32)
    coder._cqp_cr = np.array(
        [chroma_qp(min(q + enc.pps.cr_qp_offset + enc.hdr.cr_qp_offset,
                       57)) for q in range(64)], np.int32)
    packed, _ = coder.pack((ox, oy, osz, olv, oal, oac, oat),
                           modes8, cmodes8, qp_map8, h8, w8)
    segs = tuple(
        tuple(tuple(jnp.asarray(a) for a in seg[size])
              for size in (8, 16, 32))
        for seg in packed)
    return segs, intra_mask


def _bs_inputs(enc, maps):
    """Vectorized deblock inputs from the final maps: intra-edge, TB-edge
    and motion-BS masks per 4x4 (8-grid edges only, spec 8.7.2.4)."""
    fs, sps = enc.fs, enc.sps
    h4, w4 = fs.ph >> 2, fs.pw >> 2
    cfg_w, cfg_h = sps.width, sps.height
    rep = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)
    log24 = rep(maps.log2m.astype(np.int32))
    pmode4 = rep(maps.pmode)
    x4 = np.arange(w4)[None, :]
    y4 = np.arange(h4)[:, None]
    s4 = 1 << (log24 - 2)
    ev = (x4 % s4) == 0
    eh = (y4 % s4) == 0
    # 8-grid + picture-interior + coded-area only
    ev &= (x4 % 2 == 0) & (x4 > 0) & (x4 < cfg_w >> 2) & (y4 < cfg_h >> 2)
    eh &= (y4 % 2 == 0) & (y4 > 0) & (y4 < cfg_h >> 2) & (x4 < cfg_w >> 2)
    ref = np.repeat(np.repeat(maps.ref, 2, 1), 2, 2)
    mv = np.repeat(np.repeat(maps.mv, 2, 1), 2, 2)
    pocs = np.zeros((2, 8), np.int32)
    for l in range(2):
        for i, rp in enumerate(enc.ref_lists[l][:8]):
            pocs[l, i] = rp.poc
    rpoc = np.stack([pocs[l][np.clip(ref[l], 0, 7)] for l in range(2)])

    def mbs(shift_axis):
        sh = (lambda a: np.roll(a, 1, axis=shift_axis))
        u0, u1 = ref[0] >= 0, ref[1] >= 0
        u0p, u1p = sh(u0), sh(u1)
        nQ = u0.astype(np.int32) + u1
        nP = u0p.astype(np.int32) + u1p
        diff_n = nP != nQ
        # single hypothesis each
        pocQ1 = np.where(u0, rpoc[0], rpoc[1])
        mvQ1 = np.where(u0[..., None], mv[0], mv[1])
        pocP1 = sh(pocQ1)
        mvP1 = np.empty_like(mvQ1)
        mvP1[..., 0] = sh(mvQ1[..., 0])
        mvP1[..., 1] = sh(mvQ1[..., 1])
        far = lambda a, b: (np.abs(a[..., 0] - b[..., 0]) >= 4) \
            | (np.abs(a[..., 1] - b[..., 1]) >= 4)
        bs1 = (pocP1 != pocQ1) | far(mvP1, mvQ1)
        # double hypothesis
        p0, p1 = rpoc[0], rpoc[1]
        q0s = np.minimum(p0, p1)
        q1s = np.maximum(p0, p1)
        p0s, p1s = sh(q0s), sh(q1s)
        refdiff = (p0s != q0s) | (p1s != q1s)
        m0, m1 = mv[0], mv[1]
        m0p = np.stack([sh(m0[..., 0]), sh(m0[..., 1])], -1)
        m1p = np.stack([sh(m1[..., 0]), sh(m1[..., 1])], -1)
        pp0, pp1 = sh(p0), sh(p1)
        same_ref = p0 == p1
        ok1 = ~far(m0p, m0) & ~far(m1p, m1)
        ok2 = ~far(m0p, m1) & ~far(m1p, m0)
        bs_same = ~(ok1 | ok2)
        # distinct refs: align by poc
        mlo_q = np.where((p0 <= p1)[..., None], m0, m1)
        mhi_q = np.where((p0 <= p1)[..., None], m1, m0)
        mlo_p = np.where((pp0 <= pp1)[..., None], m0p, m1p)
        mhi_p = np.where((pp0 <= pp1)[..., None], m1p, m0p)
        bs_dist = far(mlo_p, mlo_q) | far(mhi_p, mhi_q)
        bs2 = refdiff | np.where(same_ref, bs_same, bs_dist)
        out = np.where(diff_n, True,
                       np.where(nQ == 1, bs1,
                                np.where(nQ == 2, bs2, False)))
        return out.astype(np.int8)

    emvv = mbs(1)
    emvh = mbs(0)
    pm_l = np.roll(pmode4, 1, 1)
    pm_t = np.roll(pmode4, 1, 0)
    e2v = (ev & ((pmode4 == 1) | (pm_l == 1)))
    e2h = (eh & ((pmode4 == 1) | (pm_t == 1)))
    etbv, etbh = ev, eh
    emvv = np.where(ev, emvv, 0).astype(np.int8)
    emvh = np.where(eh, emvh, 0).astype(np.int8)
    return e2v, e2h, etbv, etbh, emvv, emvh


# ===================================================== fs/syn filling

def _fill_and_map_syntax(enc, maps, coeffs, ctx, zv, region4):
    """Vectorized FrameState/EncSyntax fill + TRUE-field syntax mapping.
    Pixel planes are NOT touched here — the reconstruction stays on
    device (run_engine attaches it to fs for lazy materialization)."""
    fs, syn, sps, hdr = enc.fs, enc.syn, enc.sps, enc.hdr
    cy, ccb, ccr = coeffs
    syn.cy[:] = cy
    syn.ccb[:] = ccb
    syn.ccr[:] = ccr
    h4, w4 = fs.h4, fs.w4
    h8, w8 = fs.ph >> 3, fs.pw >> 3
    cfg_w, cfg_h = sps.width, sps.height
    rep = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)
    v = (slice(0, cfg_h >> 2), slice(0, cfg_w >> 2))
    log2m = maps.log2m
    depth8 = (sps.log2_ctb - log2m.astype(np.int32)).astype(np.int8)
    fs.cu_depth[v] = rep(depth8)[v]
    fs.qp[v] = rep(enc._qp_tabs[0].astype(np.int8))[v]
    fs.slice_id[:] = 0
    pmode4 = rep(maps.pmode)
    fs.pred_mode[v] = pmode4[v]
    fs.mi_parsed[v] = True
    fs.recon_done[v] = True
    # intra modes (wavefront modes maps were built in _intra_segs)
    m16 = rep(np.repeat(np.repeat(enc.mode16, 2, 0), 2, 1)
              [:h8, :w8].astype(np.int8))
    m8 = rep(enc.mode8[:h8, :w8].astype(np.int8))
    cm16 = rep(np.repeat(np.repeat(enc.cmode16, 2, 0), 2, 1)
               [:h8, :w8].astype(np.uint8))
    cm8 = rep(enc.cmode8[:h8, :w8].astype(np.uint8))
    is16 = rep(log2m) == 4
    fs.intra_mode[v] = np.where((pmode4 == 1) & is16, m16,
                                np.where(pmode4 == 1, m8,
                                         fs.intra_mode))[v]
    syn.chroma_mode[v] = np.where((pmode4 == 1) & is16, cm16,
                                  np.where(pmode4 == 1, cm8,
                                           syn.chroma_mode))[v]
    # edges (TU == CU)
    x4 = np.arange(w4)[None, :]
    y4 = np.arange(h4)[:, None]
    s4 = 1 << (rep(log2m.astype(np.int32)) - 2)
    ev = (x4 % s4) == 0
    eh = (y4 % s4) == 0
    for g in (fs.cu_edge_v, fs.pu_edge_v, fs.tu_edge_v):
        g[v] = ev[v]
    for g in (fs.cu_edge_h, fs.pu_edge_h, fs.tu_edge_h):
        g[v] = eh[v]
    # cbf per CU region (TU == CU): any nonzero coefficient in the region
    cyc = _region_any(cy, log2m, 8)
    ccbc = _region_any(ccb, log2m, 4)
    ccrc = _region_any(ccr, log2m, 4)
    fs.cbf_luma[v] = rep(cyc)[v]
    syn.cbf_cb[v] = rep(ccbc).astype(np.uint8)[v]
    syn.cbf_cr[v] = rep(ccrc).astype(np.uint8)[v]
    cbf8_any = cyc | ccbc | ccrc          # constant across each CU region
    # motion store (list domain) for inter cells
    inter8 = maps.pmode == 0
    for l in range(2):
        ref8 = np.where(inter8, maps.ref[l], -1)
        fs.ref_idx[l][:] = rep(ref8)
        fs.mv[l][:, :, 0] = rep(maps.mv[l][:, :, 0])
        fs.mv[l][:, :, 1] = rep(maps.mv[l][:, :, 1])
        npoc = np.zeros(9, np.int32)
        nlt = np.zeros(9, bool)
        for i, rp in enumerate(enc.ref_lists[l][:8]):
            npoc[i] = rp.poc
            nlt[i] = rp.is_long_term
        idx = np.clip(ref8, 0, 8)
        fs.ref_poc[l][:] = rep(np.where(ref8 >= 0, npoc[idx], 0))
        fs.ref_lt[l][:] = rep(np.where(ref8 >= 0, nlt[idx], False))
    # ---------------- TRUE-field syntax mapping per tier (vectorized)
    ffield = field_from_fs(fs)
    for key, (t, act, n) in maps.tiers.items():
        a = act.reshape(-1)
        ch = t.get("choice")
        inter = a & (ch != 2) if ch is not None else a
        idxs = np.nonzero(inter)[0]
        if len(idxs) == 0:
            continue
        xs = t["xs"][idxs]
        ys = t["ys"][idxs]
        x4s, y4s = xs >> 2, ys >> 2
        # the chosen record == what _assemble wrote into the maps
        rec = np.stack(
            [fs.ref_idx[0][y4s, x4s], fs.ref_idx[1][y4s, x4s],
             fs.mv[0][y4s, x4s, 0], fs.mv[0][y4s, x4s, 1],
             fs.mv[1][y4s, x4s, 0], fs.mv[1][y4s, x4s, 1]],
            1).astype(np.int32)
        true_c = merge_lists_vec(ffield, ctx, xs, ys, n, zv, region4,
                                 cfg_w, cfg_h)
        match = (true_c == rec[:, None, :]).all(2)
        merged = match.any(1)
        midx = np.argmax(match, 1).astype(np.uint8)
        cbf_any = cbf8_any[ys >> 3, xs >> 3]
        used0 = rec[:, 0] >= 0
        used1 = rec[:, 1] >= 0
        inter_dir = np.where(used0 & used1, 2,
                             np.where(used1, 1, 0)).astype(np.uint8)
        mvds = np.zeros((len(idxs), 2, 2), np.int32)
        mvps = np.zeros((len(idxs), 2), np.uint8)
        for l in range(2):
            usel = used0 if l == 0 else used1
            sel = ~merged & usel
            if not sel.any():
                continue
            cands = amvp_vec(ffield, ctx, xs, ys, n, l,
                             np.clip(rec[:, l], 0, None),
                             zv, region4, cfg_w, cfg_h)
            mvl = rec[:, 2 + 2 * l:4 + 2 * l]
            d0 = mvl - cands[:, 0]
            d1 = mvl - cands[:, 1]
            pick1 = np.abs(d0).sum(1) > np.abs(d1).sum(1)
            mvds[:, l] = np.where(pick1[:, None], d1, d0)
            mvps[:, l] = pick1.astype(np.uint8)

        def scatter(dst, vals, mask):
            """Broadcast per-block values over each block's 4x4 cells."""
            nn4 = n >> 2
            d4 = np.arange(nn4)
            sel = np.nonzero(mask)[0]
            if len(sel) == 0:
                return
            rr = (y4s[sel][:, None, None] + d4[None, :, None])
            cc = (x4s[sel][:, None, None] + d4[None, None, :])
            dst[rr, cc] = np.asarray(vals)[sel][:, None, None] \
                if np.ndim(vals) else vals

        scatter(syn.merge_flag, np.ones(len(idxs), np.uint8), merged)
        scatter(syn.merge_idx, midx, merged)
        scatter(fs.skip, True, merged & ~cbf_any)
        um = ~merged
        scatter(syn.merge_flag, np.zeros(len(idxs), np.uint8), um)
        scatter(syn.inter_dir, inter_dir, um)
        scatter(syn.ref0, rec[:, 0].astype(np.int8), um & used0)
        scatter(syn.ref1, rec[:, 1].astype(np.int8), um & used1)
        scatter(syn.mvp0, mvps[:, 0], um & used0)
        scatter(syn.mvp1, mvps[:, 1], um & used1)
        for comp in range(2):
            scatter(syn.mvd0[:, :, comp], mvds[:, 0, comp].astype(np.int16),
                    um & used0)
            scatter(syn.mvd1[:, :, comp], mvds[:, 1, comp].astype(np.int16),
                    um & used1)


def _region_any(coef, log2m, cell):
    """Per-8-cell 'CU region has any nonzero coefficient' map: reduce the
    coefficient plane to cells, then region-max per CU size."""
    h8, w8 = log2m.shape
    cells = (coef[:h8 * cell, :w8 * cell].reshape(h8, cell, w8, cell) != 0) \
        .any(axis=(1, 3))
    out = cells.copy()
    for lg in (4, 5, 6):
        nn = 1 << (lg - 3)
        m = log2m == lg
        if not m.any():
            continue
        hh = h8 // nn * nn
        ww = w8 // nn * nn
        blk = cells[:hh, :ww].reshape(h8 // nn, nn, w8 // nn, nn) \
            .any(axis=(1, 3))
        blk_up = np.repeat(np.repeat(blk, nn, 0), nn, 1)
        out[:hh, :ww] = np.where(m[:hh, :ww], blk_up, out[:hh, :ww])
    return out
