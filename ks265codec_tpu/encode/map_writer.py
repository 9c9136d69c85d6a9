"""Stage-2 slice syntax writer: dense decision maps -> CABAC slice payload.

The encoder is split into a COMPUTE stage (batched device passes + normative
reconstruction filling per-4x4 decision maps and per-pixel coefficient
planes) and this WRITE stage, which walks the quadtree implied by the maps
and entropy-codes the syntax. This is the TPU-native analog of the
reference's CCtuSbac::processCtuSbac consuming the CtuCache's stored coding
params (SURVEY.md 2.3 "CTU entropy coder": storeCodingParam ->
processCtuSbac), and it is what lets the bit-serial pass run natively/
threaded while the device computes the next frame.

This module holds the Python reference implementation; native/slicewriter
mirrors it byte-exactly (A/B tested) and is used in production.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.cabac import CabacEnc
from ..decode.slice_dec import SaoCtuParam
from ..hevc import cabac_tables as CT
from .sbac import CtuSyntaxWriter

MODE_INTER, MODE_INTRA = 0, 1


def amp_pu_geometry(x0, y0, size, part):
    """PU rectangles for the partitioned-inter shapes (mirror of the
    decoder's _pu_geometry for parts 1/2/4..7)."""
    s, h, q = size, size >> 1, size >> 2
    return {
        1: [(x0, y0, s, h), (x0, y0 + h, s, h)],
        2: [(x0, y0, h, s), (x0 + h, y0, h, s)],
        4: [(x0, y0, s, q), (x0, y0 + q, s, s - q)],
        5: [(x0, y0, s, s - q), (x0, y0 + s - q, s, q)],
        6: [(x0, y0, q, s), (x0 + q, y0, s - q, s)],
        7: [(x0, y0, s - q, s), (x0 + s - q, y0, q, s)],
    }[part]


class EncSyntax:
    """Per-4x4 syntax-element maps + coefficient planes filled by the
    compute stage and consumed by the slice writer (Python or native)."""

    def __init__(self, fs):
        h4, w4 = fs.h4, fs.w4
        self.chroma_mode = np.zeros((h4, w4), np.uint8)
        self.cbf_cb = np.zeros((h4, w4), np.uint8)
        self.cbf_cr = np.zeros((h4, w4), np.uint8)
        self.merge_flag = np.zeros((h4, w4), np.uint8)
        self.merge_idx = np.zeros((h4, w4), np.uint8)
        self.inter_dir = np.zeros((h4, w4), np.uint8)   # inter_pred_idc
        self.ref0 = np.zeros((h4, w4), np.int8)
        self.ref1 = np.zeros((h4, w4), np.int8)
        self.mvd0 = np.zeros((h4, w4, 2), np.int16)
        self.mvd1 = np.zeros((h4, w4, 2), np.int16)
        self.mvp0 = np.zeros((h4, w4), np.uint8)
        self.mvp1 = np.zeros((h4, w4), np.uint8)
        self.part = np.zeros((h4, w4), np.uint8)        # PART_2Nx2N
        self.tu_split = np.zeros((h4, w4), np.uint8)
        self.nxn = np.zeros((h4, w4), np.uint8)   # intra part NxN CUs
        self.ts_y = np.zeros((h4, w4), np.uint8)  # 4x4 luma TS TUs
        self.pcm = np.zeros((h4, w4), np.uint8)         # pcm_flag per CU
        # coefficient planes: each TU's quantized levels stored in place
        self.cy = np.zeros((fs.ph, fs.pw), np.int16)
        self.ccb = np.zeros((fs.ph // 2, fs.pw // 2), np.int16)
        self.ccr = np.zeros((fs.ph // 2, fs.pw // 2), np.int16)


class _WriterState:
    """FrameState view with a fresh coded-progression bitmap so neighbor
    availability during writing matches what a decoder will see."""

    def __init__(self, fs):
        self.sps = fs.sps
        for name in ("cu_depth", "qp", "skip", "pred_mode", "intra_mode",
                     "cbf_luma", "slice_id", "h4", "w4", "y", "cb", "cr"):
            setattr(self, name, getattr(fs, name))
        self.mi_parsed = np.zeros((fs.h4, fs.w4), bool)


def _sao_off_grid(sps):
    return [[SaoCtuParam() for _ in range(sps.pic_width_in_ctbs)]
            for _ in range(sps.pic_height_in_ctbs)]


def write_slice_data(fs, syn: EncSyntax, sps, pps, hdr,
                     sao_params=None,
                     threads: int = 1) -> tuple[bytes, list[int]]:
    """Entropy-code one slice from the maps. Returns (slice data bytes with
    all substreams flushed/aligned incl. the rbsp stop bit, raw substream
    byte sizes for all but the last substream).

    Dispatches to the native whole-slice writer (native/cabac.c
    ks_write_slice) and falls back to this Python implementation for
    configurations the native path does not cover yet."""
    try:
        from .. import native as _native
    except Exception:                  # pragma: no cover
        _native = None
    if _native is not None and _native.HAVE_NATIVE:
        r = _native.write_slice_native(fs, syn, sps, pps, hdr, sao_params,
                                       threads=threads)
        if r is not None:
            return r
    return write_slice_data_py(fs, syn, sps, pps, hdr, sao_params)


def write_slice_data_py(fs, syn: EncSyntax, sps, pps, hdr,
                        sao_params=None, segments=None):
    """Python reference implementation of the slice writer (the native
    writer is A/B tested against this byte-for-byte).

    segments: optional sorted list of segment-start CTU addresses
    (segments[0] == 0) — the picture is coded as one independent + N-1
    DEPENDENT slice segments: end_of_slice_segment_flag=1 closes each
    segment, contexts continue across the boundary (9.3.1), qPY_PREV
    resets (8.6.1). Mutually exclusive with WPP/tiles here. Returns
    (list of per-segment bytes, []) instead of (bytes, entry_sizes)."""
    ws = _WriterState(fs)
    w = CtuSyntaxWriter(ws, sps, pps, hdr)
    wctb = sps.pic_width_in_ctbs
    nctb = wctb * sps.pic_height_in_ctbs
    wpp = bool(pps.entropy_coding_sync_enabled)
    sao_on = bool(hdr.sao_luma or hdr.sao_chroma)
    sao = sao_params if sao_params is not None else _sao_off_grid(sps)
    tg = None
    if pps.tiles_enabled:
        from ..hevc.params import TileGrid
        tg = getattr(pps, "_tile_grid", None)
        if tg is None:
            tg = TileGrid(pps, sps)
            pps._tile_grid = tg
        w.slice_idx = int(fs.slice_id[0, 0])   # region id of tile 0
    substreams: list[bytes] = []
    entry_points: list[int] = []
    saved_ctx = None
    seg_ends = set()
    seg_out: list[bytes] = []
    if segments:
        assert not wpp and tg is None, "slices exclude wpp/tiles"
        seg_ends = {s - 1 for s in segments[1:]}
    for ts in range(nctb):
        addr = int(tg.ts_to_rs[ts]) if tg is not None else ts
        rx, ry = addr % wctb, addr // wctb
        if wpp and rx == 0 and ry > 0:
            w.start_substream(saved_ctx)
            w.qp_prev = hdr.slice_qp          # qPY_PREV reset (row start)
        x0, y0 = rx << sps.log2_ctb, ry << sps.log2_ctb
        if sao_on:
            w.write_sao(rx, ry, sao)
        w.begin_qg()
        _write_cq(w, ws, syn, sps, hdr, x0, y0, sps.log2_ctb, 0)
        w.end_qg()
        if wpp and rx == min(1, wctb - 1):
            saved_ctx = w.enc.save_ctx()
        last = ts == nctb - 1
        if ts in seg_ends:
            # dependent-segment boundary: end_of_slice_segment_flag=1,
            # flush byte-aligned, contexts carry over, qPY_PREV resets
            w.end_ctu(True)
            carry = w.enc.save_ctx()
            seg_out.append(w.finish_substream())
            w.start_substream(carry)
            w.qp_prev = hdr.slice_qp
            continue
        w.end_ctu(last)
        if wpp and rx == wctb - 1 and not last:
            w.enc.encode_terminate(1)
            sub = w.finish_substream()
            substreams.append(sub)
            entry_points.append(len(sub))
        elif tg is not None and not last:
            nxt = int(tg.ts_to_rs[ts + 1])
            if tg.tile_of_ctb[nxt // wctb, nxt % wctb] \
                    != tg.tile_of_ctb[ry, rx]:
                # tile boundary: end_of_subset bit, flush, fresh contexts
                w.enc.encode_terminate(1)
                sub = w.finish_substream()
                substreams.append(sub)
                entry_points.append(len(sub))
                w.start_substream(CT.init_contexts(
                    hdr.slice_type, hdr.slice_qp, hdr.cabac_init_flag))
                w.qp_prev = hdr.slice_qp      # qPY_PREV reset (tile start)
                w.slice_idx = int(
                    fs.slice_id[(nxt // wctb) << (sps.log2_ctb - 2),
                                (nxt % wctb) << (sps.log2_ctb - 2)])
    final = w.finish_substream()
    if segments:
        seg_out.append(final)
        return seg_out, []
    return b"".join(substreams) + final, entry_points


def _write_inter_cu_part(w, ws, syn, sps, hdr, x0, y0, log2, depth,
                         part):
    """Partitioned inter CU (2NxN / Nx2N): two PUs, then the transform
    tree with the IMPLICIT depth-0 split (spec 7.3.8.8 interSplitFlag:
    max_transform_hierarchy_depth_inter == 0 and part != 2Nx2N)."""
    size = 1 << log2
    b4 = size >> 2
    x4, y4 = x0 >> 2, y0 >> 2
    w.note_cu_qp(int(ws.qp[y4, x4]))
    w.write_part_mode_inter(part, log2)
    pus = amp_pu_geometry(x0, y0, size, part)
    for pidx, (xp, yp, nw, nh) in enumerate(pus):
        px4, py4 = xp >> 2, yp >> 2
        merge = bool(syn.merge_flag[py4, px4])
        w.write_merge_flag(1 if merge else 0)
        if merge:
            w.write_merge_idx(int(syn.merge_idx[py4, px4]))
        else:
            inter_dir = int(syn.inter_dir[py4, px4])
            if hdr.slice_type == 0:          # B
                w.write_inter_dir(inter_dir, depth, nw + nh)
            used = (0, 1) if inter_dir == 2 else (inter_dir,)
            for lst in used:
                ridx = int((syn.ref0 if lst == 0
                            else syn.ref1)[py4, px4])
                w.write_ref_idx(lst, ridx)
                mvd = (syn.mvd0 if lst == 0 else syn.mvd1)[py4, px4]
                w.write_mvd((int(mvd[0]), int(mvd[1])))
                w.write_mvp_flag(int((syn.mvp0 if lst == 0
                                      else syn.mvp1)[py4, px4]))
        ws.mi_parsed[py4:py4 + (nh >> 2), px4:px4 + (nw >> 2)] = True
    root_cbf = bool(
        ws.cbf_luma[y4:y4 + b4, x4:x4 + b4].any()
        or syn.cbf_cb[y4:y4 + b4, x4:x4 + b4].any()
        or syn.cbf_cr[y4:y4 + b4, x4:x4 + b4].any())
    w.write_rqt_root_cbf(1 if root_cbf else 0)
    if not root_cbf:
        return
    if sps.max_transform_hierarchy_depth_inter > 0:
        # split is EXPLICIT when depth < max depth (partitioned CUs
        # always split in this encoder)
        w.write_split_transform_flag(log2, 1)
    _write_quadrant_tus(w, ws, syn, x0, y0, log2)


def _write_quadrant_tus(w, ws, syn, x0, y0, log2):
    """Four child TUs of a split inter transform tree: parent chroma
    cbfs at depth 0, per-child chroma/luma cbfs + residuals (mirror of
    SliceDecoder._parse_transform_tree at depth 1)."""
    size = 1 << log2
    b4 = size >> 2
    x4, y4 = x0 >> 2, y0 >> 2
    h = size >> 1
    parent_cb = int(syn.cbf_cb[y4:y4 + b4, x4:x4 + b4].any())
    parent_cr = int(syn.cbf_cr[y4:y4 + b4, x4:x4 + b4].any())
    w.write_cbf_chroma(parent_cb, 0)
    w.write_cbf_chroma(parent_cr, 0)
    c_log2 = log2 - 1
    for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
        xq, yq = x0 + dx, y0 + dy
        q4x, q4y = xq >> 2, yq >> 2
        ccb = int(syn.cbf_cb[q4y, q4x]) if parent_cb else 0
        ccr = int(syn.cbf_cr[q4y, q4x]) if parent_cr else 0
        if parent_cb:
            w.write_cbf_chroma(ccb, 1)
        if parent_cr:
            w.write_cbf_chroma(ccr, 1)
        cbf_y = int(ws.cbf_luma[q4y, q4x])
        w.write_cbf_luma(cbf_y, 1)
        if cbf_y or ccb or ccr:
            w.maybe_write_dqp(int(ws.qp[y4, x4]))
        qs = 1 << c_log2
        if cbf_y:
            cf = syn.cy[yq:yq + qs, xq:xq + qs].astype(np.int32)
            w.write_residual(cf, c_log2, 0, None)
        csz = qs >> 1
        cxq, cyq = xq >> 1, yq >> 1
        if ccb:
            cf = syn.ccb[cyq:cyq + csz, cxq:cxq + csz].astype(np.int32)
            w.write_residual(cf, c_log2 - 1, 1, None)
        if ccr:
            cf = syn.ccr[cyq:cyq + csz, cxq:cxq + csz].astype(np.int32)
            w.write_residual(cf, c_log2 - 1, 2, None)


def apply_effective_qp(fs, syn, sps, pps, hdr) -> None:
    """Rewrite fs.qp to the DECODER-side effective per-cell QP under
    cu_qp_delta (QG = CTB): CUs before the first residual-bearing CU of a
    CTB keep the predicted QP (qPY_PREV chain, reset at slice/tile/WPP-row
    starts); the delta-carrying CU and everything after keep their planned
    QP (run-verified HM semantics, mirrored from SliceDecoder._enter_qg).
    Must run before deblocking — deblock tc/beta read these QPs."""
    wctb = sps.pic_width_in_ctbs
    nctb = wctb * sps.pic_height_in_ctbs
    wpp = bool(pps.entropy_coding_sync_enabled)
    tg = None
    if pps.tiles_enabled:
        from ..hevc.params import TileGrid
        tg = getattr(pps, "_tile_grid", None)
        if tg is None:
            tg = TileGrid(pps, sps)
            pps._tile_grid = tg
    cbf4 = fs.cbf_luma | (syn.cbf_cb != 0) | (syn.cbf_cr != 0)
    min_cb = sps.log2_min_cb
    qp_prev = hdr.slice_qp

    def walk(x0, y0, log2):
        nonlocal qp_prev, coded_seen
        size = 1 << log2
        inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
        x4, y4 = x0 >> 2, y0 >> 2
        split = (not inside and log2 > min_cb) or (
            inside and sps.log2_ctb - int(fs.cu_depth[y4, x4]) < log2)
        if split:
            h = size >> 1
            for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
                if x0 + dx < sps.width and y0 + dy < sps.height:
                    walk(x0 + dx, y0 + dy, log2 - 1)
            return
        b4 = size >> 2
        if not coded_seen and cbf4[y4:y4 + b4, x4:x4 + b4].any():
            # region-any: split transform trees (partitioned CUs, TU
            # splits, NxN) carry per-child cbfs — a zero top-left TU
            # must not make the whole CU look uncoded (the delta is
            # written at the first child WITH residual)
            coded_seen = True
        if not coded_seen:
            fs.qp[y4:y4 + b4, x4:x4 + b4] = qp_prev
        qp_prev_local = int(fs.qp[y4, x4])
        walk.last_qp = qp_prev_local

    for ts in range(nctb):
        addr = int(tg.ts_to_rs[ts]) if tg is not None else ts
        rx, ry = addr % wctb, addr // wctb
        if ts == 0 or (wpp and rx == 0) or (
                tg is not None and ts > 0
                and tg.tile_of_ctb[ry, rx] != tg.tile_of_ctb[
                    int(tg.ts_to_rs[ts - 1]) // wctb,
                    int(tg.ts_to_rs[ts - 1]) % wctb]):
            qp_prev = hdr.slice_qp
        coded_seen = False
        walk.last_qp = qp_prev
        walk(rx << sps.log2_ctb, ry << sps.log2_ctb, sps.log2_ctb)
        qp_prev = walk.last_qp


def _write_cq(w, ws, syn, sps, hdr, x0, y0, log2, depth):
    size = 1 << log2
    inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
    min_cb = sps.log2_min_cb
    x4, y4 = x0 >> 2, y0 >> 2
    if inside:
        cu_log2 = sps.log2_ctb - int(ws.cu_depth[y4, x4])
        split = cu_log2 < log2
    else:
        split = log2 > min_cb
    w.write_split_flag(x0, y0, log2, depth, int(split))
    if split:
        h = size >> 1
        for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
            x1, y1 = x0 + dx, y0 + dy
            if x1 < sps.width and y1 < sps.height:
                _write_cq(w, ws, syn, sps, hdr, x1, y1, log2 - 1, depth + 1)
        return
    _write_cu(w, ws, syn, sps, hdr, x0, y0, log2, depth)


def _write_cu(w, ws, syn, sps, hdr, x0, y0, log2, depth):
    size = 1 << log2
    b4 = size >> 2
    x4, y4 = x0 >> 2, y0 >> 2
    w.note_cu_qp(int(ws.qp[y4, x4]))
    is_i = hdr.slice_type == 2
    intra = ws.pred_mode[y4, x4] == MODE_INTRA

    def mark():
        ws.mi_parsed[y4:y4 + b4, x4:x4 + b4] = True

    if not is_i:
        skip = bool(ws.skip[y4, x4])
        w.write_skip_flag(x0, y0, 1 if skip else 0)
        if skip:
            w.write_merge_idx(int(syn.merge_idx[y4, x4]))
            mark()
            return
    if intra:
        if sps.pcm_enabled and sps.log2_min_pcm_cb <= log2 \
                <= sps.log2_max_pcm_cb:
            if syn.pcm[y4, x4]:
                csz = size >> 1
                cx0, cy0 = x0 >> 1, y0 >> 1
                w.write_pcm(ws.y[y0:y0 + size, x0:x0 + size],
                            ws.cb[cy0:cy0 + csz, cx0:cx0 + csz],
                            ws.cr[cy0:cy0 + csz, cx0:cx0 + csz])
                ws.mi_parsed[y4:y4 + b4, x4:x4 + b4] = True
                return
            w.write_pcm_flag0()
        if log2 == 3 and syn.nxn[y4, x4]:
            # part NxN at the min CB: 4 luma modes, IntraSplitFlag tree
            # (4 DST 4x4 luma TUs; chroma coded at blk_idx 3 — mirror of
            # SliceDecoder._parse_transform_tree intra_split semantics)
            cmode = int(syn.chroma_mode[y4, x4])
            modes = [int(ws.intra_mode[(y0 + (pu >> 1) * 4) >> 2,
                                       (x0 + (pu & 1) * 4) >> 2])
                     for pu in range(4)]
            w.write_intra_cu_header(x0, y0, log2, modes, cmode,
                                    part_nxn=True)
            cbf_cb = int(syn.cbf_cb[y4, x4])
            cbf_cr = int(syn.cbf_cr[y4, x4])
            w.write_cbf_chroma(cbf_cb, 0)
            w.write_cbf_chroma(cbf_cr, 0)
            for pu, (dx, dy) in enumerate(((0, 0), (4, 0),
                                           (0, 4), (4, 4))):
                xq, yq = x0 + dx, y0 + dy
                cbf_y = int(ws.cbf_luma[yq >> 2, xq >> 2])
                w.write_cbf_luma(cbf_y, 1)
                if cbf_y or cbf_cb or cbf_cr:
                    w.maybe_write_dqp(int(ws.qp[y4, x4]))
                if cbf_y:
                    cf = syn.cy[yq:yq + 4, xq:xq + 4].astype(np.int32)
                    w.write_residual(cf, 2, 0, modes[pu],
                                     ts=bool(syn.ts_y[yq >> 2, xq >> 2]))
                if pu == 3:
                    cx0, cy0 = x0 >> 1, y0 >> 1
                    if cbf_cb:
                        cf = syn.ccb[cy0:cy0 + 4,
                                     cx0:cx0 + 4].astype(np.int32)
                        w.write_residual(cf, 2, 1, cmode)
                    if cbf_cr:
                        cf = syn.ccr[cy0:cy0 + 4,
                                     cx0:cx0 + 4].astype(np.int32)
                        w.write_residual(cf, 2, 2, cmode)
            return
        mode = int(ws.intra_mode[y4, x4])
        cmode = int(syn.chroma_mode[y4, x4])
        # write_intra_cu_header stores modes + mi_parsed progression itself
        w.write_intra_cu_header(x0, y0, log2, [mode], cmode)
        if sps.max_transform_hierarchy_depth_intra > 0 \
                and sps.log2_min_tb < log2 <= sps.log2_max_tb:
            # explicit split_transform_flag at the CU root (depth 0 <
            # max depth); mirror of _parse_transform_tree's intra order:
            # flag, parent chroma cbfs, then children or the leaf TU
            tsplit = int(syn.tu_split[y4, x4])
            w.write_split_transform_flag(log2, tsplit)
            if tsplit:
                parent_cb = int(syn.cbf_cb[y4:y4 + b4,
                                           x4:x4 + b4].any())
                parent_cr = int(syn.cbf_cr[y4:y4 + b4,
                                           x4:x4 + b4].any())
                w.write_cbf_chroma(parent_cb, 0)
                w.write_cbf_chroma(parent_cr, 0)
                h = size >> 1
                hb4 = h >> 2
                for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                    xc, yc = x0 + dx, y0 + dy
                    c4x, c4y = xc >> 2, yc >> 2
                    ccb = int(syn.cbf_cb[c4y, c4x]) if parent_cb else 0
                    ccr = int(syn.cbf_cr[c4y, c4x]) if parent_cr else 0
                    if parent_cb:
                        w.write_cbf_chroma(ccb, 1)
                    if parent_cr:
                        w.write_cbf_chroma(ccr, 1)
                    cbf_yc = int(ws.cbf_luma[c4y, c4x])
                    w.write_cbf_luma(cbf_yc, 1)
                    if cbf_yc or ccb or ccr:
                        w.maybe_write_dqp(int(ws.qp[y4, x4]))
                    if cbf_yc:
                        cf = syn.cy[yc:yc + h, xc:xc + h] \
                            .astype(np.int32)
                        w.write_residual(cf, log2 - 1, 0, mode)
                    csz2 = h >> 1
                    ccx, ccy = xc >> 1, yc >> 1
                    if ccb:
                        cf = syn.ccb[ccy:ccy + csz2, ccx:ccx + csz2] \
                            .astype(np.int32)
                        w.write_residual(cf, log2 - 2, 1, cmode)
                    if ccr:
                        cf = syn.ccr[ccy:ccy + csz2, ccx:ccx + csz2] \
                            .astype(np.int32)
                        w.write_residual(cf, log2 - 2, 2, cmode)
                return
        cbf_y = int(ws.cbf_luma[y4, x4])
        cbf_cb = int(syn.cbf_cb[y4, x4])
        cbf_cr = int(syn.cbf_cr[y4, x4])
        w.write_cbf_chroma(cbf_cb, 0)
        w.write_cbf_chroma(cbf_cr, 0)
        w.write_cbf_luma(cbf_y, 0)
        if cbf_y or cbf_cb or cbf_cr:
            w.maybe_write_dqp(int(ws.qp[y4, x4]))
        c_log2 = log2 - 1
        csz = size >> 1
        cx0, cy0 = x0 >> 1, y0 >> 1
        if cbf_y:
            cf = syn.cy[y0:y0 + size, x0:x0 + size].astype(np.int32)
            w.write_residual(cf, log2, 0, mode)
        if cbf_cb:
            cf = syn.ccb[cy0:cy0 + csz, cx0:cx0 + csz].astype(np.int32)
            w.write_residual(cf, c_log2, 1, cmode)
        if cbf_cr:
            cf = syn.ccr[cy0:cy0 + csz, cx0:cx0 + csz].astype(np.int32)
            w.write_residual(cf, c_log2, 2, cmode)
        return
    # ----- inter CU
    w.write_pred_mode(False)
    part = int(syn.part[y4, x4])
    if part != 0:
        _write_inter_cu_part(w, ws, syn, sps, hdr, x0, y0, log2, depth,
                             part)
        return
    w.write_part_2Nx2N_inter()
    merge = bool(syn.merge_flag[y4, x4])
    # region-any: with a split transform tree the per-cell flags are per
    # CHILD TU, so the CU-level gates must look at the whole region
    cbf_y = int(ws.cbf_luma[y4:y4 + b4, x4:x4 + b4].any())
    cbf_cb = int(syn.cbf_cb[y4:y4 + b4, x4:x4 + b4].any())
    cbf_cr = int(syn.cbf_cr[y4:y4 + b4, x4:x4 + b4].any())
    cbf_any = bool(cbf_y or cbf_cb or cbf_cr)
    if merge:
        w.write_merge_flag(1)
        w.write_merge_idx(int(syn.merge_idx[y4, x4]))
    else:
        w.write_merge_flag(0)
        inter_dir = int(syn.inter_dir[y4, x4])
        if hdr.slice_type == 0:          # B
            w.write_inter_dir(inter_dir, depth, size + size)
        used = (0, 1) if inter_dir == 2 else (inter_dir,)
        for lst in used:
            ridx = int((syn.ref0 if lst == 0 else syn.ref1)[y4, x4])
            w.write_ref_idx(lst, ridx)
            mvd = (syn.mvd0 if lst == 0 else syn.mvd1)[y4, x4]
            w.write_mvd((int(mvd[0]), int(mvd[1])))
            w.write_mvp_flag(int((syn.mvp0 if lst == 0
                                  else syn.mvp1)[y4, x4]))
        w.write_rqt_root_cbf(1 if cbf_any else 0)
    mark()
    if not cbf_any:
        return
    if sps.max_transform_hierarchy_depth_inter > 0 \
            and log2 <= sps.log2_max_tb and log2 > sps.log2_min_tb:
        tsplit = int(syn.tu_split[y4, x4])
        w.write_split_transform_flag(log2, tsplit)
        if tsplit:
            _write_quadrant_tus(w, ws, syn, x0, y0, log2)
            return
    w.write_cbf_chroma(cbf_cb, 0)
    w.write_cbf_chroma(cbf_cr, 0)
    if cbf_cb or cbf_cr:
        w.write_cbf_luma(cbf_y, 0)
    else:
        cbf_y = 1                        # inferred at inter depth-0 leaf
    w.maybe_write_dqp(int(ws.qp[y4, x4]))
    c_log2 = log2 - 1
    csz = size >> 1
    cx0, cy0 = x0 >> 1, y0 >> 1
    if cbf_y:
        cf = syn.cy[y0:y0 + size, x0:x0 + size].astype(np.int32)
        w.write_residual(cf, log2, 0, None)
    if cbf_cb:
        cf = syn.ccb[cy0:cy0 + csz, cx0:cx0 + csz].astype(np.int32)
        w.write_residual(cf, c_log2, 1, None)
    if cbf_cr:
        cf = syn.ccr[cy0:cy0 + csz, cx0:cx0 + csz].astype(np.int32)
        w.write_residual(cf, c_log2, 2, None)
