"""Slice-level CTU syntax parsing + interleaved reconstruction.

The NumPy/Python reference decoder for one slice: CABAC-parses the CTU
quadtree, intra/inter modes and residuals (spec 7.3.8 / 9.3), and
reconstructs TUs in decode order. Loop filters run afterwards at frame
level (filters.py) — intra prediction reads unfiltered recon, so this split
is normative and also the TPU-friendly structure.

Reference equivalents: CDecCu::{decCtu,decCu,decIntraMode,decTransTree},
CDecCabac::{parseCoeffNxN,ParseLastSignificantXY,ParseSaoParam}
(SURVEY.md 2.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream.cabac import CabacDec

try:
    from .. import native as _native
except Exception:                      # pragma: no cover
    _native = None
from ..hevc import cabac_tables as CT
from ..hevc.cabac_tables import CTX_OFFSET, SIG_CTX_MAP_4x4, scan_order
from ..hevc.params import PPS, SPS
from ..hevc.slicehdr import B_SLICE, I_SLICE, P_SLICE, SliceHeader
from ..hevc.tables import chroma_qp
from .recon import (dequant, intra_filter_refs, intra_predict,
                    inverse_transform, reconstruct, transform_skip_residual)

MODE_INTER, MODE_INTRA = 0, 1

# part modes
PART_2Nx2N, PART_2NxN, PART_Nx2N, PART_NxN = 0, 1, 2, 3
PART_2NxnU, PART_2NxnD, PART_nLx2N, PART_nRx2N = 4, 5, 6, 7


@dataclass
class SaoCtuParam:
    """Per-CTU, per-component SAO parameters."""
    type_idx: list[int] = field(default_factory=lambda: [0, 0, 0])  # 0 off 1 BO 2 EO
    offsets: list[list[int]] = field(default_factory=lambda: [[0] * 4 for _ in range(3)])
    band_pos: list[int] = field(default_factory=lambda: [0, 0, 0])
    eo_class: list[int] = field(default_factory=lambda: [0, 0, 0])


class FastPathAbort(Exception):
    """Raised by a parse-only SliceDecoder on syntax outside the batched
    reconstruction's coverage (TU split, NxN, PCM); the caller re-decodes
    the slice with the interleaved scalar path."""


class FrameState:
    """A frame being decoded: padded planes + per-4x4 coding-info grids.

    The grids are exactly the dense tensor fields the TPU loop filters and
    the encoder's neighbor logic consume (SURVEY.md 2.2 "Neighbor-info
    store" re-designed as arrays).
    """

    _serial_next = 0    # process-wide monotonic id (DeviceDPB keying —
    #                     unlike id(), never reused after gc OR pool reuse)

    def __init__(self, sps: SPS):
        cs = sps.ctb_size
        self.pw = sps.pic_width_in_ctbs * cs   # padded sizes
        self.ph = sps.pic_height_in_ctbs * cs
        self.y = np.empty((self.ph, self.pw), np.int32)
        self.cb = np.empty((self.ph // 2, self.pw // 2), np.int32)
        self.cr = np.empty((self.ph // 2, self.pw // 2), np.int32)
        h4, w4 = self.ph // 4, self.pw // 4
        self.h4, self.w4 = h4, w4
        # per-4x4 grids
        self.recon_done = np.empty((h4, w4), bool)
        self.pred_mode = np.empty((h4, w4), np.int8)       # MODE_INTER/INTRA
        self.intra_mode = np.empty((h4, w4), np.int8)      # luma mode
        self.cu_depth = np.empty((h4, w4), np.int8)
        self.skip = np.empty((h4, w4), bool)
        self.qp = np.empty((h4, w4), np.int8)
        self.cbf_luma = np.empty((h4, w4), bool)
        self.tu_edge_h = np.empty((h4, w4), bool)  # top edge of a TU at this 4x4
        self.tu_edge_v = np.empty((h4, w4), bool)  # left edge
        self.pu_edge_h = np.empty((h4, w4), bool)
        self.pu_edge_v = np.empty((h4, w4), bool)
        self.cu_edge_h = np.empty((h4, w4), bool)
        self.cu_edge_v = np.empty((h4, w4), bool)
        self.slice_id = np.empty((h4, w4), np.int32)
        # motion: [list][h4][w4][xy], refidx -1 = unused
        self.mv = np.empty((2, h4, w4, 2), np.int32)
        self.ref_idx = np.empty((2, h4, w4), np.int8)
        self.ref_poc = np.empty((2, h4, w4), np.int32)
        self.ref_lt = np.empty((2, h4, w4), bool)      # ref is long-term
        self.mi_parsed = np.empty((h4, w4), bool)      # motion/mode parsed
        self.reset(sps)

    def reset(self, sps: SPS) -> None:
        """(Re)initialize for a new picture, reusing every allocation —
        the frame-pool contract (reference CFramePool / TComPicYuv reuse,
        SURVEY.md 2.1 memory pool). A recycled frame gets a FRESH serial
        so DeviceDPB entries of its former life can never alias it."""
        self.serial = FrameState._serial_next
        FrameState._serial_next += 1
        self.sps = sps
        for a in (self.y, self.cb, self.cr, self.recon_done,
                  self.pred_mode, self.cu_depth, self.skip, self.qp,
                  self.cbf_luma, self.tu_edge_h, self.tu_edge_v,
                  self.pu_edge_h, self.pu_edge_v, self.cu_edge_h,
                  self.cu_edge_v, self.slice_id, self.mv, self.ref_poc,
                  self.ref_lt, self.mi_parsed):
            a.fill(0)
        self.intra_mode.fill(1)
        self.ref_idx.fill(-1)
        # the parse-only fast path aliases dec_coef_* / planes into async
        # device dispatches zero-copy (decoder.py ~540): if a fetch was
        # still pending at recycle time, mutating them would corrupt it —
        # drop the references instead (the arrays die with the dispatch)
        if getattr(self, "_planes_stale", False):
            self.y = np.zeros_like(self.y)
            self.cb = np.zeros_like(self.cb)
            self.cr = np.zeros_like(self.cr)
            if getattr(self, "dec_coef_y", None) is not None:
                self.dec_coef_y = None
                self.dec_coef_cb = None
                self.dec_coef_cr = None
                self.dec_cmode8 = None
        elif getattr(self, "dec_coef_y", None) is not None:
            for a in (self.dec_coef_y, self.dec_coef_cb,
                      self.dec_coef_cr):
                a.fill(0)
            self.dec_cmode8.fill(1)
        self.sao: list[list[SaoCtuParam]] = [
            [SaoCtuParam() for _ in range(sps.pic_width_in_ctbs)]
            for _ in range(sps.pic_height_in_ctbs)]
        self.poc = 0
        self._fast_filtered = False   # decoder fast path marks filters done
        # encoder device-path frames keep their reconstruction ON the
        # device; the numpy planes are materialized only on first host
        # consumer (fallback ref read, weightp, PSNR, MD5)
        self._dev_planes = None
        self._planes_stale = False

    def attach_device_planes(self, planes) -> None:
        self._dev_planes = tuple(planes)
        self._planes_stale = True

    def ensure_planes(self) -> None:
        if self._planes_stale:
            self.y[:] = np.asarray(self._dev_planes[0])
            self.cb[:] = np.asarray(self._dev_planes[1])
            self.cr[:] = np.asarray(self._dev_planes[2])
            self._planes_stale = False

    def planes(self):
        self.ensure_planes()
        return (self.y, self.cb, self.cr)


class SliceDecoder:
    """Decodes one independent slice segment's CTUs into a FrameState."""

    def __init__(self, fs: FrameState, sps: SPS, pps: PPS, hdr: SliceHeader,
                 rbsp: bytes, data_start: int, slice_idx: int,
                 ref_lists=None, epb_pos: tuple = (),
                 init_ctx=None, qp_prev=None, parse_only: bool = False):
        self.fs = fs
        # parse-only fast path: residual levels land in dense planes and
        # chroma modes in a per-8-cell grid; reconstruction runs afterwards
        # as ONE batched wavefront dispatch (ops/wavefront.recon_frame)
        self.parse_only = parse_only
        if parse_only and getattr(fs, "dec_coef_y", None) is None:
            fs.dec_coef_y = np.zeros((fs.ph, fs.pw), np.int16)
            fs.dec_coef_cb = np.zeros((fs.ph // 2, fs.pw // 2), np.int16)
            fs.dec_coef_cr = np.zeros((fs.ph // 2, fs.pw // 2), np.int16)
            fs.dec_cmode8 = np.ones((fs.ph >> 3, fs.pw >> 3), np.int32)
        self.data_start = data_start
        self.epb_pos = epb_pos
        self.sps = sps
        self.pps = pps
        self.hdr = hdr
        # availability region id: (slice index, tile id) packed so every
        # equality check (MPM/skip ctx/SAO merge/MotionDeriver) enforces
        # the spec 6.4.1 same-slice AND same-tile rule unchanged
        self.base_slice_idx = slice_idx
        self.tile_grid = None
        if pps.tiles_enabled:
            from ..hevc.params import TileGrid
            tg = getattr(pps, "_tile_grid", None)
            if tg is None:
                tg = TileGrid(pps, sps)
                pps._tile_grid = tg
            self.tile_grid = tg
        tile0 = (self.tile_grid.tile_of_addr(hdr.segment_address)
                 if self.tile_grid is not None else 0)
        self.slice_idx = (slice_idx << 12) | tile0
        self.ref_lists = ref_lists or [[], []]  # list of RefPic
        # dependent slice segments (9.3.1): the arithmetic engine restarts
        # byte-aligned, but the CONTEXT VARIABLES and the qPY_PREV chain
        # continue from the preceding segment's end state
        ctx = (bytearray(init_ctx) if init_ctx is not None
               else CT.init_contexts(hdr.slice_type, hdr.slice_qp,
                                     hdr.cabac_init_flag))
        self.rbsp = rbsp
        self.cabac = CabacDec(rbsp, data_start, ctx)
        self.qp = hdr.slice_qp
        self.min_cb = sps.log2_min_cb
        # CU QP delta state (spec 8.6.1): quantization groups
        qp0 = hdr.slice_qp if qp_prev is None else qp_prev
        self.qp_cur = qp0               # QP of current QG (pred + delta)
        self.qg_pred = qp0
        self._dqp_coded = True          # no parse unless enabled per QG
        self._cu_rect = (0, 0, 0)
        self.wpp_saved_ctx: bytearray | None = None
        # per-CU transient state
        self._cu_intra_modes = np.zeros((2, 2), np.int32)
        self._cu_chroma_mode = 0
        self._cu_part = PART_2Nx2N
        self._cu_tq_bypass = 0
        self._cu_pred_mode = MODE_INTRA

    # ------------------------------------------------------------ helpers
    def _in_pic(self, x: int, y: int) -> bool:
        return 0 <= x < self.sps.width and 0 <= y < self.sps.height

    def _same_slice(self, x: int, y: int) -> bool:
        return self.fs.slice_id[y >> 2, x >> 2] == self.slice_idx

    def _parsed_avail(self, x: int, y: int) -> bool:
        """Availability for mode prediction (left/above neighbors only)."""
        return self._in_pic(x, y) and self._same_slice(x, y)

    # ------------------------------------------------------------- driver
    def decode(self) -> None:
        sps = self.sps
        wctb = sps.pic_width_in_ctbs
        nctb = wctb * sps.pic_height_in_ctbs
        wpp = self.pps.entropy_coding_sync_enabled
        tg = self.tile_grid
        entry_idx = 0
        # the CTU walk is in TILE SCAN order (spec 6.5.1); without tiles the
        # tile scan degenerates to the raster scan
        ts = (int(tg.rs_to_ts[self.hdr.segment_address]) if tg is not None
              else self.hdr.segment_address)
        cur_tile = self.slice_idx & 0xFFF
        while True:
            addr = int(tg.ts_to_rs[ts]) if tg is not None else ts
            rx, ry = addr % wctb, addr // wctb
            if tg is not None:
                t = tg.tile_of_ctb[ry, rx]
                if t != cur_tile:
                    # new tile: fresh context init at the next entry point
                    byte_off = self._entry_byte_offset(entry_idx)
                    entry_idx += 1
                    ctx = CT.init_contexts(self.hdr.slice_type,
                                           self.hdr.slice_qp,
                                           self.hdr.cabac_init_flag)
                    self.cabac = CabacDec(self.rbsp, byte_off, ctx)
                    self.qp_cur = self.hdr.slice_qp
                    cur_tile = int(t)
                    self.slice_idx = (self.base_slice_idx << 12) | cur_tile
                    if getattr(self, "_md", None) is not None:
                        self._md.slice_idx = self.slice_idx
            if wpp and rx == 0 and ry > 0 \
                    and entry_idx < len(self.hdr.entry_points):
                # new CTB row: re-init engine at the entry point with the
                # context saved after CTB min(1, wctb-1) of the row above
                # (initSliceWPP; the saved ctx exists for any legal stream,
                # including 1-CTB-wide pictures where it is saved at rx==0)
                byte_off = self._entry_byte_offset(entry_idx)
                entry_idx += 1
                self.cabac = CabacDec(self.rbsp, byte_off, self.cabac.ctx)
                if self.wpp_saved_ctx is not None:
                    self.cabac.load_ctx(self.wpp_saved_ctx)
                self.qp_cur = self.hdr.slice_qp  # qPY_PREV reset per CTB row
            self._decode_ctu(rx, ry)
            if wpp and rx == min(1, wctb - 1):
                self.wpp_saved_ctx = self.cabac.save_ctx()
            end = self.cabac.decode_terminate()
            ts += 1
            if end or ts >= nctb:
                break

    def _entry_byte_offset(self, entry_idx: int) -> int:
        """Start byte (in the de-escaped rbsp) of WPP substream entry_idx+1.

        entry_points[i] holds the byte size of substream i as coded in the
        NAL unit, i.e. INCLUDING emulation-prevention bytes (7.4.7.1); we
        map the coded offset back onto the rbsp using the recorded EPB
        removal positions (HM's numEmulationPreventionBytes subtraction)."""
        coded = sum(self.hdr.entry_points[:entry_idx + 1])
        p = self.data_start
        left = coded
        for e in self.epb_pos:
            if e <= self.data_start:
                continue
            gap = e - p          # rbsp bytes until the EPB before rbsp[e]
            if left > gap:       # the coded range spans this EPB
                left -= gap + 1
                p = e
            else:
                break
        return min(p + left, len(self.rbsp))

    # ---------------------------------------------------------------- CTU
    def _decode_ctu(self, rx: int, ry: int) -> None:
        sps = self.sps
        log2 = sps.log2_ctb
        x0, y0 = rx << log2, ry << log2
        # mark slice id for this CTU's 4x4s (needed for availability checks
        # of subsequent blocks inside the CTU)
        cs = sps.ctb_size
        self.fs.slice_id[y0 >> 2:(y0 + cs) >> 2, x0 >> 2:(x0 + cs) >> 2] = self.slice_idx
        if self.hdr.sao_luma or self.hdr.sao_chroma:
            self._parse_sao(rx, ry)
        self._parse_cq(x0, y0, log2, 0)

    # ---------------------------------------------------------------- SAO
    def _parse_sao(self, rx: int, ry: int) -> None:
        dec = self.cabac
        fs = self.fs
        param = SaoCtuParam()
        merge_left = merge_up = 0
        if rx > 0 and self._same_slice((rx << self.sps.log2_ctb) - 1,
                                       ry << self.sps.log2_ctb):
            merge_left = dec.decode_bin(CTX_OFFSET["sao_merge"])
        if not merge_left and ry > 0 and self._same_slice(
                rx << self.sps.log2_ctb, (ry << self.sps.log2_ctb) - 1):
            merge_up = dec.decode_bin(CTX_OFFSET["sao_merge"])
        if merge_left:
            fs.sao[ry][rx] = fs.sao[ry][rx - 1]
            return
        if merge_up:
            fs.sao[ry][rx] = fs.sao[ry - 1][rx]
            return
        for c in range(3):
            enabled = self.hdr.sao_luma if c == 0 else self.hdr.sao_chroma
            if not enabled:
                continue
            if c == 2:
                param.type_idx[2] = param.type_idx[1]
                param.eo_class[2] = param.eo_class[1]
            else:
                t = 0
                if dec.decode_bin(CTX_OFFSET["sao_type"]):
                    t = 2 if dec.decode_bypass() else 1
                param.type_idx[c] = t
                if c == 1:
                    param.type_idx[2] = t
            t = param.type_idx[c]
            if t == 0:
                continue
            offs = []
            for _ in range(4):
                v = 0
                while v < 7 and dec.decode_bypass():
                    v += 1
                offs.append(v)
            if t == 1:  # band
                for i in range(4):
                    if offs[i] and dec.decode_bypass():
                        offs[i] = -offs[i]
                param.band_pos[c] = dec.decode_bypass_bins(5)
            else:  # edge: first two positive, last two negative
                offs = [offs[0], offs[1], -offs[2], -offs[3]]
                if c == 0:
                    param.eo_class[0] = dec.decode_bypass_bins(2)
                elif c == 1:
                    param.eo_class[1] = dec.decode_bypass_bins(2)
            if t == 1:
                param.offsets[c] = offs
            else:
                # EO offsets apply to categories 1,2,3,4
                param.offsets[c] = offs
        fs.sao[ry][rx] = param

    # --------------------------------------------------------- coding tree
    def _parse_cq(self, x0: int, y0: int, log2: int, depth: int) -> None:
        sps = self.sps
        size = 1 << log2
        if (self.pps.cu_qp_delta_enabled
                and depth <= self.pps.diff_cu_qp_delta_depth):
            self._enter_qg(x0, y0)
        inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
        split = 1
        if inside and log2 > self.min_cb:
            # split_cu_flag ctx from neighbor depths
            ctx = 0
            if self._parsed_avail(x0 - 1, y0):
                ctx += int(self.fs.cu_depth[y0 >> 2, (x0 - 1) >> 2] > depth)
            if self._parsed_avail(x0, y0 - 1):
                ctx += int(self.fs.cu_depth[(y0 - 1) >> 2, x0 >> 2] > depth)
            split = self.cabac.decode_bin(CTX_OFFSET["split_cu"] + ctx)
        elif log2 <= self.min_cb:
            split = 0
        if split:
            h = size >> 1
            for i, (dx, dy) in enumerate(((0, 0), (h, 0), (0, h), (h, h))):
                x1, y1 = x0 + dx, y0 + dy
                if x1 < sps.width and y1 < sps.height:
                    self._parse_cq(x1, y1, log2 - 1, depth + 1)
            return
        self._parse_cu(x0, y0, log2, depth)

    # -------------------------------------------------- quantization groups
    def _enter_qg(self, x0: int, y0: int) -> None:
        """Start a new quantization group (spec 8.6.1): derive qPY_PRED from
        the left/above neighbors inside the same CTB, else qPY_PREV (= QP of
        the last CU of the previous QG)."""
        fs = self.fs
        qp_prev = self.qp_cur
        log2_ctb = self.sps.log2_ctb

        def nbr_qp(xn: int, yn: int) -> int:
            if xn < 0 or yn < 0:
                return qp_prev
            # must be inside the current CTB (spec 8.6.1 availability)
            if (xn >> log2_ctb) != (x0 >> log2_ctb) or \
                    (yn >> log2_ctb) != (y0 >> log2_ctb):
                return qp_prev
            if not fs.mi_parsed[yn >> 2, xn >> 2] or \
                    fs.slice_id[yn >> 2, xn >> 2] != self.slice_idx:
                return qp_prev
            return int(fs.qp[yn >> 2, xn >> 2])

        qp_a = nbr_qp(x0 - 1, y0)
        qp_b = nbr_qp(x0, y0 - 1)
        self.qg_pred = (qp_a + qp_b + 1) >> 1
        self.qp_cur = self.qg_pred
        self._dqp_coded = False

    def _parse_cu_qp_delta(self) -> None:
        """cu_qp_delta_abs/sign (spec 7.3.8.11, 9.3.3): TU(5)+EG0."""
        dec = self.cabac
        v = 0
        if dec.decode_bin(CTX_OFFSET["dqp"]):
            v = 1
            while v < 5 and dec.decode_bin(CTX_OFFSET["dqp"] + 1):
                v += 1
            if v == 5:
                v += self._read_eg0()
        if v and dec.decode_bypass():
            v = -v
        self._dqp_coded = True
        self.qp_cur = (self.qg_pred + v + 52) % 52
        # HM semantics: the delta applies to the CURRENT CU (earlier CUs of
        # the QG keep the predicted QP they were assigned at parse time)
        x0, y0, size = self._cu_rect
        self.fs.qp[y0 >> 2:(y0 + size) >> 2,
                   x0 >> 2:(x0 + size) >> 2] = self.qp_cur

    def _read_eg0(self) -> int:
        dec = self.cabac
        value = 0
        count = 0
        while dec.decode_bypass():
            value += 1 << count
            count += 1
        if count:
            value += dec.decode_bypass_bins(count)
        return value

    # ----------------------------------------------------------------- CU
    def _parse_cu(self, x0: int, y0: int, log2: int, depth: int) -> None:
        fs = self.fs
        size = 1 << log2
        b4 = size >> 2
        x4, y4 = x0 >> 2, y0 >> 2
        fs.cu_depth[y4:y4 + b4, x4:x4 + b4] = depth
        self._cu_rect = (x0, y0, size)
        fs.qp[y4:y4 + b4, x4:x4 + b4] = self.qp_cur
        fs.cu_edge_v[y4:y4 + b4, x4] = True
        fs.cu_edge_h[y4, x4:x4 + b4] = True
        self._cu_tq_bypass = 0
        if self.pps.transquant_bypass_enabled:
            self._cu_tq_bypass = self.cabac.decode_bin(CTX_OFFSET["tq_bypass"])
        skip = 0
        if self.hdr.slice_type != I_SLICE:
            ctx = 0
            if self._parsed_avail(x0 - 1, y0):
                ctx += int(fs.skip[y4, x4 - 1])
            if self._parsed_avail(x0, y0 - 1):
                ctx += int(fs.skip[y4 - 1, x4])
            skip = self.cabac.decode_bin(CTX_OFFSET["skip"] + ctx)
        fs.skip[y4:y4 + b4, x4:x4 + b4] = bool(skip)
        if skip:
            self._parse_inter_skip(x0, y0, log2)
            return
        pred = MODE_INTRA
        if self.hdr.slice_type != I_SLICE:
            pred = (MODE_INTRA if self.cabac.decode_bin(CTX_OFFSET["pred_mode"])
                    else MODE_INTER)
        self._cu_pred_mode = pred
        fs.pred_mode[y4:y4 + b4, x4:x4 + b4] = pred
        part = PART_2Nx2N
        if pred == MODE_INTRA:
            if log2 == self.min_cb:
                if not self.cabac.decode_bin(CTX_OFFSET["part_size"]):
                    part = PART_NxN
                    if self.parse_only:
                        raise FastPathAbort("NxN")
        else:
            part = self._parse_part_mode_inter(log2)
        self._cu_part = part
        for (px, py, pw_, ph_) in self._pu_geometry(x0, y0, size, part):
            fs.pu_edge_v[py >> 2:(py + ph_) >> 2, px >> 2] = True
            fs.pu_edge_h[py >> 2, px >> 2:(px + pw_) >> 2] = True
        if pred == MODE_INTRA:
            if (self.sps.pcm_enabled and part == PART_2Nx2N
                    and self.sps.log2_min_pcm_cb <= log2
                    <= self.sps.log2_max_pcm_cb):
                # pcm_flag is a terminating bin; on 1 the engine stops and
                # raw samples follow from the next byte boundary (9.3.1)
                if self.cabac.decode_terminate():
                    self._decode_pcm(x0, y0, log2)
                    return
            self._parse_intra_modes(x0, y0, log2, part)
            fs.mi_parsed[y4:y4 + b4, x4:x4 + b4] = True
            self._parse_transform_tree_root(x0, y0, log2, depth, intra=True)
        else:
            self._parse_inter_cu(x0, y0, log2, part, depth)

    # ----------------------------------------------------------------- PCM
    def _decode_pcm(self, x0: int, y0: int, log2: int) -> None:
        """pcm_sample() (spec 7.3.8.7): raw 8-bit samples from the byte-
        aligned position after the pcm_flag terminate bin; the arithmetic
        engine re-initializes afterwards with contexts preserved (9.3.1)."""
        fs = self.fs
        assert self.sps.pcm_bit_depth_luma == 8 \
            and self.sps.pcm_bit_depth_chroma == 8
        size = 1 << log2
        csz = size >> 1
        pos = self.cabac.byte_align_position()
        total = size * size + 2 * csz * csz
        buf = np.frombuffer(self.rbsp, np.uint8, total, pos)
        fs.y[y0:y0 + size, x0:x0 + size] = \
            buf[:size * size].reshape(size, size)
        cx0, cy0 = x0 >> 1, y0 >> 1
        off = size * size
        fs.cb[cy0:cy0 + csz, cx0:cx0 + csz] = \
            buf[off:off + csz * csz].reshape(csz, csz)
        off += csz * csz
        fs.cr[cy0:cy0 + csz, cx0:cx0 + csz] = \
            buf[off:off + csz * csz].reshape(csz, csz)
        self.cabac = CabacDec(self.rbsp, pos + total, self.cabac.ctx)
        x4, y4, b4 = x0 >> 2, y0 >> 2, size >> 2
        fs.intra_mode[y4:y4 + b4, x4:x4 + b4] = 1    # DC for MPM neighbors
        fs.cbf_luma[y4:y4 + b4, x4:x4 + b4] = False
        fs.tu_edge_v[y4:y4 + b4, x4] = True
        fs.tu_edge_h[y4, x4:x4 + b4] = True
        fs.mi_parsed[y4:y4 + b4, x4:x4 + b4] = True
        fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True

    # --------------------------------------------------------- intra modes
    def _mpm_candidates(self, x0: int, y0: int, pu: int, part: int,
                        log2: int) -> list[int]:
        fs = self.fs
        size = 1 << log2
        ns = size >> 1
        if part == PART_NxN:
            px = x0 + (pu & 1) * ns
            py = y0 + (pu >> 1) * ns
        else:
            px, py = x0, y0
        # left neighbor (px-1, py)
        def nbr_mode(nx, ny, is_above):
            if not self._parsed_avail(nx, ny):
                return 1  # DC
            if is_above and (ny >> self.sps.log2_ctb) != (py >> self.sps.log2_ctb):
                return 1  # above outside current CTB
            if fs.pred_mode[ny >> 2, nx >> 2] != MODE_INTRA:
                return 1
            return int(fs.intra_mode[ny >> 2, nx >> 2])
        a = nbr_mode(px - 1, py, False)
        b = nbr_mode(px, py - 1, True)
        if a == b:
            if a < 2:
                return [0, 1, 26]
            return [a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]
        cands = [a, b]
        if 0 not in cands:
            cands.append(0)
        elif 1 not in cands:
            cands.append(1)
        else:
            cands.append(26)
        return cands

    def _parse_intra_modes(self, x0: int, y0: int, log2: int, part: int) -> None:
        dec = self.cabac
        fs = self.fs
        npu = 4 if part == PART_NxN else 1
        prev_flags = [dec.decode_bin(CTX_OFFSET["intra_pred"]) for _ in range(npu)]
        modes = []
        for pu in range(npu):
            cands = self._mpm_candidates(x0, y0, pu, part, log2)
            if prev_flags[pu]:
                idx = 0
                if dec.decode_bypass():
                    idx = 2 if dec.decode_bypass() else 1
                mode = cands[idx]
            else:
                sc = sorted(cands)
                mode = dec.decode_bypass_bins(5)
                for c in sc:
                    if mode >= c:
                        mode += 1
            modes.append(mode)
            # store for this PU area (needed before parsing next PU's MPM)
            size = 1 << log2
            ns = size >> 1 if part == PART_NxN else size
            px = x0 + (pu & 1) * ns if part == PART_NxN else x0
            py = y0 + (pu >> 1) * ns if part == PART_NxN else y0
            b4 = max(1, ns >> 2)
            fs.intra_mode[py >> 2:(py >> 2) + b4, px >> 2:(px >> 2) + b4] = mode
            fs.pred_mode[py >> 2:(py >> 2) + b4, px >> 2:(px >> 2) + b4] = MODE_INTRA
        self._cu_intra_modes = modes
        # chroma mode (one per CU for 4:2:0)
        if dec.decode_bin(CTX_OFFSET["chroma_pred"]):
            idx = dec.decode_bypass_bins(2)
            table = [0, 26, 10, 1]
            cm = table[idx]
            if cm == modes[0]:
                cm = 34
        else:
            cm = modes[0]  # DM
        self._cu_chroma_mode = cm

    # ------------------------------------------------------ transform tree
    def _parse_transform_tree_root(self, x0, y0, log2, cu_depth, intra,
                                   cbf_root=True):
        part = self._cu_part
        intra_split = intra and part == PART_NxN
        max_depth = (self.sps.max_transform_hierarchy_depth_intra + (1 if intra_split else 0)
                     if intra else self.sps.max_transform_hierarchy_depth_inter)
        self._tt_intra = intra
        self._tt_max_depth = max_depth
        self._tt_intra_split = intra_split
        self._tt_cu_log2 = log2
        self._tt_cu_x, self._tt_cu_y = x0, y0
        self._parse_transform_tree(x0, y0, x0, y0, log2, 0, 0, 1, 1)

    def _parse_transform_tree(self, x0, y0, x_base, y_base, log2, depth,
                              blk_idx, parent_cbf_cb, parent_cbf_cr):
        sps, dec = self.sps, self.cabac
        intra = self._tt_intra
        split = 0
        if (log2 <= sps.log2_max_tb and log2 > sps.log2_min_tb
                and depth < self._tt_max_depth
                and not (self._tt_intra_split and depth == 0)):
            split = dec.decode_bin(CTX_OFFSET["trans_subdiv"] + 5 - log2)
        else:
            inter_split = (sps.max_transform_hierarchy_depth_inter == 0
                           and not intra and self._cu_part != PART_2Nx2N
                           and depth == 0)
            split = int(log2 > sps.log2_max_tb
                        or (self._tt_intra_split and depth == 0)
                        or inter_split)
        cbf_cb, cbf_cr = parent_cbf_cb, parent_cbf_cr
        if log2 > 2:
            if depth == 0 or parent_cbf_cb:
                cbf_cb = dec.decode_bin(CTX_OFFSET["qt_cbf_chroma"] + depth)
            else:
                cbf_cb = 0
            if depth == 0 or parent_cbf_cr:
                cbf_cr = dec.decode_bin(CTX_OFFSET["qt_cbf_chroma"] + depth)
            else:
                cbf_cr = 0
        if split:
            if self.parse_only:
                raise FastPathAbort("TU split")
            h = 1 << (log2 - 1)
            self._parse_transform_tree(x0, y0, x0, y0, log2 - 1, depth + 1, 0,
                                       cbf_cb, cbf_cr)
            self._parse_transform_tree(x0 + h, y0, x0, y0, log2 - 1, depth + 1,
                                       1, cbf_cb, cbf_cr)
            self._parse_transform_tree(x0, y0 + h, x0, y0, log2 - 1, depth + 1,
                                       2, cbf_cb, cbf_cr)
            self._parse_transform_tree(x0 + h, y0 + h, x0, y0, log2 - 1,
                                       depth + 1, 3, cbf_cb, cbf_cr)
            return
        # leaf
        if intra or depth > 0 or cbf_cb or cbf_cr:
            cbf_luma = dec.decode_bin(CTX_OFFSET["qt_cbf_luma"]
                                      + (1 if depth == 0 else 0))
        else:
            cbf_luma = 1  # inter, depth 0, no chroma cbf -> luma inferred
        self._transform_unit(x0, y0, x_base, y_base, log2, depth, blk_idx,
                             cbf_luma, cbf_cb, cbf_cr)

    def _transform_unit(self, x0, y0, x_base, y_base, log2, depth, blk_idx,
                        cbf_luma, cbf_cb, cbf_cr):
        """Parse residuals and reconstruct this TU (and chroma when owned)."""
        fs = self.fs
        size = 1 << log2
        x4, y4, b4 = x0 >> 2, y0 >> 2, size >> 2
        fs.tu_edge_v[y4:y4 + b4, x4] = True
        fs.tu_edge_h[y4, x4:x4 + b4] = True
        fs.cbf_luma[y4:y4 + b4, x4:x4 + b4] = bool(cbf_luma)
        intra = self._tt_intra
        if (cbf_luma or cbf_cb or cbf_cr) and not self._dqp_coded:
            self._parse_cu_qp_delta()
        do_chroma = (log2 > 2) or (blk_idx == 3)
        c_log2 = (log2 - 1) if log2 > 2 else 2
        cx0, cy0 = (x0 >> 1, y0 >> 1) if log2 > 2 else (x_base >> 1, y_base >> 1)
        if self.parse_only:
            # residual levels into dense planes; no pixel work (the
            # batched wavefront reconstructs the frame in one dispatch)
            size_ = 1 << log2
            mode = self._intra_mode_at(x0, y0) if intra else None
            if cbf_luma:
                coeffs, _ts = self._residual(x0, y0, log2, 0, mode)
                fs.dec_coef_y[y0:y0 + size_, x0:x0 + size_] = coeffs
            fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True
            if do_chroma:
                cm = self._cu_chroma_mode if intra else None
                fs.dec_cmode8[cy0 >> 2, cx0 >> 2] = \
                    self._cu_chroma_mode if intra else 1
                csz = 1 << c_log2
                for c_idx, plane, cbf in ((1, fs.dec_coef_cb, cbf_cb),
                                          (2, fs.dec_coef_cr, cbf_cr)):
                    if cbf:
                        coeffs, _ts = self._residual(cx0, cy0, c_log2,
                                                     c_idx, cm)
                        plane[cy0:cy0 + csz, cx0:cx0 + csz] = coeffs
            return
        # luma
        if intra:
            mode = self._intra_mode_at(x0, y0)
            pred = self._intra_pred_block(0, x0, y0, size, mode)
            resi = None
            if cbf_luma:
                coeffs = self._residual(x0, y0, log2, 0, mode)
                resi = self._coeffs_to_residual(coeffs, log2, 0, intra)
            blk = reconstruct(pred, resi)
            fs.y[y0:y0 + size, x0:x0 + size] = blk
            fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True
            if do_chroma:
                cm = self._cu_chroma_mode
                csz = 1 << c_log2
                for c_idx, plane in ((1, fs.cb), (2, fs.cr)):
                    cbf = cbf_cb if c_idx == 1 else cbf_cr
                    # chroma cbf at 4x4-luma TUs lives on the parent; recon at
                    # blk_idx 3 covers the parent's chroma area
                    predc = self._intra_pred_block(c_idx, cx0, cy0, csz, cm)
                    resic = None
                    if cbf:
                        coeffs = self._residual(cx0, cy0, c_log2, c_idx, cm)
                        resic = self._coeffs_to_residual(coeffs, c_log2, c_idx, intra)
                    plane[cy0:cy0 + csz, cx0:cx0 + csz] = reconstruct(predc, resic)
        else:
            # inter: prediction was already written by MC; add residuals
            if cbf_luma:
                coeffs = self._residual(x0, y0, log2, 0, None)
                resi = self._coeffs_to_residual(coeffs, log2, 0, intra)
                blk = fs.y[y0:y0 + size, x0:x0 + size] + resi
                fs.y[y0:y0 + size, x0:x0 + size] = np.clip(blk, 0, 255)
            fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True
            if do_chroma:
                csz = 1 << c_log2
                for c_idx, plane, cbf in ((1, fs.cb, cbf_cb), (2, fs.cr, cbf_cr)):
                    if cbf:
                        coeffs = self._residual(cx0, cy0, c_log2, c_idx, None)
                        resic = self._coeffs_to_residual(coeffs, c_log2, c_idx, intra)
                        blk = plane[cy0:cy0 + csz, cx0:cx0 + csz] + resic
                        plane[cy0:cy0 + csz, cx0:cx0 + csz] = np.clip(blk, 0, 255)

    def _intra_mode_at(self, x0: int, y0: int) -> int:
        return int(self.fs.intra_mode[y0 >> 2, x0 >> 2])

    def _coeffs_to_residual(self, coeffs_and_flags, log2, c_idx, intra):
        coeffs, ts_flag = coeffs_and_flags
        if c_idx == 0:
            qp = self.qp_cur
        else:
            off = (self.pps.cb_qp_offset + self.hdr.cb_qp_offset if c_idx == 1
                   else self.pps.cr_qp_offset + self.hdr.cr_qp_offset)
            qp = chroma_qp(self.qp_cur + off)
        if self._cu_tq_bypass:
            return coeffs
        scaling = None
        if self.sps.scaling_list_enabled:
            scaling = self._scaling_matrix(log2, c_idx, intra)
        d = dequant(coeffs, qp, log2, 8, scaling)
        if ts_flag:
            return transform_skip_residual(d)
        is_dst = (log2 == 2 and c_idx == 0 and intra)
        return inverse_transform(d, log2, is_dst)

    def _scaling_matrix(self, log2, c_idx, intra):
        """Expand the scaling list for this TB (diag-scan ordered entries)."""
        sl = (self.pps.scaling_list if self.pps.scaling_list is not None
              else self.sps.scaling_list)
        if sl is None:
            return None
        size_id = log2 - 2
        matrix_id = (0 if intra else 3) + c_idx
        if size_id == 3:
            matrix_id = 0 if intra else 3  # 32x32: only luma lists
            if c_idx != 0:
                return None
        vals = sl.lists[size_id][matrix_id]
        n = 1 << log2
        if size_id == 0:
            m = np.zeros((n, n), np.int32)
            for i, (sx, sy) in enumerate(CT.SCAN_4x4[0]):
                m[sy, sx] = vals[i]
        else:
            # 8x8 base list (up-right diagonal order), upsampled; DC replaced
            base = np.zeros((8, 8), np.int32)
            for i, (sx, sy) in enumerate(CT.SCAN_SB[8][0]):
                base[sy, sx] = vals[i]
            f = n // 8
            m = np.repeat(np.repeat(base, f, 0), f, 1)
            if size_id > 1:
                m[0, 0] = sl.dc[size_id - 2][matrix_id]
        return m

    # ---------------------------------------------------- intra prediction
    def _intra_pred_block(self, c_idx: int, x0: int, y0: int, size: int,
                          mode: int) -> np.ndarray:
        left, corner, top = self._gather_refs(c_idx, x0, y0, size)
        if c_idx == 0:
            left, corner, top = intra_filter_refs(
                left, corner, top, size, mode,
                bool(self.sps.strong_intra_smoothing), 8, True)
        return intra_predict(mode, left, corner, top, size, 8, c_idx == 0)

    def _gather_refs(self, c_idx: int, x0: int, y0: int, size: int):
        """Reference sample gather + substitution (spec 8.4.4.2.2)."""
        fs = self.fs
        plane = (fs.y, fs.cb, fs.cr)[c_idx]
        shift = 0 if c_idx == 0 else 1
        pw = self.sps.width >> shift
        ph = self.sps.height >> shift
        cip = self.pps.constrained_intra_pred

        def avail(x, y):
            if x < 0 or y < 0 or x >= pw or y >= ph:
                return False
            lx, ly = x << shift, y << shift
            if not fs.recon_done[ly >> 2, lx >> 2]:
                return False
            if fs.slice_id[ly >> 2, lx >> 2] != self.slice_idx:
                return False
            if cip and fs.pred_mode[ly >> 2, lx >> 2] != MODE_INTRA:
                return False
            return True

        n2 = 2 * size
        # order: bottom-left up the left col, corner, across top to top-right
        vals = np.zeros(2 * n2 + 1, np.int32)
        ok = np.zeros(2 * n2 + 1, bool)
        # left col entries 0..n2-1 correspond to y = y0+n2-1 .. y0 (upward)
        for i in range(n2):
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
            vals[:] = 128
        else:
            if not ok[0]:
                first = int(np.argmax(ok))
                vals[0] = vals[first]
                ok[0] = True
            for i in range(1, 2 * n2 + 1):
                if not ok[i]:
                    vals[i] = vals[i - 1]
        left = vals[:n2][::-1].copy()   # top..bottom
        corner = int(vals[n2])
        top = vals[n2 + 1:].copy()
        return left, corner, top

    # ------------------------------------------------------------ residual
    def _residual(self, x0, y0, log2, c_idx, intra_mode):
        """residual_coding() (spec 7.3.8.11). Returns (coeffs, ts_flag)."""
        dec = self.cabac
        n = 1 << log2
        # scan selection
        scan_idx = 0
        if intra_mode is not None and (log2 == 2 or (log2 == 3 and c_idx == 0)):
            if 6 <= intra_mode <= 14:
                scan_idx = 2
            elif 22 <= intra_mode <= 30:
                scan_idx = 1
        parse_ts = int(self.pps.transform_skip_enabled
                       and not self._cu_tq_bypass and log2 == 2)
        if _native is not None and _native.HAVE_NATIVE:
            sbh_f = int(self.pps.sign_data_hiding_enabled
                        and not self._cu_tq_bypass)
            return _native.parse_residual(dec, log2, c_idx, scan_idx, sbh_f,
                                          parse_ts)
        ts_flag = 0
        if parse_ts:
            ts_flag = dec.decode_bin(CTX_OFFSET["transform_skip"]
                                     + (0 if c_idx == 0 else 1))
        # last significant position
        if c_idx == 0:
            ctx_off, ctx_shift = 3 * (log2 - 2) + ((log2 - 1) >> 2), (log2 + 1) >> 2
        else:
            ctx_off, ctx_shift = 15, log2 - 2
        cmax = (log2 << 1) - 1
        lx = 0
        while lx < cmax and dec.decode_bin(CTX_OFFSET["last_x"] + ctx_off
                                           + (lx >> ctx_shift)):
            lx += 1
        ly = 0
        while ly < cmax and dec.decode_bin(CTX_OFFSET["last_y"] + ctx_off
                                           + (ly >> ctx_shift)):
            ly += 1
        if lx > 3:
            nb = (lx >> 1) - 1
            lx = ((2 + (lx & 1)) << nb) + dec.decode_bypass_bins(nb)
        if ly > 3:
            nb = (ly >> 1) - 1
            ly = ((2 + (ly & 1)) << nb) + dec.decode_bypass_bins(nb)
        if scan_idx == 2:
            lx, ly = ly, lx
        sb_scan, in_scan = scan_order(log2, scan_idx)
        in_pos = {pos: i for i, pos in enumerate(in_scan)}
        sb_pos = {pos: i for i, pos in enumerate(sb_scan)}
        last_sb = sb_pos[(lx >> 2, ly >> 2)]
        last_n = in_pos[(lx & 3, ly & 3)]
        nsb = 1 << (log2 - 2)
        coeffs = np.zeros((n, n), np.int32)
        csbf = np.zeros((nsb, nsb), np.uint8)
        c1 = 1
        sbh = self.pps.sign_data_hiding_enabled and not self._cu_tq_bypass
        sig_base = CTX_OFFSET["sig_flag"]
        for i in range(last_sb, -1, -1):
            xs, ys = sb_scan[i]
            infer_dc = 0
            if i < last_sb and i > 0:
                ctx = min(1, int(csbf[ys, xs + 1] if xs + 1 < nsb else 0)
                          + int(csbf[ys + 1, xs] if ys + 1 < nsb else 0))
                if c_idx > 0:
                    ctx += 2
                coded = dec.decode_bin(CTX_OFFSET["sig_cg"] + ctx)
                infer_dc = 1
            else:
                coded = 1
            csbf[ys, xs] = coded
            if not coded:
                continue
            sig_ns = []
            if i == last_sb:
                sig_ns.append(last_n)
                start = last_n - 1
            else:
                start = 15
            csbf_r = int(csbf[ys, xs + 1]) if xs + 1 < nsb else 0
            csbf_b = int(csbf[ys + 1, xs]) if ys + 1 < nsb else 0
            prev_csbf = csbf_r + 2 * csbf_b
            for nn in range(start, -1, -1):
                if nn > 0 or not infer_dc:
                    xp, yp = in_scan[nn]
                    ctx_inc = self._sig_ctx(log2, c_idx, scan_idx, xs, ys,
                                            xp, yp, prev_csbf)
                    if dec.decode_bin(sig_base + ctx_inc):
                        sig_ns.append(nn)
                        infer_dc = 0
                else:
                    sig_ns.append(0)
            num_sig = len(sig_ns)
            if num_sig == 0:
                continue
            # greater1 / greater2
            ctx_set = 2 if (i > 0 and c_idx == 0) else 0
            if c1 == 0:
                ctx_set += 1
            c1 = 1
            one_base = CTX_OFFSET["one_flag"] + (0 if c_idx == 0 else 16)
            abs_base = CTX_OFFSET["abs_flag"] + (0 if c_idx == 0 else 4)
            gt1 = {}
            first_c2 = -1
            for k in range(min(num_sig, 8)):
                f = dec.decode_bin(one_base + ctx_set * 4 + c1)
                gt1[sig_ns[k]] = f
                if f:
                    c1 = 0
                    if first_c2 == -1:
                        first_c2 = sig_ns[k]
                elif 0 < c1 < 3:
                    c1 += 1
            gt2 = 0
            if first_c2 != -1:
                gt2 = dec.decode_bin(abs_base + ctx_set)
            last_pos_sb = sig_ns[0]
            first_pos_sb = sig_ns[-1]
            hidden = sbh and (last_pos_sb - first_pos_sb > 3)
            nsigns = num_sig - (1 if hidden else 0)
            sign_bits = dec.decode_bypass_bins(nsigns) if nsigns else 0
            # levels
            rice = 0
            first_coeff2 = 1
            total = 0
            levels = []
            for k, nn in enumerate(sig_ns):
                abs_lvl = 1 + gt1.get(nn, 0) + (gt2 if nn == first_c2 else 0)
                base_level = (2 + first_coeff2) if k < 8 else 1
                if abs_lvl == base_level:
                    rem = self._read_remain(rice)
                    abs_lvl = base_level + rem
                    if abs_lvl > 3 * (1 << rice):
                        rice = min(rice + 1, 4)
                if abs_lvl >= 2:
                    first_coeff2 = 0
                total += abs_lvl
                levels.append(abs_lvl)
            for k, nn in enumerate(sig_ns):
                xp, yp = in_scan[nn]
                lvl = levels[k]
                if hidden and k == num_sig - 1:
                    sign = total & 1
                else:
                    sign = (sign_bits >> (nsigns - 1 - k)) & 1
                coeffs[(ys << 2) + yp, (xs << 2) + xp] = -lvl if sign else lvl
        return coeffs, ts_flag

    def _sig_ctx(self, log2, c_idx, scan_idx, xs, ys, xp, yp, prev_csbf):
        return CT.sig_ctx_inc(log2, c_idx, scan_idx, xs, ys, xp, yp,
                              prev_csbf)

    def _read_remain(self, rice: int) -> int:
        dec = self.cabac
        prefix = 0
        while prefix < 32 and dec.decode_bypass():
            prefix += 1
        if prefix < 3:
            return (prefix << rice) + (dec.decode_bypass_bins(rice) if rice else 0)
        nb = prefix - 3 + rice
        suffix = dec.decode_bypass_bins(nb) if nb else 0
        return (((1 << (prefix - 3)) + 2) << rice) + suffix

    # ------------------------------------------------------------- inter
    def _parse_part_mode_inter(self, log2: int) -> int:
        """part_mode for inter CUs (spec 9.3.3.7, ctx table 9-37)."""
        dec = self.cabac
        base = CTX_OFFSET["part_size"]
        if dec.decode_bin(base):
            return PART_2Nx2N
        bin1 = dec.decode_bin(base + 1)
        if log2 == self.min_cb:
            if bin1:
                return PART_2NxN
            if log2 == 3:
                return PART_Nx2N           # no 8x8 inter NxN
            return PART_Nx2N if dec.decode_bin(base + 2) else PART_NxN
        amp = self.sps.amp_enabled
        if bin1:                           # horizontal class
            if not amp or dec.decode_bin(base + 3):
                return PART_2NxN
            return PART_2NxnD if dec.decode_bypass() else PART_2NxnU
        if not amp or dec.decode_bin(base + 3):
            return PART_Nx2N
        return PART_nRx2N if dec.decode_bypass() else PART_nLx2N

    def _pu_geometry(self, x0, y0, size, part):
        """PU rectangles (x, y, w, h) for a CU."""
        s, h, q = size, size >> 1, size >> 2
        if part == PART_2Nx2N:
            return [(x0, y0, s, s)]
        if part == PART_2NxN:
            return [(x0, y0, s, h), (x0, y0 + h, s, h)]
        if part == PART_Nx2N:
            return [(x0, y0, h, s), (x0 + h, y0, h, s)]
        if part == PART_NxN:
            return [(x0, y0, h, h), (x0 + h, y0, h, h),
                    (x0, y0 + h, h, h), (x0 + h, y0 + h, h, h)]
        if part == PART_2NxnU:
            return [(x0, y0, s, q), (x0, y0 + q, s, s - q)]
        if part == PART_2NxnD:
            return [(x0, y0, s, s - q), (x0, y0 + s - q, s, q)]
        if part == PART_nLx2N:
            return [(x0, y0, q, s), (x0 + q, y0, s - q, s)]
        return [(x0, y0, s - q, s), (x0 + s - q, y0, q, s)]

    def _parse_merge_idx(self) -> int:
        """merge_idx: TU cMax = MaxNumMergeCand-1; bin0 ctx, rest bypass."""
        dec = self.cabac
        cmax = self.hdr.max_num_merge_cand - 1
        if cmax == 0 or not dec.decode_bin(CTX_OFFSET["merge_idx"]):
            return 0
        idx = 1
        while idx < cmax and dec.decode_bypass():
            idx += 1
        return idx

    def _parse_ref_idx(self, lst: int) -> int:
        """ref_idx_lX: TU cMax = num_ref-1; bins 0,1 ctx-coded, rest bypass."""
        dec = self.cabac
        cmax = self.hdr.num_ref_idx[lst] - 1
        if cmax == 0 or not dec.decode_bin(CTX_OFFSET["ref_idx"]):
            return 0
        if cmax == 1 or not dec.decode_bin(CTX_OFFSET["ref_idx"] + 1):
            return 1
        idx = 2
        while idx < cmax and dec.decode_bypass():
            idx += 1
        return idx

    def _parse_mvd(self) -> list[int]:
        """mvd_coding (spec 7.3.8.9): returns [mvd_x, mvd_y]."""
        dec = self.cabac
        base = CTX_OFFSET["mvd"]
        gt0 = [dec.decode_bin(base), dec.decode_bin(base)]
        gt1 = [0, 0]
        for c in range(2):
            if gt0[c]:
                gt1[c] = dec.decode_bin(base + 1)
        mvd = [0, 0]
        for c in range(2):
            if gt0[c]:
                v = 1
                if gt1[c]:
                    v = 2 + self._read_eg1()
                if dec.decode_bypass():
                    v = -v
                mvd[c] = v
        return mvd

    def _read_eg1(self) -> int:
        """1st-order Exp-Golomb bypass value (abs_mvd_minus2, spec 9.3.3.3):
        prefix of m ones adds sum(1<<(1+i)); suffix is m+1 raw bins."""
        dec = self.cabac
        value = 0
        count = 1
        while dec.decode_bypass():
            value += 1 << count
            count += 1
        value += dec.decode_bypass_bins(count)
        return value

    def _parse_inter_skip(self, x0, y0, log2):
        """Skip CU: merge 2Nx2N, no residual (spec 7.3.8.5)."""
        fs = self.fs
        size = 1 << log2
        x4, y4, b4 = x0 >> 2, y0 >> 2, size >> 2
        self._cu_pred_mode = MODE_INTER
        fs.pred_mode[y4:y4 + b4, x4:x4 + b4] = MODE_INTER
        fs.pu_edge_v[y4:y4 + b4, x4] = True
        fs.pu_edge_h[y4, x4:x4 + b4] = True
        idx = self._parse_merge_idx()
        md = self._motion_deriver()
        cands = md.merge_candidates(x0, y0, size, x0, y0, size, size, 0,
                                    PART_2Nx2N)
        mi = cands[idx]
        self._store_motion_and_mc(x0, y0, size, size, mi)
        fs.cbf_luma[y4:y4 + b4, x4:x4 + b4] = False
        fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True

    def _motion_deriver(self):
        from .inter import MotionDeriver
        if getattr(self, "_md", None) is None:
            self._md = MotionDeriver(self.fs, self.sps, self.pps, self.hdr,
                                     self.ref_lists, self.slice_idx)
        return self._md

    def _store_motion_and_mc(self, xp, yp, nw, nh, mi) -> None:
        from .inter import motion_compensate
        fs = self.fs
        x4, y4 = xp >> 2, yp >> 2
        w4, h4 = max(1, nw >> 2), max(1, nh >> 2)
        sl = np.s_[y4:y4 + h4, x4:x4 + w4]
        fs.pred_mode[sl] = MODE_INTER
        for l in range(2):
            ri = mi.ref_idx[l]
            fs.ref_idx[l, y4:y4 + h4, x4:x4 + w4] = ri
            if ri >= 0 and ri < len(self.ref_lists[l]):
                fs.mv[l, y4:y4 + h4, x4:x4 + w4, 0] = mi.mv[l][0]
                fs.mv[l, y4:y4 + h4, x4:x4 + w4, 1] = mi.mv[l][1]
                rp = self.ref_lists[l][ri]
                fs.ref_poc[l, y4:y4 + h4, x4:x4 + w4] = rp.poc
                fs.ref_lt[l, y4:y4 + h4, x4:x4 + w4] = rp.is_long_term
            else:
                fs.mv[l, y4:y4 + h4, x4:x4 + w4, :] = 0
        fs.mi_parsed[sl] = True
        if self.parse_only:
            return    # MC runs on device from the stored motion field
        motion_compensate(fs, self.hdr, self.ref_lists, xp, yp, nw, nh, mi)

    def _parse_inter_cu(self, x0, y0, log2, part, depth):
        """Non-skip inter CU: PUs (merge or AMVP), then transform tree."""
        from .inter import MotionInfo
        dec = self.cabac
        fs = self.fs
        size = 1 << log2
        pus = self._pu_geometry(x0, y0, size, part)
        if self.parse_only and any(pw_ < 8 or ph_ < 8
                                   for (_, _, pw_, ph_) in pus):
            # batched MC carries motion per 8x8 cell; sub-8 PUs (2NxN on
            # an 8-CU, AMP quarters) need the scalar walk
            raise FastPathAbort("sub-8 PU")
        first_pu_merge = False
        for pidx, (xp, yp, nw, nh) in enumerate(pus):
            merge = dec.decode_bin(CTX_OFFSET["merge_flag"])
            if pidx == 0:
                first_pu_merge = bool(merge)
            md = self._motion_deriver()
            if merge:
                idx = self._parse_merge_idx()
                cands = md.merge_candidates(x0, y0, size, xp, yp, nw, nh,
                                            pidx, part)
                mi = cands[idx]
            else:
                mi = MotionInfo()
                if self.hdr.slice_type == B_SLICE:
                    base = CTX_OFFSET["inter_dir"]
                    if nw + nh != 12:
                        if dec.decode_bin(base + depth):
                            inter_dir = 2      # BI
                        else:
                            inter_dir = 1 if dec.decode_bin(base + 4) else 0
                    else:
                        inter_dir = 1 if dec.decode_bin(base + 4) else 0
                else:
                    inter_dir = 0              # P: L0 only
                for lst in (0, 1):
                    if inter_dir != 2 and inter_dir != lst:
                        continue
                    ri = self._parse_ref_idx(lst)
                    if lst == 1 and self.hdr.mvd_l1_zero and inter_dir == 2:
                        mvd = [0, 0]
                    else:
                        mvd = self._parse_mvd()
                    mvp_flag = dec.decode_bin(CTX_OFFSET["mvp_idx"])
                    cands = md.amvp_candidates(x0, y0, size, xp, yp, nw, nh,
                                               pidx, lst, ri)
                    mi.ref_idx[lst] = ri
                    mi.mv[lst] = [cands[mvp_flag][0] + mvd[0],
                                  cands[mvp_flag][1] + mvd[1]]
            self._store_motion_and_mc(xp, yp, nw, nh, mi)
        # rqt_root_cbf (not present for 2Nx2N merge; inferred 1)
        root_cbf = 1
        if not (part == PART_2Nx2N and first_pu_merge):
            root_cbf = dec.decode_bin(CTX_OFFSET["qt_root_cbf"])
        x4, y4, b4 = x0 >> 2, y0 >> 2, size >> 2
        if root_cbf:
            self._parse_transform_tree_root(x0, y0, log2, depth, intra=False)
        else:
            fs.cbf_luma[y4:y4 + b4, x4:x4 + b4] = False
            fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True
