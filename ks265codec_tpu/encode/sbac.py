"""CTU syntax writer: CABAC encoding of split flags, intra CU syntax,
transform trees and residual coding — the exact mirror of the parser in
decode/slice_dec.py (verified by round-trip: every stream we write must
re-parse bit-identically and decode under the reference AppDecoder).

Reference equivalents: CCtuSbac::{processCtuSbac, EncodeCodingUnitIntra,
EncodeTransformTree, residualCoding}, CEncCabacEngine (SURVEY.md 2.3
"CTU entropy coder"). Host component per the TPU architecture stance
(7.1): bit-serial work stays on CPU while the device computes the next
wavefront.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.cabac import CabacEnc

try:
    from .. import native as _native
except Exception:                      # pragma: no cover
    _native = None
from ..hevc import cabac_tables as CT
from ..hevc.cabac_tables import CTX_OFFSET, scan_order, sig_ctx_inc

MODE_INTER, MODE_INTRA = 0, 1


class CtuSyntaxWriter:
    """Writes one slice's CTU data. The caller walks CUs in z-order and
    calls the write_* methods with final decisions; neighbor context comes
    from the shared FrameState grids (same ones the decoder maintains)."""

    def __init__(self, fs, sps, pps, hdr, slice_idx: int = 0):
        self.fs = fs
        self.sps = sps
        self.pps = pps
        self.hdr = hdr
        self.slice_idx = slice_idx
        ctx = CT.init_contexts(hdr.slice_type, hdr.slice_qp,
                               hdr.cabac_init_flag)
        self.enc = CabacEnc(ctx)
        self.min_cb = sps.log2_min_cb
        self.qp_prev = hdr.slice_qp      # qPY_PREV chain (cu_qp_delta)
        self._dqp_coded = True

    # --------------------------------------------------------- availability
    def _avail(self, x: int, y: int) -> bool:
        if x < 0 or y < 0 or x >= self.sps.width or y >= self.sps.height:
            return False
        return (bool(self.fs.mi_parsed[y >> 2, x >> 2])
                and self.fs.slice_id[y >> 2, x >> 2] == self.slice_idx)

    # ----------------------------------------------------------------- SAO
    def write_sao(self, rx: int, ry: int, params) -> None:
        """sao() syntax per CTU — exact mirror of SliceDecoder._parse_sao.
        params: 2-D per-CTU SaoCtuParam grid (merge bits derived by value
        equality with the left/up neighbors)."""
        enc = self.enc
        hdr = self.hdr
        p = params[ry][rx]

        def same(a, b):
            return (a.type_idx == b.type_idx and a.offsets == b.offsets
                    and a.band_pos == b.band_pos
                    and a.eo_class == b.eo_class)

        log2 = self.sps.log2_ctb
        can_left = rx > 0 and self.fs.slice_id[
            (ry << log2) >> 2, ((rx << log2) - 1) >> 2] == self.slice_idx
        can_up = ry > 0 and self.fs.slice_id[
            ((ry << log2) - 1) >> 2, (rx << log2) >> 2] == self.slice_idx
        if can_left:
            merge_left = 1 if same(p, params[ry][rx - 1]) else 0
            enc.encode_bin(merge_left, CTX_OFFSET["sao_merge"])
            if merge_left:
                return
        if can_up:
            merge_up = 1 if same(p, params[ry - 1][rx]) else 0
            enc.encode_bin(merge_up, CTX_OFFSET["sao_merge"])
            if merge_up:
                return
        for c in range(3):
            enabled = hdr.sao_luma if c == 0 else hdr.sao_chroma
            if not enabled:
                continue
            t = p.type_idx[c]
            if c != 2:
                enc.encode_bin(1 if t else 0, CTX_OFFSET["sao_type"])
                if t:
                    enc.encode_bypass(1 if t == 2 else 0)
            if t == 0:
                continue
            offs = p.offsets[c]
            for v in offs:
                a = abs(int(v))
                for _ in range(a):
                    enc.encode_bypass(1)
                if a < 7:
                    enc.encode_bypass(0)
            if t == 1:
                for v in offs:
                    if v:
                        enc.encode_bypass(1 if v < 0 else 0)
                enc.encode_bypass_bins(p.band_pos[c], 5)
            else:
                if c == 0:
                    enc.encode_bypass_bins(p.eo_class[0], 2)
                elif c == 1:
                    enc.encode_bypass_bins(p.eo_class[1], 2)

    # -------------------------------------------------------------- quadtree
    def write_split_flag(self, x0: int, y0: int, log2: int, depth: int,
                         split: int) -> None:
        """split_cu_flag with neighbor-depth context (only when coded)."""
        sps = self.sps
        size = 1 << log2
        inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
        if not inside or log2 <= self.min_cb:
            return                      # inferred, nothing coded
        ctx = 0
        if self._avail(x0 - 1, y0):
            ctx += int(self.fs.cu_depth[y0 >> 2, (x0 - 1) >> 2] > depth)
        if self._avail(x0, y0 - 1):
            ctx += int(self.fs.cu_depth[(y0 - 1) >> 2, x0 >> 2] > depth)
        self.enc.encode_bin(split, CTX_OFFSET["split_cu"] + ctx)

    # -------------------------------------------------------------- inter CU
    def write_skip_flag(self, x0: int, y0: int, skip: int) -> None:
        fs = self.fs
        x4, y4 = x0 >> 2, y0 >> 2
        ctx = 0
        if self._avail(x0 - 1, y0):
            ctx += int(fs.skip[y4, x4 - 1])
        if self._avail(x0, y0 - 1):
            ctx += int(fs.skip[y4 - 1, x4])
        self.enc.encode_bin(skip, CTX_OFFSET["skip"] + ctx)

    # --------------------------------------------------- cu_qp_delta (QG)
    def begin_qg(self) -> None:
        """New quantization group (CTB at diff_cu_qp_delta_depth 0)."""
        self._dqp_coded = False

    def note_cu_qp(self, qp: int) -> None:
        """Track the last CU's (effective) QP: qPY_PREV for the next QG
        mirrors the decoder's chain exactly."""
        self._qg_last_qp = qp

    def end_qg(self) -> None:
        self.qp_prev = getattr(self, "_qg_last_qp", self.qp_prev)

    def maybe_write_dqp(self, qp: int) -> None:
        """cu_qp_delta_abs/sign at the first residual-bearing TU of the
        QG (spec 7.3.8.11, 9.3.3: TU(5) ctx 0/1 + EG0 + bypass sign)."""
        if not self.pps.cu_qp_delta_enabled or \
                getattr(self, "_dqp_coded", True):
            return
        self._dqp_coded = True
        enc = self.enc
        d = qp - self.qp_prev
        if d > 25:
            d -= 52
        elif d < -26:
            d += 52
        v = abs(d)
        enc.encode_bin(1 if v > 0 else 0, CTX_OFFSET["dqp"])
        if v:
            k = 1
            while k < 5 and k < v:
                enc.encode_bin(1, CTX_OFFSET["dqp"] + 1)
                k += 1
            if v < 5:
                enc.encode_bin(0, CTX_OFFSET["dqp"] + 1)
            else:
                self._write_eg0(v - 5)
            enc.encode_bypass(1 if d < 0 else 0)

    def _write_eg0(self, v: int) -> None:
        enc = self.enc
        cnt = 0
        v1 = v + 1
        while (v1 >> (cnt + 1)) > 0:
            cnt += 1
        for _ in range(cnt):
            enc.encode_bypass(1)
        enc.encode_bypass(0)
        for i in range(cnt - 1, -1, -1):
            enc.encode_bypass((v1 >> i) & 1)

    def write_pred_mode(self, intra: bool) -> None:
        self.enc.encode_bin(1 if intra else 0, CTX_OFFSET["pred_mode"])

    def write_part_2Nx2N_inter(self) -> None:
        self.enc.encode_bin(1, CTX_OFFSET["part_size"])

    def write_part_mode_inter(self, part: int, log2: int) -> None:
        """part_mode for inter CUs (mirror of the decoder's 9.3.3.7
        parse, incl. the AMP tree; NxN never emitted)."""
        base = CTX_OFFSET["part_size"]
        enc = self.enc
        if part == 0:                      # 2Nx2N
            enc.encode_bin(1, base)
            return
        enc.encode_bin(0, base)
        horizontal = part in (1, 4, 5)     # 2NxN / 2NxnU / 2NxnD
        enc.encode_bin(1 if horizontal else 0, base + 1)
        if log2 == self.min_cb:
            if not horizontal and log2 != 3:
                enc.encode_bin(1, base + 2)    # Nx2N (NxN not emitted)
            return
        if self.sps.amp_enabled:
            if part in (1, 2):
                enc.encode_bin(1, base + 3)
            else:                          # AMP: extra bin + bypass
                enc.encode_bin(0, base + 3)
                enc.encode_bypass(1 if part in (5, 7) else 0)

    def write_merge_flag(self, flag: int) -> None:
        self.enc.encode_bin(flag, CTX_OFFSET["merge_flag"])

    def write_merge_idx(self, idx: int) -> None:
        cmax = self.hdr.max_num_merge_cand - 1
        if cmax == 0:
            return
        self.enc.encode_bin(1 if idx > 0 else 0, CTX_OFFSET["merge_idx"])
        if idx > 0:
            for k in range(1, idx):
                self.enc.encode_bypass(1)
            if idx < cmax:
                self.enc.encode_bypass(0)

    def write_ref_idx(self, lst: int, idx: int) -> None:
        cmax = self.hdr.num_ref_idx[lst] - 1
        if cmax == 0:
            return
        self.enc.encode_bin(1 if idx > 0 else 0, CTX_OFFSET["ref_idx"])
        if idx == 0:
            return
        if cmax == 1:
            return
        self.enc.encode_bin(1 if idx > 1 else 0, CTX_OFFSET["ref_idx"] + 1)
        for k in range(2, idx):
            self.enc.encode_bypass(1)
        if 1 < idx < cmax:
            self.enc.encode_bypass(0)

    def write_mvd(self, mvd) -> None:
        """mvd_coding (spec 7.3.8.9) — inverse of the parser."""
        enc = self.enc
        base = CTX_OFFSET["mvd"]
        gt0 = [1 if mvd[0] else 0, 1 if mvd[1] else 0]
        enc.encode_bin(gt0[0], base)
        enc.encode_bin(gt0[1], base)
        gt1 = [1 if abs(mvd[0]) > 1 else 0, 1 if abs(mvd[1]) > 1 else 0]
        for c in range(2):
            if gt0[c]:
                enc.encode_bin(gt1[c], base + 1)
        for c in range(2):
            if gt0[c]:
                a = abs(mvd[c])
                if gt1[c]:
                    self._write_eg1(a - 2)
                enc.encode_bypass(1 if mvd[c] < 0 else 0)

    def _write_eg1(self, value: int) -> None:
        """1st-order Exp-Golomb bypass (inverse of _read_eg1)."""
        enc = self.enc
        count = 1
        v = value
        while v >= (1 << count):
            v -= 1 << count
            enc.encode_bypass(1)
            count += 1
        enc.encode_bypass(0)
        enc.encode_bypass_bins(v, count)

    def write_inter_dir(self, inter_dir: int, depth: int,
                        pb_sum: int) -> None:
        """inter_pred_idc (spec 9.3.3): 0=L0, 1=L1, 2=BI. pb_sum = nPbW+nPbH
        (no BI and no first bin when 12)."""
        base = CTX_OFFSET["inter_dir"]
        if pb_sum != 12:
            self.enc.encode_bin(1 if inter_dir == 2 else 0, base + depth)
            if inter_dir == 2:
                return
        self.enc.encode_bin(1 if inter_dir == 1 else 0, base + 4)

    def write_mvp_flag(self, flag: int) -> None:
        self.enc.encode_bin(flag, CTX_OFFSET["mvp_idx"])

    def write_rqt_root_cbf(self, flag: int) -> None:
        self.enc.encode_bin(flag, CTX_OFFSET["qt_root_cbf"])

    # ------------------------------------------------------------- intra CU
    def mpm_candidates(self, px: int, py: int) -> list[int]:
        """MPM list for PU at (px,py) — identical to the decoder's."""
        fs = self.fs

        def nbr_mode(nx, ny, is_above):
            if not self._avail(nx, ny):
                return 1
            if is_above and (ny >> self.sps.log2_ctb) != (py >> self.sps.log2_ctb):
                return 1
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

    def write_intra_cu_header(self, x0: int, y0: int, log2: int,
                              modes: list[int], chroma_mode: int,
                              part_nxn: bool = False) -> None:
        """pred_mode/part/prev_intra_pred/mpm_idx/rem_mode + chroma mode.

        The caller must NOT have stored this CU's modes in the grids yet for
        the first PU (MPM reads neighbors), and must store each PU's mode
        before the next PU's MPM — we handle the stores here to keep the
        ordering correct, exactly like the decoder does.
        """
        enc, fs = self.enc, self.fs
        if self.hdr.slice_type != 2:    # not I slice
            enc.encode_bin(1, CTX_OFFSET["pred_mode"])  # intra
        if log2 == self.min_cb:
            enc.encode_bin(0 if part_nxn else 1, CTX_OFFSET["part_size"])
        npu = 4 if part_nxn else 1
        size = 1 << log2
        ns = size >> 1 if part_nxn else size
        # pass 1: all prev_intra_luma_pred_flags (spec parse order)
        flags = []
        # MPM uses stored neighbor modes; PUs of this CU store as we go, so
        # precompute flags using a simulated store order
        mpms = []
        for pu in range(npu):
            px = x0 + (pu & 1) * ns if part_nxn else x0
            py = y0 + (pu >> 1) * ns if part_nxn else y0
            # store of previous PU already done below in same loop? parse
            # order requires all flags first; MPM of later PUs depends only
            # on left/above which for NxN PU1..3 are earlier PUs of this CU.
            # We therefore store each PU's mode into the grid immediately
            # after computing its mpm list (value known to caller).
            cands = self.mpm_candidates(px, py)
            mpms.append(cands)
            b4 = max(1, ns >> 2)
            fs.intra_mode[py >> 2:(py >> 2) + b4, px >> 2:(px >> 2) + b4] = modes[pu]
            fs.pred_mode[py >> 2:(py >> 2) + b4, px >> 2:(px >> 2) + b4] = MODE_INTRA
            fs.mi_parsed[py >> 2:(py >> 2) + b4, px >> 2:(px >> 2) + b4] = True
            flags.append(1 if modes[pu] in cands else 0)
        for pu in range(npu):
            enc.encode_bin(flags[pu], CTX_OFFSET["intra_pred"])
        for pu in range(npu):
            cands = mpms[pu]
            mode = modes[pu]
            if flags[pu]:
                idx = cands.index(mode)
                enc.encode_bypass(1 if idx else 0)
                if idx:
                    enc.encode_bypass(idx - 1)
            else:
                sc = sorted(cands)
                rem = mode
                for c in reversed(sc):
                    if rem > c:
                        rem -= 1
                enc.encode_bypass_bins(rem, 5)
        # chroma (4:2:0, one per CU)
        if chroma_mode == modes[0]:
            enc.encode_bin(0, CTX_OFFSET["chroma_pred"])  # DM
        else:
            table = [0, 26, 10, 1]
            mapped = list(table)
            for i, m in enumerate(table):
                if m == modes[0]:
                    mapped[i] = 34
            idx = mapped.index(chroma_mode)
            enc.encode_bin(1, CTX_OFFSET["chroma_pred"])
            enc.encode_bypass_bins(idx, 2)

    # -------------------------------------------------------- transform tree
    def write_split_transform_flag(self, log2: int, split: int) -> None:
        self.enc.encode_bin(split, CTX_OFFSET["trans_subdiv"] + 5 - log2)

    def write_cbf_chroma(self, cbf: int, depth: int) -> None:
        self.enc.encode_bin(cbf, CTX_OFFSET["qt_cbf_chroma"] + depth)

    def write_cbf_luma(self, cbf: int, depth: int) -> None:
        self.enc.encode_bin(cbf, CTX_OFFSET["qt_cbf_luma"]
                            + (1 if depth == 0 else 0))

    # ------------------------------------------------------- residual coding
    def write_residual(self, coeffs: np.ndarray, log2: int, c_idx: int,
                       intra_mode: int | None, ts: bool = False) -> None:
        """residual_coding() mirror of SliceDecoder._residual. coeffs int32
        (n,n) with at least one nonzero. ts: transform_skip_flag=1 (4x4
        TUs with the PPS flag enabled)."""
        enc = self.enc
        n = 1 << log2
        scan_idx = 0
        if intra_mode is not None and (log2 == 2 or (log2 == 3 and c_idx == 0)):
            if 6 <= intra_mode <= 14:
                scan_idx = 2
            elif 22 <= intra_mode <= 30:
                scan_idx = 1
        wtz = int(self.pps.transform_skip_enabled and log2 == 2)
        if _native is not None and _native.HAVE_NATIVE and not ts:
            try:
                _native.write_residual(enc, coeffs, log2, c_idx, scan_idx,
                                       wtz,
                                       int(self.pps.sign_data_hiding_enabled))
                return
            except OverflowError:
                pass    # engine state restored; use the Python writer
        if wtz:
            enc.encode_bin(1 if ts else 0, CTX_OFFSET["transform_skip"]
                           + (0 if c_idx == 0 else 1))
        sb_scan, in_scan = scan_order(log2, scan_idx)
        nsb = 1 << (log2 - 2)
        # last significant position in scan order
        last_sb = last_n = -1
        for i in range(len(sb_scan) - 1, -1, -1):
            xs, ys = sb_scan[i]
            blk = coeffs[ys << 2:(ys << 2) + 4, xs << 2:(xs << 2) + 4]
            if not blk.any():
                continue
            for nn in range(15, -1, -1):
                xp, yp = in_scan[nn]
                if blk[yp, xp]:
                    if last_sb < 0:
                        last_sb, last_n = i, nn
                    break
            if last_sb >= 0:
                break
        assert last_sb >= 0, "write_residual called with all-zero block"
        xs, ys = sb_scan[last_sb]
        xp, yp = in_scan[last_n]
        lx = (xs << 2) + xp
        ly = (ys << 2) + yp
        if scan_idx == 2:
            lx, ly = ly, lx
        # last_sig_coeff_x/y prefix+suffix (spec 9.3.3.2)
        if c_idx == 0:
            ctx_off, ctx_shift = 3 * (log2 - 2) + ((log2 - 1) >> 2), (log2 + 1) >> 2
        else:
            ctx_off, ctx_shift = 15, log2 - 2
        cmax = (log2 << 1) - 1
        # spec 7.3.8.11 order: both prefixes, then both suffixes
        self._write_last_prefix(lx, CTX_OFFSET["last_x"], ctx_off, ctx_shift,
                                cmax)
        self._write_last_prefix(ly, CTX_OFFSET["last_y"], ctx_off, ctx_shift,
                                cmax)
        self._write_last_suffix(lx)
        self._write_last_suffix(ly)

        csbf = np.zeros((nsb, nsb), np.uint8)
        for i in range(last_sb, -1, -1):
            xs, ys = sb_scan[i]
            blk = coeffs[ys << 2:(ys << 2) + 4, xs << 2:(xs << 2) + 4]
            csbf[ys, xs] = 1 if blk.any() else 0
        c1 = 1
        sbh = self.pps.sign_data_hiding_enabled
        for i in range(last_sb, -1, -1):
            xs, ys = sb_scan[i]
            blk = coeffs[ys << 2:(ys << 2) + 4, xs << 2:(xs << 2) + 4]
            coded = int(csbf[ys, xs])
            infer_dc = 0
            if i < last_sb and i > 0:
                ctx = min(1, int(csbf[ys, xs + 1] if xs + 1 < nsb else 0)
                          + int(csbf[ys + 1, xs] if ys + 1 < nsb else 0))
                if c_idx > 0:
                    ctx += 2
                enc.encode_bin(coded, CTX_OFFSET["sig_cg"] + ctx)
                infer_dc = 1
            else:
                coded = 1       # first and last subblocks always coded
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
            nonzero_before_dc = False
            for nn in range(start, -1, -1):
                xp, yp = in_scan[nn]
                sig = 1 if blk[yp, xp] else 0
                if nn > 0 or not infer_dc:
                    ctx_inc = sig_ctx_inc(log2, c_idx, scan_idx, xs, ys,
                                          xp, yp, prev_csbf)
                    enc.encode_bin(sig, CTX_OFFSET["sig_flag"] + ctx_inc)
                    if sig:
                        sig_ns.append(nn)
                        infer_dc = 0
                        nonzero_before_dc = True
                else:
                    # DC inferred significant (subblock coded, no sig yet)
                    sig_ns.append(0)
            num_sig = len(sig_ns)
            if num_sig == 0:
                continue
            ctx_set = 2 if (i > 0 and c_idx == 0) else 0
            if c1 == 0:
                ctx_set += 1
            c1 = 1
            one_base = CTX_OFFSET["one_flag"] + (0 if c_idx == 0 else 16)
            abs_base = CTX_OFFSET["abs_flag"] + (0 if c_idx == 0 else 4)
            levels = []
            for nn in sig_ns:
                xp, yp = in_scan[nn]
                levels.append(int(abs(blk[yp, xp])))
            gt1_flags = {}
            first_c2 = -1
            for k in range(min(num_sig, 8)):
                f = 1 if levels[k] > 1 else 0
                enc.encode_bin(f, one_base + ctx_set * 4 + c1)
                gt1_flags[sig_ns[k]] = f
                if f:
                    c1 = 0
                    if first_c2 == -1:
                        first_c2 = k
                elif 0 < c1 < 3:
                    c1 += 1
            if first_c2 != -1:
                enc.encode_bin(1 if levels[first_c2] > 2 else 0,
                               abs_base + ctx_set)
            # signs (no SBH in our streams — PPS disables it)
            hidden = sbh and (sig_ns[0] - sig_ns[-1] > 3)
            nsigns = num_sig - (1 if hidden else 0)
            for k in range(nsigns):
                xp, yp = in_scan[sig_ns[k]]
                enc.encode_bypass(1 if blk[yp, xp] < 0 else 0)
            # remaining levels
            rice = 0
            first_coeff2 = 1
            for k, nn in enumerate(sig_ns):
                base_level = (2 + first_coeff2) if k < 8 else 1
                lvl = levels[k]
                if lvl >= base_level:
                    self._write_remain(lvl - base_level, rice)
                    if lvl > 3 * (1 << rice):
                        rice = min(rice + 1, 4)
                if lvl >= 2:
                    first_coeff2 = 0

    def _write_last_prefix(self, val: int, base: int, ctx_off: int,
                           ctx_shift: int, cmax: int) -> None:
        """last_sig_coeff prefix: truncated unary over the group index."""
        enc = self.enc
        if val <= 3:
            group = val
        else:
            nb = val.bit_length() - 2
            group = ((nb + 1) << 1) + ((val >> nb) & 1)
        for k in range(group):
            enc.encode_bin(1, base + ctx_off + (k >> ctx_shift))
        if group < cmax:
            enc.encode_bin(0, base + ctx_off + (group >> ctx_shift))

    def _write_last_suffix(self, val: int) -> None:
        if val > 3:
            nb = val.bit_length() - 2
            suffix = val - ((2 + ((val >> nb) & 1)) << nb)
            self.enc.encode_bypass_bins(suffix, nb)

    def _write_remain(self, rem: int, rice: int) -> None:
        """coeff_abs_level_remaining: Golomb-Rice, EGk escape at prefix 3+
        (inverse of SliceDecoder._read_remain)."""
        enc = self.enc
        if (rem >> rice) < 3:
            prefix = rem >> rice
            for _ in range(prefix):
                enc.encode_bypass(1)
            enc.encode_bypass(0)
            if rice:
                enc.encode_bypass_bins(rem & ((1 << rice) - 1), rice)
        else:
            v = rem - (3 << rice)
            ell = 0
            while v >= (1 << (ell + rice)):
                v -= 1 << (ell + rice)
                ell += 1
            for _ in range(3 + ell):
                enc.encode_bypass(1)
            enc.encode_bypass(0)
            if ell + rice:
                enc.encode_bypass_bins(v, ell + rice)

    # ---------------------------------------------------------- terminate
    def end_ctu(self, last_in_slice: bool) -> None:
        self.enc.encode_terminate(1 if last_in_slice else 0)

    def finish(self) -> bytes:
        return self.enc.finish()

    # ------------------------------------------------- WPP substreams
    def _flush_engine_bytes(self) -> bytes:
        """Current engine -> byte-aligned bytes (finish + stop bit + zero
        align, HM encodeSliceFinish / xWritePCM share this)."""
        payload = bytearray(self.enc.finish())
        tv, tn = self.enc.get_tail_bits()
        acc = (tv << 1) | 1
        nb = tn + 1
        pad = (8 - nb % 8) % 8
        acc <<= pad
        nb += pad
        payload += int(acc).to_bytes(nb // 8, "big")
        return bytes(payload)

    def finish_substream(self) -> bytes:
        """Flush the current engine into byte-aligned substream bytes,
        prefixed by any PCM chunks emitted since the last flush."""
        payload = self._flush_engine_bytes()
        chunks = getattr(self, "_chunks", None)
        if chunks:
            payload = b"".join(chunks) + payload
            self._chunks = []
        return payload

    # ------------------------------------------------------------- PCM
    def write_pcm(self, sy, scb, scr) -> None:
        """pcm_flag=1 (terminate bin) + engine flush + aligned raw samples
        + engine reset with contexts preserved (HM xWritePCM)."""
        import numpy as np
        self.enc.encode_terminate(1)
        data = bytearray(self._flush_engine_bytes())
        data += np.ascontiguousarray(sy.astype(np.uint8)).tobytes()
        data += np.ascontiguousarray(scb.astype(np.uint8)).tobytes()
        data += np.ascontiguousarray(scr.astype(np.uint8)).tobytes()
        if not hasattr(self, "_chunks"):
            self._chunks = []
        self._chunks.append(bytes(data))
        self.enc = CabacEnc(self.enc.ctx)

    def write_pcm_flag0(self) -> None:
        self.enc.encode_terminate(0)

    def start_substream(self, saved_ctx) -> None:
        """New engine for the next CTB row, contexts inherited from the
        saved state after CTU 1 of the row above (initSliceWPP analog)."""
        ctx = self.enc.ctx            # same backing array
        ctx[:] = saved_ctx
        self.enc = CabacEnc(ctx)
