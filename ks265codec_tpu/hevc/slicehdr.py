"""Slice segment header: parse and write, including slice-local RPS,
reference list modification and prediction weight tables.

Equivalent of the reference's read_slice_segment_header /
readRefPicListsModification / readPredWightTable (SURVEY.md 2.4 "Slice
decode") and write_slice_segment_header (2.3 "Slice/header writer").
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..bitstream.bitio import BitReader, BitWriter
from ..bitstream.nal import NalType, is_idr, is_irap
from .params import PPS, SPS, ShortTermRPS, read_st_rps, write_st_rps

B_SLICE, P_SLICE, I_SLICE = 0, 1, 2


@dataclass
class PredWeight:
    flag: int = 0
    weight: int = 1 << 6
    offset: int = 0


@dataclass
class SliceHeader:
    nal_type: int = NalType.IDR_W_RADL
    temporal_id: int = 0
    first_slice_in_pic: int = 1
    no_output_of_prior_pics: int = 0
    pps_id: int = 0
    dependent_slice_segment: int = 0
    segment_address: int = 0
    slice_type: int = I_SLICE
    pic_output_flag: int = 1
    pic_order_cnt_lsb: int = 0
    st_rps: ShortTermRPS | None = None      # the active RPS (expanded)
    st_rps_idx: int = -1                    # index into SPS sets, -1 = explicit
    num_lt_pics: int = 0
    lt_poc: list[int] = field(default_factory=list)          # poc lsb or full
    lt_used: list[int] = field(default_factory=list)
    lt_msb_present: list[int] = field(default_factory=list)
    lt_delta_poc_msb: list[int] = field(default_factory=list)
    lt_from_sps: list[int] = field(default_factory=list)     # sps lt idx or -1
    temporal_mvp_enabled: int = 0
    sao_luma: int = 0
    sao_chroma: int = 0
    num_ref_idx: list[int] = field(default_factory=lambda: [0, 0])
    ref_list_modification: list[list[int]] | None = None      # per list
    mvd_l1_zero: int = 0
    cabac_init_flag: int = 0
    collocated_from_l0: int = 1
    collocated_ref_idx: int = 0
    luma_log2_weight_denom: int = 0
    chroma_log2_weight_denom: int = 0
    weights: list[list[list[PredWeight]]] | None = None  # [list][refidx][comp0..2]
    max_num_merge_cand: int = 5
    slice_qp: int = 26
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    deblocking_filter_override: int = 0
    deblocking_filter_disabled: int = 0
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0
    loop_filter_across_slices: int = 1
    num_entry_points: int = 0
    entry_points: list[int] = field(default_factory=list)   # offsets (bytes)
    # filled by decoder
    poc: int = 0

    @property
    def is_irap(self) -> bool:
        return is_irap(self.nal_type)

    @property
    def is_idr(self) -> bool:
        return is_idr(self.nal_type)


def _ceil_log2(n: int) -> int:
    return max(1, (n - 1).bit_length())


def parse_slice_header(rbsp: bytes, nal_type: int, temporal_id: int,
                       sps_map: dict[int, SPS], pps_map: dict[int, PPS],
                       ) -> tuple[SliceHeader, SPS, PPS, BitReader]:
    """Parse a slice segment header. Returns (header, sps, pps, reader) with
    the reader positioned at the first byte of slice data (byte-aligned)."""
    r = BitReader(rbsp)
    h = SliceHeader(nal_type=nal_type, temporal_id=temporal_id)
    h.first_slice_in_pic = r.read_bit()
    if is_irap(nal_type):
        h.no_output_of_prior_pics = r.read_bit()
    h.pps_id = r.read_ue()
    pps = pps_map[h.pps_id]
    sps = sps_map[pps.sps_id]
    num_ctbs = sps.pic_width_in_ctbs * sps.pic_height_in_ctbs
    if not h.first_slice_in_pic:
        if pps.dependent_slice_segments_enabled:
            h.dependent_slice_segment = r.read_bit()
        h.segment_address = r.read_bits(_ceil_log2(num_ctbs))
    if not h.dependent_slice_segment:
        for _ in range(pps.num_extra_slice_header_bits):
            r.read_bit()
        h.slice_type = r.read_ue()
        if pps.output_flag_present:
            h.pic_output_flag = r.read_bit()
        if sps.chroma_format_idc == 3:
            r.read_bits(2)  # colour_plane_id
        if not is_idr(nal_type):
            h.pic_order_cnt_lsb = r.read_bits(sps.log2_max_poc_lsb)
            if r.read_bit():  # short_term_ref_pic_set_sps_flag
                if len(sps.st_rps) > 1:
                    h.st_rps_idx = r.read_bits(_ceil_log2(len(sps.st_rps)))
                else:
                    h.st_rps_idx = 0
                h.st_rps = sps.st_rps[h.st_rps_idx]
            else:
                h.st_rps = read_st_rps(r, len(sps.st_rps), sps.st_rps, True,
                                       len(sps.st_rps))
            if sps.long_term_ref_pics_present:
                num_lt_sps = 0
                if len(sps.lt_ref_pic_poc_lsb) > 0:
                    num_lt_sps = r.read_ue()
                num_lt_slice = r.read_ue()
                h.num_lt_pics = num_lt_sps + num_lt_slice
                prev_msb = 0
                for i in range(h.num_lt_pics):
                    if i < num_lt_sps:
                        idx = 0
                        if len(sps.lt_ref_pic_poc_lsb) > 1:
                            idx = r.read_bits(_ceil_log2(len(sps.lt_ref_pic_poc_lsb)))
                        h.lt_from_sps.append(idx)
                        h.lt_poc.append(sps.lt_ref_pic_poc_lsb[idx])
                        h.lt_used.append(sps.used_by_curr_pic_lt[idx])
                    else:
                        h.lt_from_sps.append(-1)
                        h.lt_poc.append(r.read_bits(sps.log2_max_poc_lsb))
                        h.lt_used.append(r.read_bit())
                    msb_present = r.read_bit()
                    h.lt_msb_present.append(msb_present)
                    if msb_present:
                        d = r.read_ue()
                        if i == 0 or i == num_lt_sps:
                            msb = d
                        else:
                            msb = d + prev_msb
                        prev_msb = msb
                        h.lt_delta_poc_msb.append(msb)
                    else:
                        h.lt_delta_poc_msb.append(0)
            if sps.temporal_mvp_enabled:
                h.temporal_mvp_enabled = r.read_bit()
        else:
            h.st_rps = ShortTermRPS()
        if sps.sao_enabled:
            h.sao_luma = r.read_bit()
            h.sao_chroma = r.read_bit()
        if h.slice_type in (P_SLICE, B_SLICE):
            num_used = sum(h.st_rps.used) + sum(h.lt_used[:h.num_lt_pics])
            h.num_ref_idx = [pps.num_ref_idx_l0_default, pps.num_ref_idx_l1_default]
            if r.read_bit():  # num_ref_idx_active_override
                h.num_ref_idx[0] = r.read_ue() + 1
                if h.slice_type == B_SLICE:
                    h.num_ref_idx[1] = r.read_ue() + 1
            if h.slice_type != B_SLICE:
                h.num_ref_idx[1] = 0
            if pps.lists_modification_present and num_used > 1:
                h.ref_list_modification = _read_ref_list_mod(r, h, num_used)
            if h.slice_type == B_SLICE:
                h.mvd_l1_zero = r.read_bit()
            if pps.cabac_init_present:
                h.cabac_init_flag = r.read_bit()
            if h.temporal_mvp_enabled:
                if h.slice_type == B_SLICE:
                    h.collocated_from_l0 = r.read_bit()
                lst = 0 if h.collocated_from_l0 else 1
                if h.num_ref_idx[lst] > 1:
                    h.collocated_ref_idx = r.read_ue()
            if ((pps.weighted_pred and h.slice_type == P_SLICE) or
                    (pps.weighted_bipred and h.slice_type == B_SLICE)):
                _read_pred_weight_table(r, h)
            h.max_num_merge_cand = 5 - r.read_ue()
        h.slice_qp = pps.init_qp + r.read_se()
        if pps.slice_chroma_qp_offsets_present:
            h.cb_qp_offset = r.read_se()
            h.cr_qp_offset = r.read_se()
        if pps.deblocking_filter_control_present:
            if pps.deblocking_filter_override_enabled:
                h.deblocking_filter_override = r.read_bit()
            if h.deblocking_filter_override:
                h.deblocking_filter_disabled = r.read_bit()
                if not h.deblocking_filter_disabled:
                    h.beta_offset_div2 = r.read_se()
                    h.tc_offset_div2 = r.read_se()
            else:
                h.deblocking_filter_disabled = pps.deblocking_filter_disabled
                h.beta_offset_div2 = pps.beta_offset_div2
                h.tc_offset_div2 = pps.tc_offset_div2
        else:
            h.deblocking_filter_disabled = pps.deblocking_filter_disabled
            h.beta_offset_div2 = pps.beta_offset_div2
            h.tc_offset_div2 = pps.tc_offset_div2
        h.loop_filter_across_slices = pps.loop_filter_across_slices
        if (pps.loop_filter_across_slices and
                (h.sao_luma or h.sao_chroma or not h.deblocking_filter_disabled)):
            h.loop_filter_across_slices = r.read_bit()
    if pps.tiles_enabled or pps.entropy_coding_sync_enabled:
        h.num_entry_points = r.read_ue()
        if h.num_entry_points > 0:
            offset_len = r.read_ue() + 1
            h.entry_points = [r.read_bits(offset_len) + 1
                              for _ in range(h.num_entry_points)]
    if pps.slice_segment_header_extension_present:
        n = r.read_ue()
        for _ in range(n):
            r.read_bits(8)
    # byte_alignment()
    one = r.read_bit()
    assert one == 1, "slice header alignment bit"
    r.byte_align()
    return h, sps, pps, r


def _read_ref_list_mod(r: BitReader, h: SliceHeader, num_used: int):
    nbits = _ceil_log2(num_used)
    mods: list[list[int]] = [[], []]
    nlists = 2 if h.slice_type == B_SLICE else 1
    for lst in range(nlists):
        if r.read_bit():  # ref_pic_list_modification_flag_lX
            mods[lst] = [r.read_bits(nbits) for _ in range(h.num_ref_idx[lst])]
        else:
            mods[lst] = []
    return mods


def _read_pred_weight_table(r: BitReader, h: SliceHeader):
    h.luma_log2_weight_denom = r.read_ue()
    h.chroma_log2_weight_denom = h.luma_log2_weight_denom + r.read_se()
    nlists = 2 if h.slice_type == B_SLICE else 1
    h.weights = [[], []]
    for lst in range(nlists):
        luma_flags = [r.read_bit() for _ in range(h.num_ref_idx[lst])]
        chroma_flags = [r.read_bit() for _ in range(h.num_ref_idx[lst])]
        for i in range(h.num_ref_idx[lst]):
            comps = []
            wl = PredWeight(luma_flags[i], 1 << h.luma_log2_weight_denom, 0)
            if luma_flags[i]:
                wl.weight = (1 << h.luma_log2_weight_denom) + r.read_se()
                wl.offset = r.read_se()
            comps.append(wl)
            for _c in range(2):
                wc = PredWeight(chroma_flags[i], 1 << h.chroma_log2_weight_denom, 0)
                comps.append(wc)
            if chroma_flags[i]:
                for c in (1, 2):
                    dw = r.read_se()
                    do = r.read_se()
                    comps[c].weight = (1 << h.chroma_log2_weight_denom) + dw
                    shift = 1 << (h.chroma_log2_weight_denom - 1) if h.chroma_log2_weight_denom else 0
                    comps[c].offset = max(-128, min(127,
                        (do - ((128 * comps[c].weight) >> h.chroma_log2_weight_denom) + 128)))
            h.weights[lst].append(comps)


def _write_pred_weight_table(w: BitWriter, h: SliceHeader):
    """Mirror of _read_pred_weight_table (7.3.6.3). h.weights may be None
    (no WP chosen for this slice): identity flags are written so the
    table costs ~2 + 2*nref bits."""
    w.write_ue(h.luma_log2_weight_denom)
    w.write_se(h.chroma_log2_weight_denom - h.luma_log2_weight_denom)
    nlists = 2 if h.slice_type == B_SLICE else 1
    for lst in range(nlists):
        ws = (h.weights[lst] if h.weights is not None
              and lst < len(h.weights) else [])
        for i in range(h.num_ref_idx[lst]):
            w.write_bit(1 if i < len(ws) and ws[i][0].flag else 0)
        for i in range(h.num_ref_idx[lst]):
            w.write_bit(1 if i < len(ws) and ws[i][1].flag else 0)
        for i in range(h.num_ref_idx[lst]):
            comps = ws[i] if i < len(ws) else None
            if comps is not None and comps[0].flag:
                w.write_se(comps[0].weight
                           - (1 << h.luma_log2_weight_denom))
                w.write_se(comps[0].offset)
            if comps is not None and comps[1].flag:
                for c in (1, 2):
                    w.write_se(comps[c].weight
                               - (1 << h.chroma_log2_weight_denom))
                    # parse derives offset = clip(do - ((128*w)>>d) + 128)
                    w.write_se(comps[c].offset
                               + ((128 * comps[c].weight)
                                  >> h.chroma_log2_weight_denom) - 128)
    # h.weights=None (identity table, zero flags) needs no special state:
    # the decoder's weighted formula with identity entries is bit-exactly
    # the default combine ((p*64 + 2^11) >> 12 == (p + 32) >> 6), so the
    # encoder's unweighted MC matches the decoder's weighted path


def write_slice_header(h: SliceHeader, sps: SPS, pps: PPS) -> BitWriter:
    """Write a slice segment header; returns the BitWriter positioned after
    byte_alignment so CABAC data can be appended."""
    w = BitWriter()
    w.write_bit(h.first_slice_in_pic)
    if is_irap(h.nal_type):
        w.write_bit(h.no_output_of_prior_pics)
    w.write_ue(h.pps_id)
    num_ctbs = sps.pic_width_in_ctbs * sps.pic_height_in_ctbs
    if not h.first_slice_in_pic:
        if pps.dependent_slice_segments_enabled:
            w.write_bit(h.dependent_slice_segment)
        w.write_bits(h.segment_address, _ceil_log2(num_ctbs))
    if h.dependent_slice_segment:
        # dependent segments inherit the whole header body (7.3.6.1) —
        # only entry points + alignment follow the address
        if pps.tiles_enabled or pps.entropy_coding_sync_enabled:
            w.write_ue(h.num_entry_points)
            if h.num_entry_points:
                max_off = max(h.entry_points)
                offset_len = max(1, (max_off - 1).bit_length())
                w.write_ue(offset_len - 1)
                for ep in h.entry_points:
                    w.write_bits(ep - 1, offset_len)
        w.write_bit(1)
        w.byte_align_zero()
        return w
    w.write_ue(h.slice_type)
    if pps.output_flag_present:
        w.write_bit(h.pic_output_flag)
    if not is_idr(h.nal_type):
        w.write_bits(h.pic_order_cnt_lsb, sps.log2_max_poc_lsb)
        if h.st_rps_idx >= 0:
            w.write_bit(1)
            if len(sps.st_rps) > 1:
                w.write_bits(h.st_rps_idx, _ceil_log2(len(sps.st_rps)))
        else:
            w.write_bit(0)
            write_st_rps(w, h.st_rps, len(sps.st_rps))
        if sps.long_term_ref_pics_present:
            if len(sps.lt_ref_pic_poc_lsb) > 0:
                w.write_ue(0)  # num_long_term_sps
            w.write_ue(h.num_lt_pics)
            for i in range(h.num_lt_pics):
                w.write_bits(h.lt_poc[i], sps.log2_max_poc_lsb)
                w.write_bit(h.lt_used[i])
                w.write_bit(0)  # delta_poc_msb_present
        if sps.temporal_mvp_enabled:
            w.write_bit(h.temporal_mvp_enabled)
    if sps.sao_enabled:
        w.write_bit(h.sao_luma)
        w.write_bit(h.sao_chroma)
    if h.slice_type in (P_SLICE, B_SLICE):
        override = (h.num_ref_idx[0] != pps.num_ref_idx_l0_default or
                    (h.slice_type == B_SLICE and
                     h.num_ref_idx[1] != pps.num_ref_idx_l1_default))
        w.write_bit(1 if override else 0)
        if override:
            w.write_ue(h.num_ref_idx[0] - 1)
            if h.slice_type == B_SLICE:
                w.write_ue(h.num_ref_idx[1] - 1)
        num_used = sum(h.st_rps.used) + sum(h.lt_used[:h.num_lt_pics])
        if pps.lists_modification_present and num_used > 1:
            w.write_bit(0)
            if h.slice_type == B_SLICE:
                w.write_bit(0)
        if h.slice_type == B_SLICE:
            w.write_bit(h.mvd_l1_zero)
        if pps.cabac_init_present:
            w.write_bit(h.cabac_init_flag)
        if h.temporal_mvp_enabled:
            if h.slice_type == B_SLICE:
                w.write_bit(h.collocated_from_l0)
            lst = 0 if h.collocated_from_l0 else 1
            if h.num_ref_idx[lst] > 1:
                w.write_ue(h.collocated_ref_idx)
        if ((pps.weighted_pred and h.slice_type == P_SLICE) or
                (pps.weighted_bipred and h.slice_type == B_SLICE)):
            _write_pred_weight_table(w, h)
        w.write_ue(5 - h.max_num_merge_cand)
    w.write_se(h.slice_qp - pps.init_qp)
    if pps.slice_chroma_qp_offsets_present:
        w.write_se(h.cb_qp_offset)
        w.write_se(h.cr_qp_offset)
    if pps.deblocking_filter_control_present:
        if pps.deblocking_filter_override_enabled:
            w.write_bit(h.deblocking_filter_override)
        if h.deblocking_filter_override:
            w.write_bit(h.deblocking_filter_disabled)
            if not h.deblocking_filter_disabled:
                w.write_se(h.beta_offset_div2)
                w.write_se(h.tc_offset_div2)
    if (pps.loop_filter_across_slices and
            (h.sao_luma or h.sao_chroma or not h.deblocking_filter_disabled)):
        w.write_bit(h.loop_filter_across_slices)
    if pps.tiles_enabled or pps.entropy_coding_sync_enabled:
        w.write_ue(h.num_entry_points)
        if h.num_entry_points:
            max_off = max(h.entry_points)
            offset_len = max(1, (max_off - 1).bit_length())
            w.write_ue(offset_len - 1)
            for ep in h.entry_points:
                w.write_bits(ep - 1, offset_len)
    # byte_alignment
    w.write_bit(1)
    w.byte_align_zero()
    return w
