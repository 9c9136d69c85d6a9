"""HEVC parameter sets: VPS / SPS / PPS (+ PTL, short-term RPS, VUI,
scaling lists) — parse and write.

Equivalent of the reference's DecParameterSetReader.cpp (parseVPS/parseSPS/
parsePPS, readTileGrid, readVUI, read(Explicit)ScalingList, verify*) and
EncParameterSetWrite.cpp (init_/write_ *_parameter_set) — SURVEY.md 2.3/2.4.
Syntax follows ITU-T H.265 (we only target Main / Main Still Picture,
8-bit 4:2:0, like the reference: qy265enc.h:56).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..bitstream.bitio import BitReader, BitWriter


# ------------------------------------------------------------------ PTL

@dataclass
class ProfileTierLevel:
    general_profile_space: int = 0
    general_tier_flag: int = 0
    general_profile_idc: int = 1  # Main
    general_profile_compatibility_flags: int = 1 << (31 - 1)  # bit for idc 1
    general_progressive_source_flag: int = 1
    general_interlaced_source_flag: int = 0
    general_non_packed_constraint_flag: int = 0
    general_frame_only_constraint_flag: int = 1
    general_level_idc: int = 120  # level 4.0
    sub_layer_profile_present: list[int] = field(default_factory=list)
    sub_layer_level_present: list[int] = field(default_factory=list)
    sub_layer_level_idc: list[int] = field(default_factory=list)


def read_ptl(r: BitReader, max_sub_layers_minus1: int) -> ProfileTierLevel:
    p = ProfileTierLevel()
    p.general_profile_space = r.read_bits(2)
    p.general_tier_flag = r.read_bit()
    p.general_profile_idc = r.read_bits(5)
    p.general_profile_compatibility_flags = r.read_bits(32)
    p.general_progressive_source_flag = r.read_bit()
    p.general_interlaced_source_flag = r.read_bit()
    p.general_non_packed_constraint_flag = r.read_bit()
    p.general_frame_only_constraint_flag = r.read_bit()
    r.read_bits(32)
    r.read_bits(12)  # general_reserved_zero_44bits
    p.general_level_idc = r.read_bits(8)
    pp = [r.read_bit() for _ in range(max_sub_layers_minus1)]
    ll = [r.read_bit() for _ in range(max_sub_layers_minus1)]
    p.sub_layer_profile_present, p.sub_layer_level_present = pp, ll
    if max_sub_layers_minus1 > 0:
        for _ in range(max_sub_layers_minus1, 8):
            r.read_bits(2)  # reserved_zero_2bits
    for i in range(max_sub_layers_minus1):
        if pp[i]:
            # sub_layer profile space/tier/idc (8) + compat flags (32) +
            # source/constraint flags (4) + reserved_zero_44bits = 88 bits
            r.read_bits(32)
            r.read_bits(32)
            r.read_bits(24)
        if ll[i]:
            p.sub_layer_level_idc.append(r.read_bits(8))
    return p


def write_ptl(w: BitWriter, p: ProfileTierLevel, max_sub_layers_minus1: int = 0):
    w.write_bits(p.general_profile_space, 2)
    w.write_bit(p.general_tier_flag)
    w.write_bits(p.general_profile_idc, 5)
    w.write_bits(p.general_profile_compatibility_flags, 32)
    w.write_bit(p.general_progressive_source_flag)
    w.write_bit(p.general_interlaced_source_flag)
    w.write_bit(p.general_non_packed_constraint_flag)
    w.write_bit(p.general_frame_only_constraint_flag)
    w.write_bits(0, 32)
    w.write_bits(0, 12)
    w.write_bits(p.general_level_idc, 8)
    assert max_sub_layers_minus1 == 0, "sub-layer PTL writing not needed yet"


# ------------------------------------------------------------------ RPS

@dataclass
class ShortTermRPS:
    """Decoded (expanded) short-term reference picture set."""
    delta_pocs: list[int] = field(default_factory=list)   # negative first, sorted
    used: list[int] = field(default_factory=list)
    num_negative: int = 0
    num_positive: int = 0


def read_st_rps(r: BitReader, idx: int, rps_list: list[ShortTermRPS],
                is_slice_header: bool, num_st_rps: int) -> ShortTermRPS:
    """Parse st_ref_pic_set(idx). rps_list holds previously parsed sets."""
    rps = ShortTermRPS()
    inter_pred = 0
    if idx != 0:
        inter_pred = r.read_bit()
    if inter_pred:
        if is_slice_header:
            delta_idx_minus1 = r.read_ue()
        else:
            delta_idx_minus1 = 0
        ref_idx = idx - 1 - delta_idx_minus1
        ref = rps_list[ref_idx]
        delta_rps_sign = r.read_bit()
        abs_delta_rps_minus1 = r.read_ue()
        delta_rps = (1 - 2 * delta_rps_sign) * (abs_delta_rps_minus1 + 1)
        num_delta_pocs = ref.num_negative + ref.num_positive
        use_flags = []
        for j in range(num_delta_pocs + 1):
            used_by_curr = r.read_bit()
            use_delta = 1
            if not used_by_curr:
                use_delta = r.read_bit()
            use_flags.append((used_by_curr, use_delta))
        # expand (spec 7.4.8 derivation, eq. 7-57..7-60)
        ref_all = list(ref.delta_pocs)  # S0 entries then S1 entries
        neg = []
        for j in range(ref.num_positive - 1, -1, -1):
            d = ref_all[ref.num_negative + j] + delta_rps
            u, ud = use_flags[ref.num_negative + j]
            if d < 0 and ud:
                neg.append((d, u))
        u, ud = use_flags[num_delta_pocs]
        if delta_rps < 0 and ud:
            neg.append((delta_rps, u))
        for j in range(ref.num_negative):
            d = ref_all[j] + delta_rps
            u, ud = use_flags[j]
            if d < 0 and ud:
                neg.append((d, u))
        pos = []
        for j in range(ref.num_negative - 1, -1, -1):
            d = ref_all[j] + delta_rps
            u, ud = use_flags[j]
            if d > 0 and ud:
                pos.append((d, u))
        if delta_rps > 0 and use_flags[num_delta_pocs][1]:
            pos.append((delta_rps, use_flags[num_delta_pocs][0]))
        for j in range(ref.num_positive):
            d = ref_all[ref.num_negative + j] + delta_rps
            u, ud = use_flags[ref.num_negative + j]
            if d > 0 and ud:
                pos.append((d, u))
        rps.num_negative = len(neg)
        rps.num_positive = len(pos)
        rps.delta_pocs = [d for d, _ in neg] + [d for d, _ in pos]
        rps.used = [u for _, u in neg] + [u for _, u in pos]
    else:
        num_neg = r.read_ue()
        num_pos = r.read_ue()
        rps.num_negative, rps.num_positive = num_neg, num_pos
        poc = 0
        for _ in range(num_neg):
            poc -= r.read_ue() + 1
            rps.delta_pocs.append(poc)
            rps.used.append(r.read_bit())
        poc = 0
        for _ in range(num_pos):
            poc += r.read_ue() + 1
            rps.delta_pocs.append(poc)
            rps.used.append(r.read_bit())
    return rps


def write_st_rps(w: BitWriter, rps: ShortTermRPS, idx: int):
    """Write st_ref_pic_set without inter-RPS prediction (always explicit)."""
    if idx != 0:
        w.write_bit(0)  # inter_ref_pic_set_prediction_flag
    w.write_ue(rps.num_negative)
    w.write_ue(rps.num_positive)
    prev = 0
    for i in range(rps.num_negative):
        d = rps.delta_pocs[i]
        w.write_ue(prev - d - 1)
        prev = d
        w.write_bit(rps.used[i])
    prev = 0
    for i in range(rps.num_positive):
        d = rps.delta_pocs[rps.num_negative + i]
        w.write_ue(d - prev - 1)
        prev = d
        w.write_bit(rps.used[rps.num_negative + i])


# ------------------------------------------------------------------ VUI

@dataclass
class VUI:
    aspect_ratio_idc: int = 0
    sar_width: int = 0
    sar_height: int = 0
    video_signal_type_present: int = 0
    video_format: int = 5
    video_full_range_flag: int = 0
    colour_description_present: int = 0
    colour_primaries: int = 2
    transfer_characteristics: int = 2
    matrix_coeffs: int = 2
    frame_field_info_present: int = 0
    timing_info_present: int = 0
    num_units_in_tick: int = 0
    time_scale: int = 0


def read_vui(r: BitReader, sps) -> VUI:
    v = VUI()
    if r.read_bit():  # aspect_ratio_info_present
        v.aspect_ratio_idc = r.read_bits(8)
        if v.aspect_ratio_idc == 255:
            v.sar_width = r.read_bits(16)
            v.sar_height = r.read_bits(16)
    if r.read_bit():  # overscan_info_present
        r.read_bit()
    v.video_signal_type_present = r.read_bit()
    if v.video_signal_type_present:
        v.video_format = r.read_bits(3)
        v.video_full_range_flag = r.read_bit()
        v.colour_description_present = r.read_bit()
        if v.colour_description_present:
            v.colour_primaries = r.read_bits(8)
            v.transfer_characteristics = r.read_bits(8)
            v.matrix_coeffs = r.read_bits(8)
    if r.read_bit():  # chroma_loc_info_present
        r.read_ue()
        r.read_ue()
    r.read_bit()  # neutral_chroma_indication_flag
    r.read_bit()  # field_seq_flag
    v.frame_field_info_present = r.read_bit()
    if r.read_bit():  # default_display_window_flag
        for _ in range(4):
            r.read_ue()
    v.timing_info_present = r.read_bit()
    if v.timing_info_present:
        v.num_units_in_tick = r.read_bits(32)
        v.time_scale = r.read_bits(32)
        if r.read_bit():  # poc_proportional_to_timing
            r.read_ue()
        if r.read_bit():  # hrd_parameters_present
            _skip_hrd(r, sps.max_sub_layers_minus1)
    if r.read_bit():  # bitstream_restriction_flag
        r.read_bit(); r.read_bit(); r.read_bit()
        r.read_ue(); r.read_ue(); r.read_ue(); r.read_ue(); r.read_ue()
    return v


def write_vui(w: BitWriter, v: VUI) -> None:
    """Mirror of read_vui for the fields we emit (timing + signal type)."""
    w.write_bit(0)   # aspect_ratio_info_present
    w.write_bit(0)   # overscan_info_present
    w.write_bit(v.video_signal_type_present)
    if v.video_signal_type_present:
        w.write_bits(v.video_format, 3)
        w.write_bit(v.video_full_range_flag)
        w.write_bit(v.colour_description_present)
        if v.colour_description_present:
            w.write_bits(v.colour_primaries, 8)
            w.write_bits(v.transfer_characteristics, 8)
            w.write_bits(v.matrix_coeffs, 8)
    w.write_bit(0)   # chroma_loc_info_present
    w.write_bit(0)   # neutral_chroma_indication
    w.write_bit(0)   # field_seq
    w.write_bit(v.frame_field_info_present)
    w.write_bit(0)   # default_display_window
    w.write_bit(v.timing_info_present)
    if v.timing_info_present:
        w.write_bits(v.num_units_in_tick, 32)
        w.write_bits(v.time_scale, 32)
        w.write_bit(0)   # poc_proportional_to_timing
        w.write_bit(0)   # hrd_parameters_present
    w.write_bit(0)   # bitstream_restriction


def _skip_hrd(r: BitReader, max_sub_layers_minus1: int):
    nal_hrd = r.read_bit()
    vcl_hrd = r.read_bit()
    sub_pic = 0
    if nal_hrd or vcl_hrd:
        sub_pic = r.read_bit()
        if sub_pic:
            r.read_bits(8); r.read_bits(5); r.read_bit(); r.read_bits(5)
        r.read_bits(4); r.read_bits(4)
        if sub_pic:
            r.read_bits(4)
        r.read_bits(5); r.read_bits(5); r.read_bits(5)
    for i in range(max_sub_layers_minus1 + 1):
        fixed_rate_general = r.read_bit()
        fixed_rate_within_cvs = r.read_bit() if not fixed_rate_general else 1
        low_delay = 0
        if fixed_rate_within_cvs:
            r.read_ue()
        else:
            low_delay = r.read_bit()
        cpb_cnt = 1 if low_delay else r.read_ue() + 1
        for hrd in (nal_hrd, vcl_hrd):
            if hrd:
                for _ in range(cpb_cnt):
                    r.read_ue(); r.read_ue()
                    if sub_pic:
                        r.read_ue(); r.read_ue()
                    r.read_bit()


# ------------------------------------------------------------- scaling list

DEFAULT_SCALING_4x4 = [16] * 16
DEFAULT_SCALING_8x8_INTRA = [
    16, 16, 16, 16, 17, 18, 21, 24, 16, 16, 16, 16, 17, 19, 22, 25,
    16, 16, 17, 18, 20, 22, 25, 29, 16, 16, 18, 21, 24, 27, 31, 36,
    17, 17, 20, 24, 30, 35, 41, 47, 18, 19, 22, 27, 35, 44, 54, 65,
    21, 22, 25, 31, 41, 54, 70, 88, 24, 25, 29, 36, 47, 65, 88, 115]
DEFAULT_SCALING_8x8_INTER = [
    16, 16, 16, 16, 17, 18, 20, 24, 16, 16, 16, 17, 18, 20, 24, 25,
    16, 16, 17, 18, 20, 24, 25, 28, 16, 17, 18, 20, 24, 25, 28, 33,
    17, 18, 20, 24, 25, 28, 33, 41, 18, 20, 24, 25, 28, 33, 41, 54,
    20, 24, 25, 28, 33, 41, 54, 71, 24, 25, 28, 33, 41, 54, 71, 91]


@dataclass
class ScalingListData:
    """scaling_list[sizeId][matrixId] -> flat list (up-right diag order applied
    later); dc[sizeId-2][matrixId] for 16x16/32x32."""
    lists: list[list[list[int]]] = field(default_factory=list)
    dc: list[list[int]] = field(default_factory=list)

    @staticmethod
    def default() -> "ScalingListData":
        s = ScalingListData()
        for size_id in range(4):
            n = 6 if size_id != 3 else 6
            mats = []
            for m in range(n):
                if size_id == 0:
                    mats.append(list(DEFAULT_SCALING_4x4))
                else:
                    intra = (m < 3)
                    mats.append(list(DEFAULT_SCALING_8x8_INTRA if intra
                                     else DEFAULT_SCALING_8x8_INTER))
            s.lists.append(mats)
        s.dc = [[16] * 6, [16] * 6]
        return s


def read_scaling_list(r: BitReader) -> ScalingListData:
    s = ScalingListData.default()
    for size_id in range(4):
        m = 0
        while m < 6:
            pred_mode = r.read_bit()
            if not pred_mode:
                delta = r.read_ue()
                if delta != 0:
                    ref = m - delta
                    s.lists[size_id][m] = list(s.lists[size_id][ref])
                    if size_id > 1:
                        s.dc[size_id - 2][m] = s.dc[size_id - 2][ref]
                # delta==0 -> default (already set)
            else:
                coef_num = min(64, 1 << (4 + (size_id << 1)))
                next_coef = 8
                if size_id > 1:
                    dc_minus8 = r.read_se()
                    s.dc[size_id - 2][m] = dc_minus8 + 8
                    next_coef = dc_minus8 + 8
                coefs = []
                for _ in range(coef_num):
                    d = r.read_se()
                    next_coef = (next_coef + d + 256) % 256
                    coefs.append(next_coef)
                s.lists[size_id][m] = coefs
            m += 3 if size_id == 3 else 1
    return s


# ------------------------------------------------------------------ VPS

@dataclass
class VPS:
    vps_id: int = 0
    max_sub_layers_minus1: int = 0
    temporal_id_nesting: int = 1
    ptl: ProfileTierLevel = field(default_factory=ProfileTierLevel)
    max_dec_pic_buffering: list[int] = field(default_factory=lambda: [5])
    num_reorder_pics: list[int] = field(default_factory=lambda: [0])
    max_latency_increase: list[int] = field(default_factory=lambda: [0])


def parse_vps(rbsp: bytes) -> VPS:
    r = BitReader(rbsp)
    v = VPS()
    v.vps_id = r.read_bits(4)
    r.read_bits(2)  # reserved_three_2bits
    r.read_bits(6)  # max_layers_minus1
    v.max_sub_layers_minus1 = r.read_bits(3)
    v.temporal_id_nesting = r.read_bit()
    r.read_bits(16)  # reserved_0xffff
    v.ptl = read_ptl(r, v.max_sub_layers_minus1)
    sub_layer_ordering = r.read_bit()
    v.max_dec_pic_buffering, v.num_reorder_pics, v.max_latency_increase = [], [], []
    lo = 0 if sub_layer_ordering else v.max_sub_layers_minus1
    for _ in range(lo, v.max_sub_layers_minus1 + 1):
        v.max_dec_pic_buffering.append(r.read_ue() + 1)
        v.num_reorder_pics.append(r.read_ue())
        v.max_latency_increase.append(r.read_ue())
    # remainder (layer sets, timing) skipped — not needed for decode
    return v


def write_vps(v: VPS) -> bytes:
    w = BitWriter()
    w.write_bits(v.vps_id, 4)
    w.write_bits(3, 2)
    w.write_bits(0, 6)
    w.write_bits(v.max_sub_layers_minus1, 3)
    w.write_bit(v.temporal_id_nesting)
    w.write_bits(0xFFFF, 16)
    write_ptl(w, v.ptl, v.max_sub_layers_minus1)
    w.write_bit(1)  # sub_layer_ordering_info_present
    for i in range(len(v.max_dec_pic_buffering)):
        w.write_ue(v.max_dec_pic_buffering[i] - 1)
        w.write_ue(v.num_reorder_pics[i])
        w.write_ue(v.max_latency_increase[i])
    w.write_bits(0, 6)  # vps_max_layer_id
    w.write_ue(0)       # vps_num_layer_sets_minus1
    w.write_bit(0)      # vps_timing_info_present
    w.write_bit(0)      # vps_extension_flag
    w.rbsp_trailing_bits()
    return w.getvalue()


# ------------------------------------------------------------------ SPS

@dataclass
class SPS:
    vps_id: int = 0
    max_sub_layers_minus1: int = 0
    temporal_id_nesting: int = 1
    ptl: ProfileTierLevel = field(default_factory=ProfileTierLevel)
    sps_id: int = 0
    chroma_format_idc: int = 1
    width: int = 0
    height: int = 0
    conf_win: tuple[int, int, int, int] = (0, 0, 0, 0)  # l, r, t, b
    bit_depth_luma: int = 8
    bit_depth_chroma: int = 8
    log2_max_poc_lsb: int = 8
    max_dec_pic_buffering: list[int] = field(default_factory=lambda: [5])
    num_reorder_pics: list[int] = field(default_factory=lambda: [0])
    max_latency_increase: list[int] = field(default_factory=lambda: [0])
    log2_min_cb: int = 3
    log2_ctb: int = 6
    log2_min_tb: int = 2
    log2_max_tb: int = 5
    max_transform_hierarchy_depth_inter: int = 0
    max_transform_hierarchy_depth_intra: int = 0
    scaling_list_enabled: int = 0
    scaling_list: ScalingListData | None = None
    amp_enabled: int = 0
    sao_enabled: int = 1
    pcm_enabled: int = 0
    pcm_bit_depth_luma: int = 8
    pcm_bit_depth_chroma: int = 8
    log2_min_pcm_cb: int = 3
    log2_max_pcm_cb: int = 3
    pcm_loop_filter_disabled: int = 0
    st_rps: list[ShortTermRPS] = field(default_factory=list)
    long_term_ref_pics_present: int = 0
    lt_ref_pic_poc_lsb: list[int] = field(default_factory=list)
    used_by_curr_pic_lt: list[int] = field(default_factory=list)
    temporal_mvp_enabled: int = 1
    strong_intra_smoothing: int = 1
    vui: VUI | None = None

    # derived
    @property
    def ctb_size(self) -> int:
        return 1 << self.log2_ctb

    @property
    def pic_width_in_ctbs(self) -> int:
        return (self.width + self.ctb_size - 1) >> self.log2_ctb

    @property
    def pic_height_in_ctbs(self) -> int:
        return (self.height + self.ctb_size - 1) >> self.log2_ctb

    @property
    def min_cb_size(self) -> int:
        return 1 << self.log2_min_cb

    @property
    def pic_width_in_min_cbs(self) -> int:
        return self.width >> self.log2_min_cb

    @property
    def max_poc_lsb(self) -> int:
        return 1 << self.log2_max_poc_lsb


def parse_sps(rbsp: bytes) -> SPS:
    r = BitReader(rbsp)
    s = SPS()
    s.vps_id = r.read_bits(4)
    s.max_sub_layers_minus1 = r.read_bits(3)
    s.temporal_id_nesting = r.read_bit()
    s.ptl = read_ptl(r, s.max_sub_layers_minus1)
    s.sps_id = r.read_ue()
    s.chroma_format_idc = r.read_ue()
    if s.chroma_format_idc == 3:
        r.read_bit()  # separate_colour_plane
    s.width = r.read_ue()
    s.height = r.read_ue()
    if r.read_bit():  # conformance_window
        l = r.read_ue(); rt = r.read_ue(); t = r.read_ue(); b = r.read_ue()
        s.conf_win = (l, rt, t, b)
    s.bit_depth_luma = r.read_ue() + 8
    s.bit_depth_chroma = r.read_ue() + 8
    s.log2_max_poc_lsb = r.read_ue() + 4
    sub_layer_ordering = r.read_bit()
    s.max_dec_pic_buffering, s.num_reorder_pics, s.max_latency_increase = [], [], []
    lo = 0 if sub_layer_ordering else s.max_sub_layers_minus1
    for _ in range(lo, s.max_sub_layers_minus1 + 1):
        s.max_dec_pic_buffering.append(r.read_ue() + 1)
        s.num_reorder_pics.append(r.read_ue())
        s.max_latency_increase.append(r.read_ue())
    if not sub_layer_ordering:
        s.max_dec_pic_buffering *= (s.max_sub_layers_minus1 + 1)
    s.log2_min_cb = r.read_ue() + 3
    s.log2_ctb = s.log2_min_cb + r.read_ue()
    s.log2_min_tb = r.read_ue() + 2
    s.log2_max_tb = s.log2_min_tb + r.read_ue()
    s.max_transform_hierarchy_depth_inter = r.read_ue()
    s.max_transform_hierarchy_depth_intra = r.read_ue()
    s.scaling_list_enabled = r.read_bit()
    if s.scaling_list_enabled:
        if r.read_bit():  # sps_scaling_list_data_present
            s.scaling_list = read_scaling_list(r)
        else:
            s.scaling_list = ScalingListData.default()
    s.amp_enabled = r.read_bit()
    s.sao_enabled = r.read_bit()
    s.pcm_enabled = r.read_bit()
    if s.pcm_enabled:
        s.pcm_bit_depth_luma = r.read_bits(4) + 1
        s.pcm_bit_depth_chroma = r.read_bits(4) + 1
        s.log2_min_pcm_cb = r.read_ue() + 3
        s.log2_max_pcm_cb = s.log2_min_pcm_cb + r.read_ue()
        s.pcm_loop_filter_disabled = r.read_bit()
    num_st = r.read_ue()
    s.st_rps = []
    for i in range(num_st):
        s.st_rps.append(read_st_rps(r, i, s.st_rps, False, num_st))
    s.long_term_ref_pics_present = r.read_bit()
    if s.long_term_ref_pics_present:
        n = r.read_ue()
        for _ in range(n):
            s.lt_ref_pic_poc_lsb.append(r.read_bits(s.log2_max_poc_lsb))
            s.used_by_curr_pic_lt.append(r.read_bit())
    s.temporal_mvp_enabled = r.read_bit()
    s.strong_intra_smoothing = r.read_bit()
    if r.read_bit():  # vui_parameters_present
        s.vui = read_vui(r, s)
    # sps_extension skipped
    return s


def write_sps(s: SPS) -> bytes:
    w = BitWriter()
    w.write_bits(s.vps_id, 4)
    w.write_bits(s.max_sub_layers_minus1, 3)
    w.write_bit(s.temporal_id_nesting)
    write_ptl(w, s.ptl, s.max_sub_layers_minus1)
    w.write_ue(s.sps_id)
    w.write_ue(s.chroma_format_idc)
    w.write_ue(s.width)
    w.write_ue(s.height)
    if any(s.conf_win):
        w.write_bit(1)
        for x in s.conf_win:
            w.write_ue(x)
    else:
        w.write_bit(0)
    w.write_ue(s.bit_depth_luma - 8)
    w.write_ue(s.bit_depth_chroma - 8)
    w.write_ue(s.log2_max_poc_lsb - 4)
    w.write_bit(1)  # sub_layer_ordering_info_present
    for i in range(len(s.max_dec_pic_buffering)):
        w.write_ue(s.max_dec_pic_buffering[i] - 1)
        w.write_ue(s.num_reorder_pics[i])
        w.write_ue(s.max_latency_increase[i])
    w.write_ue(s.log2_min_cb - 3)
    w.write_ue(s.log2_ctb - s.log2_min_cb)
    w.write_ue(s.log2_min_tb - 2)
    w.write_ue(s.log2_max_tb - s.log2_min_tb)
    w.write_ue(s.max_transform_hierarchy_depth_inter)
    w.write_ue(s.max_transform_hierarchy_depth_intra)
    w.write_bit(s.scaling_list_enabled)
    if s.scaling_list_enabled:
        w.write_bit(0)  # use default lists
    w.write_bit(s.amp_enabled)
    w.write_bit(s.sao_enabled)
    w.write_bit(s.pcm_enabled)
    if s.pcm_enabled:
        w.write_bits(s.pcm_bit_depth_luma - 1, 4)
        w.write_bits(s.pcm_bit_depth_chroma - 1, 4)
        w.write_ue(s.log2_min_pcm_cb - 3)
        w.write_ue(s.log2_max_pcm_cb - s.log2_min_pcm_cb)
        w.write_bit(s.pcm_loop_filter_disabled)
    w.write_ue(len(s.st_rps))
    for i, rps in enumerate(s.st_rps):
        write_st_rps(w, rps, i)
    w.write_bit(s.long_term_ref_pics_present)
    if s.long_term_ref_pics_present:
        w.write_ue(len(s.lt_ref_pic_poc_lsb))
        for lsb, used in zip(s.lt_ref_pic_poc_lsb, s.used_by_curr_pic_lt):
            w.write_bits(lsb, s.log2_max_poc_lsb)
            w.write_bit(used)
    w.write_bit(s.temporal_mvp_enabled)
    w.write_bit(s.strong_intra_smoothing)
    if s.vui is not None:
        w.write_bit(1)
        write_vui(w, s.vui)
    else:
        w.write_bit(0)  # vui_parameters_present
    w.write_bit(0)  # sps_extension
    w.rbsp_trailing_bits()
    return w.getvalue()


# ------------------------------------------------------------------ PPS

@dataclass
class PPS:
    pps_id: int = 0
    sps_id: int = 0
    dependent_slice_segments_enabled: int = 0
    output_flag_present: int = 0
    num_extra_slice_header_bits: int = 0
    sign_data_hiding_enabled: int = 0
    cabac_init_present: int = 0
    num_ref_idx_l0_default: int = 1
    num_ref_idx_l1_default: int = 1
    init_qp: int = 26
    constrained_intra_pred: int = 0
    transform_skip_enabled: int = 0
    cu_qp_delta_enabled: int = 0
    diff_cu_qp_delta_depth: int = 0
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    slice_chroma_qp_offsets_present: int = 0
    weighted_pred: int = 0
    weighted_bipred: int = 0
    transquant_bypass_enabled: int = 0
    tiles_enabled: int = 0
    entropy_coding_sync_enabled: int = 0
    num_tile_columns: int = 1
    num_tile_rows: int = 1
    uniform_spacing: int = 1
    column_widths: list[int] = field(default_factory=list)  # in CTBs
    row_heights: list[int] = field(default_factory=list)
    loop_filter_across_tiles: int = 1
    loop_filter_across_slices: int = 1
    deblocking_filter_control_present: int = 0
    deblocking_filter_override_enabled: int = 0
    deblocking_filter_disabled: int = 0
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0
    scaling_list_data_present: int = 0
    scaling_list: ScalingListData | None = None
    lists_modification_present: int = 0
    log2_parallel_merge_level: int = 2
    slice_segment_header_extension_present: int = 0


def parse_pps(rbsp: bytes) -> PPS:
    r = BitReader(rbsp)
    p = PPS()
    p.pps_id = r.read_ue()
    p.sps_id = r.read_ue()
    p.dependent_slice_segments_enabled = r.read_bit()
    p.output_flag_present = r.read_bit()
    p.num_extra_slice_header_bits = r.read_bits(3)
    p.sign_data_hiding_enabled = r.read_bit()
    p.cabac_init_present = r.read_bit()
    p.num_ref_idx_l0_default = r.read_ue() + 1
    p.num_ref_idx_l1_default = r.read_ue() + 1
    p.init_qp = r.read_se() + 26
    p.constrained_intra_pred = r.read_bit()
    p.transform_skip_enabled = r.read_bit()
    p.cu_qp_delta_enabled = r.read_bit()
    if p.cu_qp_delta_enabled:
        p.diff_cu_qp_delta_depth = r.read_ue()
    p.cb_qp_offset = r.read_se()
    p.cr_qp_offset = r.read_se()
    p.slice_chroma_qp_offsets_present = r.read_bit()
    p.weighted_pred = r.read_bit()
    p.weighted_bipred = r.read_bit()
    p.transquant_bypass_enabled = r.read_bit()
    p.tiles_enabled = r.read_bit()
    p.entropy_coding_sync_enabled = r.read_bit()
    if p.tiles_enabled:
        p.num_tile_columns = r.read_ue() + 1
        p.num_tile_rows = r.read_ue() + 1
        p.uniform_spacing = r.read_bit()
        if not p.uniform_spacing:
            p.column_widths = [r.read_ue() + 1 for _ in range(p.num_tile_columns - 1)]
            p.row_heights = [r.read_ue() + 1 for _ in range(p.num_tile_rows - 1)]
        p.loop_filter_across_tiles = r.read_bit()
    p.loop_filter_across_slices = r.read_bit()
    p.deblocking_filter_control_present = r.read_bit()
    if p.deblocking_filter_control_present:
        p.deblocking_filter_override_enabled = r.read_bit()
        p.deblocking_filter_disabled = r.read_bit()
        if not p.deblocking_filter_disabled:
            p.beta_offset_div2 = r.read_se()
            p.tc_offset_div2 = r.read_se()
    p.scaling_list_data_present = r.read_bit()
    if p.scaling_list_data_present:
        p.scaling_list = read_scaling_list(r)
    p.lists_modification_present = r.read_bit()
    p.log2_parallel_merge_level = r.read_ue() + 2
    p.slice_segment_header_extension_present = r.read_bit()
    return p


def write_pps(p: PPS) -> bytes:
    w = BitWriter()
    w.write_ue(p.pps_id)
    w.write_ue(p.sps_id)
    w.write_bit(p.dependent_slice_segments_enabled)
    w.write_bit(p.output_flag_present)
    w.write_bits(p.num_extra_slice_header_bits, 3)
    w.write_bit(p.sign_data_hiding_enabled)
    w.write_bit(p.cabac_init_present)
    w.write_ue(p.num_ref_idx_l0_default - 1)
    w.write_ue(p.num_ref_idx_l1_default - 1)
    w.write_se(p.init_qp - 26)
    w.write_bit(p.constrained_intra_pred)
    w.write_bit(p.transform_skip_enabled)
    w.write_bit(p.cu_qp_delta_enabled)
    if p.cu_qp_delta_enabled:
        w.write_ue(p.diff_cu_qp_delta_depth)
    w.write_se(p.cb_qp_offset)
    w.write_se(p.cr_qp_offset)
    w.write_bit(p.slice_chroma_qp_offsets_present)
    w.write_bit(p.weighted_pred)
    w.write_bit(p.weighted_bipred)
    w.write_bit(p.transquant_bypass_enabled)
    w.write_bit(p.tiles_enabled)
    w.write_bit(p.entropy_coding_sync_enabled)
    if p.tiles_enabled:
        w.write_ue(p.num_tile_columns - 1)
        w.write_ue(p.num_tile_rows - 1)
        w.write_bit(p.uniform_spacing)
        if not p.uniform_spacing:
            for c in p.column_widths:
                w.write_ue(c - 1)
            for rr in p.row_heights:
                w.write_ue(rr - 1)
        w.write_bit(p.loop_filter_across_tiles)
    w.write_bit(p.loop_filter_across_slices)
    w.write_bit(p.deblocking_filter_control_present)
    if p.deblocking_filter_control_present:
        w.write_bit(p.deblocking_filter_override_enabled)
        w.write_bit(p.deblocking_filter_disabled)
        if not p.deblocking_filter_disabled:
            w.write_se(p.beta_offset_div2)
            w.write_se(p.tc_offset_div2)
    w.write_bit(0)  # scaling_list_data_present
    w.write_bit(p.lists_modification_present)
    w.write_ue(p.log2_parallel_merge_level - 2)
    w.write_bit(p.slice_segment_header_extension_present)
    w.write_bit(0)  # pps_extension
    w.rbsp_trailing_bits()
    return w.getvalue()


# ---------------------------------------------------------------- tiles

class TileGrid:
    """Tile partition of the CTB grid (spec 6.5.1): column/row boundaries,
    per-CTB tile ids, and the tile-scan <-> raster-scan address maps the
    CTU walk and the entry-point machinery need.

    Mirrors the reference decoder's readTileGrid/CTB-address tables
    (SURVEY.md 2.4 "Param-set reader"); built once per (PPS, SPS) pair.
    """

    def __init__(self, pps: PPS, sps: SPS):
        import numpy as np
        wctb = sps.pic_width_in_ctbs
        hctb = sps.pic_height_in_ctbs
        nc, nr = pps.num_tile_columns, pps.num_tile_rows
        if pps.uniform_spacing:
            col_bd = [(i * wctb) // nc for i in range(nc + 1)]
            row_bd = [(i * hctb) // nr for i in range(nr + 1)]
        else:
            col_bd = [0]
            for w_ in pps.column_widths:
                col_bd.append(col_bd[-1] + w_)
            col_bd.append(wctb)
            row_bd = [0]
            for h_ in pps.row_heights:
                row_bd.append(row_bd[-1] + h_)
            row_bd.append(hctb)
        self.col_bd = col_bd
        self.row_bd = row_bd
        self.wctb, self.hctb = wctb, hctb
        self.num_tiles = nc * nr
        # per-CTB tile id (raster indexed)
        tid = np.zeros((hctb, wctb), np.int32)
        ts_order = []
        t = 0
        for tr in range(nr):
            for tc in range(nc):
                for ry in range(row_bd[tr], row_bd[tr + 1]):
                    for rx in range(col_bd[tc], col_bd[tc + 1]):
                        tid[ry, rx] = t
                        ts_order.append(ry * wctb + rx)
                t += 1
        self.tile_of_ctb = tid
        self.ts_to_rs = np.array(ts_order, np.int32)
        rs_to_ts = np.empty(wctb * hctb, np.int32)
        rs_to_ts[self.ts_to_rs] = np.arange(wctb * hctb, dtype=np.int32)
        self.rs_to_ts = rs_to_ts
        # per-8x8-cell tile id for the device schedule builder
        h8 = (hctb << sps.log2_ctb) >> 3
        w8 = (wctb << sps.log2_ctb) >> 3
        f = sps.ctb_size >> 3
        self.tile8 = np.repeat(np.repeat(tid, f, 0), f, 1)[:h8, :w8] \
            .astype(np.int32)

    def tile_of_addr(self, addr: int) -> int:
        return int(self.tile_of_ctb[addr // self.wctb, addr % self.wctb])
