"""Encoder top: QY265Encoder-shaped API (open / encode_frame / delayed /
close), parameter-set generation, slice & NAL assembly, reconstruction and
quality accounting.

Reference equivalents: CHevcEncode::{init,encodeFrame,encodeHeaders},
init_parameter_set, CEncOutputBs (SURVEY.md 2.3). v1 scope: all-intra
fixed-QP; the GOP/RC/inter machinery lands on this same skeleton.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream.nal import NalType, write_nal
from ..decode.decoder import RefPic
from ..decode.filters import deblock_frame, sao_frame
from ..decode.slice_dec import FrameState
from ..hevc.params import PPS, SPS, VPS, ProfileTierLevel, ShortTermRPS, \
    write_pps, write_sps, write_vps
from ..hevc.slicehdr import I_SLICE, P_SLICE, SliceHeader, write_slice_header
from ..utils.yuv import YUVFrame
from .config import EncoderConfig, resolve_preset
from .intra_frame import IntraFrameEncoder
from .inter_frame import PFrameEncoder


@dataclass
class EncodedFrame:
    """One output AU: annex-B bytes + reconstruction + stats."""
    data: bytes
    recon: YUVFrame
    poc: int
    qp: int
    bits: int
    slice_type: str = "I"
    psnr: tuple[float, float, float] | None = None


class HevcEncoder:
    """v1: all-intra encoder. encode_frame() is synchronous (no lookahead
    delay yet), mirroring QY265EncoderEncodeFrame's contract of returning
    NALs + recon picture."""

    def __init__(self, cfg: EncoderConfig):
        cfg = resolve_preset(cfg)
        self.cfg = cfg
        assert cfg.width > 0 and cfg.height > 0
        self.sps = self._make_sps(cfg)
        self.pps = self._make_pps(cfg)
        self.vps = self._make_vps(cfg)
        self.poc = 0
        self.frame_idx = 0
        self.headers_written = False
        self.dpb: list[RefPic] = []      # encoder-side reference pictures

    # -------------------------------------------------------- parameter sets
    @staticmethod
    def _make_ptl() -> ProfileTierLevel:
        return ProfileTierLevel(
            general_profile_idc=1,
            general_profile_compatibility_flags=1 << 30,
            general_progressive_source_flag=1,
            general_frame_only_constraint_flag=1,
            general_level_idc=120,
        )

    def _make_vps(self, cfg: EncoderConfig) -> VPS:
        v = VPS()
        v.vps_id = 0
        v.ptl = self._make_ptl()
        v.max_dec_pic_buffering = [5]
        v.num_reorder_pics = [0]
        v.max_latency_increase = [0]
        return v

    def _make_sps(self, cfg: EncoderConfig) -> SPS:
        s = SPS()
        s.sps_id = 0
        s.vps_id = 0
        s.ptl = self._make_ptl()
        s.chroma_format_idc = 1
        # pad dimensions to the min-CU grid via the conformance window
        align = 16
        s.width = (cfg.width + align - 1) // align * align
        s.height = (cfg.height + align - 1) // align * align
        # conf window offsets are in chroma units
        s.conf_win = (0, (s.width - cfg.width) // 2,
                      0, (s.height - cfg.height) // 2)
        s.bit_depth_luma = s.bit_depth_chroma = 8
        s.log2_max_poc_lsb = 8
        s.max_dec_pic_buffering = [5]
        s.num_reorder_pics = [0]
        s.max_latency_increase = [0]
        s.log2_min_cb = 4          # 16x16 CUs (v1: no 8x8/NxN path yet)
        s.log2_ctb = 6             # 64x64 CTBs
        s.log2_min_tb = 2
        s.log2_max_tb = 5
        s.max_transform_hierarchy_depth_inter = 0
        s.max_transform_hierarchy_depth_intra = 0
        s.scaling_list_enabled = 0
        s.amp_enabled = 0
        s.sao_enabled = 0          # v1 (SAO encode lands with its RDO)
        s.pcm_enabled = 0
        s.long_term_ref_pics_present = 0
        s.temporal_mvp_enabled = 0
        s.strong_intra_smoothing = 1 if cfg.strong_intra_smoothing else 0
        s.st_rps = []
        s.lt_ref_pic_poc_lsb = []
        return s

    def _make_pps(self, cfg: EncoderConfig) -> PPS:
        p = PPS()
        p.pps_id = 0
        p.sps_id = 0
        p.sign_data_hiding_enabled = 0
        p.cabac_init_present = 0
        p.num_ref_idx_l0_default = 1
        p.num_ref_idx_l1_default = 1
        p.init_qp = 26
        p.constrained_intra_pred = 0
        p.transform_skip_enabled = 0
        p.cu_qp_delta_enabled = 0
        p.cb_qp_offset = 0
        p.cr_qp_offset = 0
        p.weighted_pred = 0
        p.weighted_bipred = 0
        p.transquant_bypass_enabled = 0
        p.tiles_enabled = 0
        p.entropy_coding_sync_enabled = 0
        p.loop_filter_across_slices = 1
        p.deblocking_filter_control_present = 1
        p.deblocking_filter_override_enabled = 0
        p.deblocking_filter_disabled = 0 if cfg.deblock else 1
        p.beta_offset_div2 = 0
        p.tc_offset_div2 = 0
        p.scaling_list_data_present = 0
        p.lists_modification_present = 0
        p.log2_parallel_merge_level = 2
        p.slice_segment_header_extension_present = 0
        return p

    # ------------------------------------------------------------- headers
    def encode_headers(self) -> bytes:
        """VPS+SPS+PPS annex-B block (QY265EncoderEncodeHeaders)."""
        out = b""
        out += write_nal(NalType.VPS, write_vps(self.vps))
        out += write_nal(NalType.SPS, write_sps(self.sps))
        out += write_nal(NalType.PPS, write_pps(self.pps))
        self.headers_written = True
        return out

    # --------------------------------------------------------------- frames
    def encode_frame(self, frame: YUVFrame) -> EncodedFrame:
        cfg = self.cfg
        qp = int(np.clip(cfg.qp, 0, 51))
        iper = cfg.intra_period
        is_idr = (self.frame_idx == 0 or
                  (iper > 0 and self.frame_idx % iper == 0))
        if is_idr:
            self.poc = 0
            self.dpb.clear()
        slice_type = I_SLICE if is_idr else P_SLICE
        hdr = SliceHeader(
            nal_type=(NalType.IDR_W_RADL if is_idr else NalType.TRAIL_R),
            first_slice_in_pic=1,
            pps_id=0,
            slice_type=slice_type,
            slice_qp=qp,
            pic_order_cnt_lsb=self.poc & 0xFF,
        )
        if not is_idr:
            rps = ShortTermRPS(delta_pocs=[-1], used=[1], num_negative=1,
                               num_positive=0)
            hdr.st_rps = rps
            hdr.st_rps_idx = -1
            hdr.num_ref_idx = [1, 0]
        fs = FrameState(self.sps)
        fs.poc = self.poc
        if is_idr:
            enc = IntraFrameEncoder(
                fs, self.sps, self.pps, hdr,
                frame.y.astype(np.int32), frame.u.astype(np.int32),
                frame.v.astype(np.int32), qp)
        else:
            ref_lists = [[self.dpb[-1]], []]
            enc = PFrameEncoder(
                fs, self.sps, self.pps, hdr,
                frame.y.astype(np.int32), frame.u.astype(np.int32),
                frame.v.astype(np.int32), qp, ref_lists)
        cabac_payload = enc.encode()
        tail_val, tail_n = enc.w.enc.get_tail_bits()
        bw = write_slice_header(hdr, self.sps, self.pps)
        assert bw.byte_aligned()
        rbsp = bytearray(bw.getvalue())
        rbsp += cabac_payload
        # remaining low bits + rbsp stop bit + alignment
        acc = (tail_val << 1) | 1
        nbits = tail_n + 1
        pad = (8 - nbits % 8) % 8
        acc <<= pad
        nbits += pad
        rbsp += int(acc).to_bytes(nbits // 8, "big")
        data = b""
        if is_idr and (not self.headers_written
                       or self.cfg.headers_before_keyframe):
            data += self.encode_headers()
        data += write_nal(hdr.nal_type, bytes(rbsp))
        # in-loop filters on recon (normative; refs are filtered pictures)
        deblock_frame(fs, hdr.beta_offset_div2, hdr.tc_offset_div2,
                      bool(self.pps.deblocking_filter_disabled),
                      self.pps.cb_qp_offset, self.pps.cr_qp_offset)
        self.dpb = [RefPic(fs, self.poc)]   # v1: single-ref sliding window
        recon = self._wrap_recon(fs, frame)
        ef = EncodedFrame(data=data, recon=recon, poc=self.poc, qp=qp,
                          bits=len(data) * 8,
                          slice_type="I" if is_idr else "P")
        if cfg.psnr:
            ef.psnr = _psnr(frame, recon)
        self.poc += 1
        self.frame_idx += 1
        return ef

    def delayed_frames(self):
        """Drain queued frames (none in the all-intra v1)."""
        return []

    def _wrap_recon(self, fs: FrameState, src: YUVFrame) -> YUVFrame:
        sps = self.sps
        l, r, t, b = sps.conf_win
        x0, x1 = 2 * l, sps.width - 2 * r
        y0, y1 = 2 * t, sps.height - 2 * b
        return YUVFrame(
            fs.y[y0:y1, x0:x1].astype(np.uint8),
            fs.cb[y0 // 2:y1 // 2, x0 // 2:x1 // 2].astype(np.uint8),
            fs.cr[y0 // 2:y1 // 2, x0 // 2:x1 // 2].astype(np.uint8),
            poc=fs.poc)


def _psnr(a: YUVFrame, b: YUVFrame) -> tuple[float, float, float]:
    out = []
    for pa, pb in ((a.y, b.y), (a.u, b.u), (a.v, b.v)):
        mse = np.mean((pa.astype(np.float64) - pb.astype(np.float64)) ** 2)
        out.append(99.99 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse))
    return tuple(out)


def encode_sequence(frames: list[YUVFrame], cfg: EncoderConfig) -> tuple[bytes, list[YUVFrame]]:
    """Convenience: encode a list of frames, returns (annexb, recons)."""
    enc = HevcEncoder(cfg)
    bs = b""
    recons = []
    for f in frames:
        ef = enc.encode_frame(f)
        bs += ef.data
        recons.append(ef.recon)
    return bs, recons
