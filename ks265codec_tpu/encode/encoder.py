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
from ..hevc.slicehdr import B_SLICE, I_SLICE, P_SLICE, SliceHeader, \
    write_slice_header
from ..utils.yuv import YUVFrame
from .config import EncoderConfig, resolve_preset
from .intra_frame import IntraFrameEncoder
from .inter_frame import BFrameEncoder, PFrameEncoder


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
    ssim: tuple[float, float, float] | None = None
    display_idx: int = -1
    # QY265Nal timing surface (qy265enc.h:177-184): frame-tick units
    pts: int = 0
    dts: int = 0
    temporal_id: int = 0


def decide_weightp(src_y, l0):
    """Per-L0-ref explicit WP decision (the reference's weightAnalyse
    analog, x264 lineage): least-squares (gain, offset) fit of src luma
    against each reference on 4x-subsampled planes; a ref gets a weight
    only when the fit is materially non-identity AND measurably improves
    plain SAD. Returns weights[ref] = [luma, cb, cr] PredWeight triples
    (chroma identity — luma carries fades), or None when every ref is
    identity (the slice then writes a zero-flag table)."""
    from ..hevc.slicehdr import PredWeight
    s = np.asarray(src_y, np.float64)[::4, ::4]
    sh = s.shape
    out = []
    any_flag = False
    for rp in l0:
        if hasattr(rp.fs, "ensure_planes"):
            rp.fs.ensure_planes()      # device-resident recon -> host
        r = np.asarray(rp.fs.y, np.float64)[:src_y.shape[0],
                                            :src_y.shape[1]][::4, ::4]
        r = r[:sh[0], :sh[1]]
        use, wq, oq = False, 64, 0
        vr = float(r.var())
        if vr > 1e-3:
            cov = float(((s - s.mean()) * (r - r.mean())).mean())
            wr = min(max(cov / vr, 0.25), 2.0)     # |delta_w| <= 127
            wq = int(np.clip(round(wr * 64), 1, 191))
            oq = int(np.clip(round(s.mean() - wq / 64.0 * r.mean()),
                             -128, 127))
            if abs(wq - 64) > 2 or abs(oq) > 3:
                pred = np.clip(r * (wq / 64.0) + oq, 0, 255)
                # demand a CLEAR win: the ME/subpel searches run on the
                # unweighted reference, so marginal fits degrade the
                # final weighted MC more than the fit gains (measured
                # +12% P bits on near-static content with a 1% gate)
                if (np.abs(s - pred).sum()
                        < 0.97 * np.abs(s - r).sum()):
                    use = True
        if not use:
            wq, oq = 64, 0
        out.append([PredWeight(1 if use else 0, wq, oq),
                    PredWeight(0, 64, 0), PredWeight(0, 64, 0)])
        any_flag = any_flag or use
    return out if any_flag else None


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
        self.gop_base = 0
        self.headers_written = False
        self.dpb: list[RefPic] = []      # encoder-side reference pictures
        self.queue: list[tuple[int, YUVFrame]] = []
        from .rc import RateControl, TwoPassStats
        self.rc = RateControl(cfg)
        from .lookahead import Lookahead
        self.la = Lookahead(cfg)
        self._intra_cache = {}      # display_idx -> batched compute result
        self._coded_count = 0       # pictures coded (dts derivation)
        self._wf_coder = None
        from ..utils.pool import FramePool
        from .devdpb import DeviceDPB
        self.dev_dpb = DeviceDPB()  # device-resident reference planes
        self.frame_pool = FramePool()  # host FrameState recycling
        self.stats = None
        self.pass2_dqp = {}
        if cfg.pass_num == 1:
            self.stats = TwoPassStats(cfg.stat_file)
        elif cfg.pass_num == 2:
            try:
                self.pass2_dqp = TwoPassStats.read(
                    cfg.stat_file).qp_offsets(cfg.bitrate_kbps * 1000.0,
                                              cfg.frame_rate)
            except OSError:
                self.pass2_dqp = {}

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

    @staticmethod
    def _dpb_params(cfg: EncoderConfig) -> tuple[int, int]:
        """(max_dec_pic_buffering, num_reorder_pics) for the GOP shape."""
        if cfg.latency == "zerolatency" or cfg.bframes == 0 \
                or cfg.intra_period == 1:
            return max(2, int(cfg.refs) + 1), 0
        from .gop import gop_plan, reorder_depth
        return 6, reorder_depth(gop_plan(cfg.latency, cfg.bframes))

    def _make_vps(self, cfg: EncoderConfig) -> VPS:
        v = VPS()
        v.vps_id = 0
        v.ptl = self._make_ptl()
        dpb, reorder = self._dpb_params(cfg)
        v.max_dec_pic_buffering = [dpb]
        v.num_reorder_pics = [reorder]
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
        dpb, reorder = self._dpb_params(cfg)
        s.max_dec_pic_buffering = [dpb]
        s.num_reorder_pics = [reorder]
        s.max_latency_increase = [0]
        s.log2_min_cb = 3          # down to 8x8 CUs (intra detail tier)
        s.log2_ctb = 6             # 64x64 CTBs
        s.log2_min_tb = 2
        s.log2_max_tb = 5
        s.max_transform_hierarchy_depth_inter = \
            1 if cfg.inter_tu_depth > 0 else 0
        import os as _os
        host_only_cfg = (cfg.intra_period != 1 or cfg.aq_mode or cfg.cutree
                         or cfg.pcm
                         or bool(_os.environ.get("KS265_SEQ_COMPUTE")))
        # intra TU-split rides the sequential host path only (the device
        # wavefront codes TU == CU); the SPS flag is raised exactly when
        # that path is the one that will run, so wavefront-eligible
        # all-intra configs keep the FPP == per-frame bitstream identity
        s.max_transform_hierarchy_depth_intra = \
            1 if (cfg.intra_tu_depth > 0 and host_only_cfg) else 0
        s.scaling_list_enabled = 0
        s.amp_enabled = 1 if cfg.partitions >= 2 else 0
        s.sao_enabled = 1 if cfg.sao > 0 else 0
        s.pcm_enabled = 1 if cfg.pcm else 0
        if cfg.pcm:
            s.pcm_bit_depth_luma = s.pcm_bit_depth_chroma = 8
            # 16/32 only: pcm_flag then precedes intra modes with no
            # part_mode in between (the writer relies on this ordering)
            s.log2_min_pcm_cb = 4
            s.log2_max_pcm_cb = 5
            s.pcm_loop_filter_disabled = 0
        s.long_term_ref_pics_present = 1 if cfg.long_term_ref else 0
        s.temporal_mvp_enabled = 1 if cfg.tmvp else 0
        s.strong_intra_smoothing = 1 if cfg.strong_intra_smoothing else 0
        s.st_rps = []
        s.lt_ref_pic_poc_lsb = []
        from ..hevc.params import VUI
        from fractions import Fraction
        fr = Fraction(cfg.frame_rate).limit_denominator(1001)
        s.vui = VUI(timing_info_present=1,
                    num_units_in_tick=fr.denominator,
                    time_scale=fr.numerator,
                    frame_field_info_present=1 if cfg.pic_timing_sei
                    else 0)
        return s

    def _make_pps(self, cfg: EncoderConfig) -> PPS:
        p = PPS()
        p.pps_id = 0
        p.sps_id = 0
        p.sign_data_hiding_enabled = 1 if cfg.sign_bit_hiding else 0
        p.cabac_init_present = 0
        p.num_ref_idx_l0_default = 1
        p.num_ref_idx_l1_default = 1
        p.init_qp = 26
        p.constrained_intra_pred = 0
        p.transform_skip_enabled = 1 if cfg.transform_skip else 0
        p.cu_qp_delta_enabled = 1 if (cfg.aq_mode or cfg.cutree) else 0
        p.diff_cu_qp_delta_depth = 0
        p.cb_qp_offset = int(np.clip(cfg.chroma_qp_offset, -12, 12))
        p.cr_qp_offset = int(np.clip(cfg.chroma_qp_offset, -12, 12))
        p.weighted_pred = 1 if cfg.weightp else 0
        p.weighted_bipred = 0
        p.transquant_bypass_enabled = 0
        from .config import tile_dims
        tc, tr = tile_dims(cfg)
        if tc > 1 or tr > 1:
            p.tiles_enabled = 1
            p.num_tile_columns = tc
            p.num_tile_rows = tr
            p.uniform_spacing = 1
            p.loop_filter_across_tiles = 1
        else:
            p.tiles_enabled = 0
        p.dependent_slice_segments_enabled = 1 if cfg.slices > 1 else 0
        p.entropy_coding_sync_enabled = \
            1 if (cfg.wpp and not p.tiles_enabled) else 0
        p.loop_filter_across_slices = 1
        p.deblocking_filter_control_present = 1
        p.deblocking_filter_override_enabled = 0
        p.deblocking_filter_disabled = 0 if cfg.deblock else 1
        p.beta_offset_div2 = int(np.clip(cfg.deblock_beta, -6, 6))
        p.tc_offset_div2 = int(np.clip(cfg.deblock_tc, -6, 6))
        p.scaling_list_data_present = 0
        p.lists_modification_present = 0
        p.log2_parallel_merge_level = 2
        p.slice_segment_header_extension_present = 0
        return p

    # ------------------------------------------------------------- headers
    def encode_headers(self) -> bytes:
        """VPS+SPS+PPS(+user-data SEI) annex-B block
        (QY265EncoderEncodeHeaders)."""
        out = b""
        out += write_nal(NalType.VPS, write_vps(self.vps))
        out += write_nal(NalType.SPS, write_sps(self.sps))
        out += write_nal(NalType.PPS, write_pps(self.pps))
        from ..hevc.sei import user_data_payload, write_sei_rbsp
        info = ("ks265codec_tpu - preset %s tune %s latency %s"
                % (self.cfg.preset, self.cfg.tune,
                   self.cfg.latency)).encode()
        out += write_nal(NalType.PREFIX_SEI,
                         write_sei_rbsp([(5, user_data_payload(info))]))
        self.headers_written = True
        return out

    # --------------------------------------------------------------- frames
    def encode_frame(self, frame: YUVFrame) -> list[EncodedFrame]:
        """Push one input frame; returns 0+ coded pictures in CODING order
        (asynchronous contract of QY265EncoderEncodeFrame: one call != one
        output — qy265enc.h:153-155)."""
        self.queue.append((self.frame_idx, frame))
        try:
            self.la.push(self.frame_idx, np.asarray(frame.y, np.uint8))
        except Exception as ex:
            from ..utils.log import log
            log(2, "lookahead failed (%s: %s)" % (type(ex).__name__, ex))
        self.frame_idx += 1
        return self._drain(False)

    def flush(self) -> list[EncodedFrame]:
        """Drain remaining queued pictures (QY265EncoderDelayedFrames)."""
        return self._drain(True)

    delayed_frames = flush

    # ----------------------------------------------------- runtime control
    def reconfig(self, bitrate_kbps: int | None = None,
                 qp: int | None = None, crf: float | None = None) -> None:
        """Mid-stream rate reconfiguration (QY265EncoderReconfig,
        qy265enc.h:200): takes effect from the next coded picture."""
        if bitrate_kbps is not None:
            self.cfg.bitrate_kbps = bitrate_kbps
            self.rc.target_bps = bitrate_kbps * 1000.0
        if qp is not None:
            self.cfg.qp = qp
        if crf is not None:
            from .rc import qp_to_qscale
            self.cfg.crf = crf
            self.rc.crf_qscale = qp_to_qscale(crf)

    def keyframe_request(self) -> None:
        """Force an IDR at the next input frame
        (QY265EncoderKeyFrameRequest, qy265enc.h:218)."""
        self._force_idr = True

    def _gop_n(self) -> int:
        from .gop import gop_size
        if self.cfg.intra_period == 1:
            return 1
        return gop_size(self.cfg.latency, self.cfg.bframes)

    def _drain(self, flushing: bool) -> list[EncodedFrame]:
        from .gop import LDP, gop_plan
        out: list[EncodedFrame] = []
        cfg = self.cfg
        iper = cfg.intra_period
        gop_n = self._gop_n()
        while self.queue or getattr(self, "_intra_pending", None):
            if not self.queue:
                # only the pipelined all-intra chunk remains
                ctx, items = self._intra_pending
                self._intra_pending = None
                if ctx is not None:
                    self._collect_intra_batch(ctx)
                for di, f in items:
                    out.append(self._encode_picture(f, di, None,
                                                    is_idr=True))
                continue
            idx0 = self.queue[0][0]
            if getattr(self, "_force_idr", False):
                self._force_idr = False
                di, frame = self.queue.pop(0)
                out.append(self._encode_picture(frame, di, None,
                                                is_idr=True))
                continue
            if idx0 == 0 or (iper > 0 and idx0 % iper == 0):
                use_cra = bool(cfg.open_gop) and idx0 != 0 and iper > 1
                if iper == 1 and cfg.latency == "offline" and cfg.fpp:
                    # all-intra: batch frames through ONE device wavefront
                    # dispatch (FPP analog) — frames are independent.
                    # Batch size scales inversely with pixel count: the
                    # 35-mode decide pass holds ~GB-scale intermediates
                    # per 4K frame and a 16-frame batch OOMs the chip
                    # (observed TPU worker crash at 3840x2160)
                    max_b = max(1, (16 * 1280 * 720)
                                // max(cfg.width * cfg.height, 1))
                    sizes = [b for b in (16, 8, 4, 2, 1) if b <= max_b]
                    pend = getattr(self, "_intra_pending", None)
                    if not flushing and len(self.queue) < sizes[0] \
                            and pend is None:
                        break       # wait for a full batch (async contract)
                    if pend is not None:
                        ctx, items = pend
                        self._intra_pending = None
                    else:
                        n = next(b for b in sizes
                                 if len(self.queue) >= b)
                        items = self.queue[:n]
                        self.queue = self.queue[n:]
                        ctx = (self._dispatch_intra_batch(items)
                               if n > 1 else None)
                    # pipeline: dispatch the NEXT chunk before collecting
                    # this one — device codes chunk N+1 while the host
                    # entropy-codes chunk N (FPP across batches; the next
                    # chunk's RC QPs are one batch staler, the
                    # CEncRcAbrSync bounded-staleness contract)
                    if ctx is not None and (flushing
                                            or len(self.queue) >= sizes[0]):
                        m = next((b for b in sizes if b > 1
                                  and len(self.queue) >= b), 0)
                        if m > 1:
                            nitems = self.queue[:m]
                            self.queue = self.queue[m:]
                            self._intra_pending = (
                                self._dispatch_intra_batch(nitems), nitems)
                    if ctx is not None:
                        self._collect_intra_batch(ctx)
                    for di, f in items:
                        out.append(self._encode_picture(f, di, None,
                                                        is_idr=True))
                    continue
                di, frame = self.queue.pop(0)
                out.append(self._encode_picture(frame, di, None,
                                                is_idr=True,
                                                cra=use_cra))
                continue
            # scene-cut check AFTER the all-intra/IDR fast path so the
            # FPP batcher never forces a 1-frame lookahead flush
            fa0 = self.la.get(idx0, force=flushing)
            if fa0 is not None and fa0.scenecut and idx0 != 0:
                # lookahead scene cut -> start a new IDR here (the
                # reference's EncPreAnalyze scenecut -> I placement)
                self.la.analyses[idx0].scenecut = False
                di, frame = self.queue.pop(0)
                out.append(self._encode_picture(frame, di, None,
                                                is_idr=True))
                continue
            till_idr = (iper - (idx0 % iper)) if iper > 0 else 1 << 30
            # a scene cut inside the upcoming GOP shortens it the same
            # way an approaching IDR does
            for k in range(1, min(gop_n, len(self.queue))):
                fa = self.la.get(idx0 + k, force=flushing)
                if fa is not None and fa.scenecut:
                    till_idr = min(till_idr, k)
                    break
            if gop_n == 1 and till_idr >= 1:
                # low-delay: one picture per step, alternate the LDP QP
                # cascade entries (+3/+2/+3/+1, reference cadence);
                # multi-ref window per cfg.refs (-ref N)
                ldp = gop_plan(cfg.latency, cfg.bframes, cfg.refs)
                di, f = self.queue.pop(0)
                if self.dpb and self.rc.should_skip("P"):
                    # judgeSkipFrame: VBV nearly empty -> emit no NAL,
                    # repeat the last reference as this frame's recon
                    self.rc.skipped()
                    ef = EncodedFrame(
                        data=b"", recon=self._wrap_recon(self.dpb[-1].fs,
                                                         f),
                        poc=self.dpb[-1].poc, qp=0, bits=0,
                        slice_type="skip")
                    ef.display_idx = di
                    ef.pts = di
                    out.append(ef)
                    continue
                out.append(self._encode_picture(
                    f, di, ldp[self.gop_base % len(ldp)]))
                self.gop_base += 1
                continue
            if till_idr >= gop_n and len(self.queue) >= gop_n:
                # honest -lookahead (qy265enc.h:121): with CU-tree on,
                # hold coding until the analysis window is full so
                # propagation depth follows the flag, not call pattern
                la_depth = min(int(cfg.lookahead or 0), 64)
                if (not flushing and cfg.cutree and la_depth > gop_n
                        and len(self.queue) < la_depth):
                    break
                use_n = gop_n
                if cfg.b_adapt and gop_n > 2:
                    # sceneMove analog: high-motion windows drop the deep
                    # B pyramid (distant refs go stale) down to short
                    # mini-GOPs / plain P
                    rs = []
                    for k in range(gop_n):
                        # coding-time read: the window is fully queued, so
                        # forcing the pending analysis batch is correct
                        fa = self.la.get(idx0 + k, force=True)
                        if fa is None or fa.icost <= 0:
                            break
                        rs.append(fa.pcost / max(fa.icost, 1.0))
                    if len(rs) == gop_n:
                        m = float(np.median(rs))
                        if m > 0.80:
                            use_n = 1       # inter useless: plain P
                        elif m > 0.55 and gop_n > 4:
                            use_n = 4       # shallow pyramid
                if use_n == 1:
                    di, f = self.queue.pop(0)
                    out.append(self._encode_picture(
                        f, di, LDP[self.gop_base % len(LDP)]))
                    self.gop_base += 1
                    continue
                plans = gop_plan(cfg.latency,
                                 cfg.bframes if use_n == gop_n
                                 else use_n - 1)
                batch = self.queue[:use_n]
                self.queue = self.queue[use_n:]
                for plan in plans:
                    di, f = batch[plan.poc_in_gop - 1]
                    out.append(self._encode_picture(f, di, plan))
                self.gop_base += use_n
                continue
            if till_idr < gop_n and len(self.queue) >= till_idr:
                # open GOP: the frames before an intra-refresh boundary
                # code AFTER the CRA as RASL leading pictures referencing
                # BOTH the previous anchor and the CRA (fillRpsForCra
                # analog) — the compression point closed GOPs forfeit.
                # Needs the boundary frame queued and an iper boundary
                # (not a scenecut-forced refresh, which stays closed).
                boundary = (len(self.queue) > till_idr
                            and iper > 0
                            and self.queue[till_idr][0] % iper == 0)
                if (cfg.open_gop and iper > 1 and till_idr >= 1
                        and gop_n > 1 and not flushing
                        and len(self.queue) <= till_idr
                        and till_idr <= self.sps.num_reorder_pics[-1]):
                    break   # hold the leads until the CRA frame arrives
                if (cfg.open_gop and iper > 1 and till_idr >= 1
                        and boundary and self.queue[till_idr][0] != 0
                        and gop_n > 1
                        and till_idr <= self.sps.num_reorder_pics[-1]):
                    # (lead count is bounded by the declared reorder
                    # depth — the decoder's bumping budget)
                    from .gop import PicPlan
                    leads = self.queue[:till_idr]
                    di_c, f_c = self.queue[till_idr]
                    self.queue = self.queue[till_idr + 1:]
                    base0 = self.gop_base
                    n = till_idr
                    out.append(self._encode_picture(
                        f_c, di_c, None, is_idr=True, cra=True,
                        lead_count=n))
                    for k, (di, f) in enumerate(leads):
                        plan = PicPlan(
                            k + 1, "B", 1, 2,
                            [-(k + 1), n - k], [1, 1],
                            [-(k + 1)], [n - k])
                        out.append(self._encode_picture(f, di, plan,
                                                        rasl=True))
                    # the GOP clock resumes at the CRA's display position
                    self.gop_base = base0 + n + 1
                    continue
                for _ in range(till_idr):
                    di, f = self.queue.pop(0)
                    out.append(self._encode_picture(
                        f, di, LDP[self.gop_base % len(LDP)]))
                    self.gop_base += 1
                continue
            if flushing:
                while self.queue:
                    di, f = self.queue.pop(0)
                    out.append(self._encode_picture(
                        f, di, LDP[self.gop_base % len(LDP)]))
                    self.gop_base += 1
                continue
            break
        return out

    def _intra_frame_qp(self, display_idx: int) -> int:
        from .config import RC_FIXQP
        cfg = self.cfg
        if cfg.rc == RC_FIXQP:
            qp = int(np.clip(cfg.qp, 0, 51))
        else:
            fa = self.la.get(display_idx)
            qp = self.rc.frame_qp("I", 0, fa.icost if fa else None)
        if self.pass2_dqp:
            qp = int(np.clip(qp + self.pass2_dqp.get(display_idx, 0),
                             cfg.qp_min, cfg.qp_max))
        return qp

    def _prepare_intra_batch(self, items) -> None:
        """Dispatch + collect in one step (non-pipelined callers)."""
        ctx = self._dispatch_intra_batch(items)
        if ctx is not None:
            self._collect_intra_batch(ctx)

    def _dispatch_intra_batch(self, items):
        """Run decisions + dispatch the batched device wavefront for
        several intra frames; returns an opaque ctx for
        _collect_intra_batch (the packed D2H fetch is deferred so the
        device crunches this chunk while the host entropy-codes the
        previous one). RC-driven QPs use the current (bounded-stale) RC
        state, the CEncRcAbrSync analog for frame-parallel encoding."""
        import os
        if os.environ.get("KS265_SEQ_COMPUTE") or self.sps.pcm_enabled \
                or self.cfg.aq_mode or self.cfg.cutree:
            # AQ: effective-QP inference must run before deblock, so the
            # per-frame (host deblock) path is used
            return None
        if self._wf_coder is None:
            from ..ops.wavefront import WavefrontIntraCoder
            self._wf_coder = WavefrontIntraCoder()
        if not self._wf_coder.available:
            return None
        from ..ops.decide import decide_frames
        from .intra_frame import (IntraFrameEncoder, decision_maps8,
                                  tile_region_maps)
        sps, cfg = self.sps, self.cfg
        ph = sps.pic_height_in_ctbs * sps.ctb_size
        pw = sps.pic_width_in_ctbs * sps.ctb_size
        _, tile8, ntc = tile_region_maps(self.pps, sps)
        batch, metas = [], []
        try:
            import jax.numpy as jnp

            from ..utils.trace import stage
            qps = [self._intra_frame_qp(di) for di, _ in items]
            with stage("ai.pad_stack"):
                srcs_y = np.stack([
                    IntraFrameEncoder._pad(f.y.astype(np.int32), ph, pw)
                    for _, f in items])
                srcs_cb = np.stack([
                    IntraFrameEncoder._pad(f.u.astype(np.int32), ph // 2,
                                           pw // 2) for _, f in items])
                srcs_cr = np.stack([
                    IntraFrameEncoder._pad(f.v.astype(np.int32), ph // 2,
                                           pw // 2) for _, f in items])
            # upload the batch sources ONCE (uint8) and share the device
            # arrays between the decision and coding dispatches
            with stage("ai.upload"):
                src_dev = tuple(jnp.asarray(a.astype(np.uint8))
                                for a in (srcs_y, srcs_cb, srcs_cr))
            with stage("ai.decide"):
                decisions = decide_frames(src_dev[0], src_dev[1],
                                          src_dev[2],
                                          qps, cfg.lambda_scale,
                                          effort=int(cfg.decide_effort),
                                          want_costs=False)
            with stage("ai.maps8"):
                for (di, frame), qp, dec, src_y, src_cb, src_cr in zip(
                        items, qps, decisions, srcs_y, srcs_cb, srcs_cr):
                    (s32, m16, m32, cplx, s16, m8, cm8, cm16, cm32,
                     _c8, _c16, _m4, _nxn) = dec
                    log2m, modes8, cmodes8 = decision_maps8(
                        s32, s16, m8, m16, m32, sps, ph >> 3, pw >> 3,
                        cm8, cm16, cm32)
                    qp_map8 = np.full(log2m.shape, qp, np.uint8)
                    batch.append(dict(src_y=src_y, src_cb=src_cb,
                                      src_cr=src_cr,
                                      log2m=log2m, modes8=modes8,
                                      cmodes8=cmodes8, qp_map8=qp_map8,
                                      tile8=tile8, n_tile_cols=ntc))
                    metas.append((di, qp, cplx))
            post = dict(boff=self.pps.beta_offset_div2,
                        toff=self.pps.tc_offset_div2,
                        cbo=self.pps.cb_qp_offset,
                        cro=self.pps.cr_qp_offset,
                        deblock=not self.pps.deblocking_filter_disabled,
                        sao=bool(self.sps.sao_enabled),
                        sao_tier=max(int(cfg.sao), 1))
            with stage("ai.code_dispatch"):
                finish = self._wf_coder.code_frames(
                    batch, self.pps.cb_qp_offset, self.pps.cr_qp_offset,
                    sps,
                    sbh=bool(self.pps.sign_data_hiding_enabled),
                    rdoq=bool(cfg.rdoq), post=post, defer=True,
                    src_dev=src_dev)
        except Exception as ex:
            from ..utils.log import log
            log(2, "batched wavefront failed (%s: %s); per-frame path"
                % (type(ex).__name__, ex))
            return None
        return (metas, batch, finish)

    def _collect_intra_batch(self, ctx) -> None:
        """Force the deferred device fetch, run the SAO decision (host,
        exact) + batched device SAO apply, and fill _intra_cache. The
        reconstruction never leaves the device unless a consumer reads
        it (lazy fetch)."""
        metas, batch, finish = ctx
        from ..utils.trace import stage
        try:
            with stage("ai.finish_fetch"):
                results = finish()
        except Exception as ex:
            from ..utils.log import log
            log(2, "batched wavefront failed (%s: %s); per-frame path"
                % (type(ex).__name__, ex))
            return
        sao_on = bool(self.sps.sao_enabled)
        recon_dev = results[0]["recon_dev"]
        sao_arr = [None] * len(results)
        if sao_on and results[0]["sao_stats"] is not None:
            import jax.numpy as jnp

            from ..ops.saoapply import sao_apply_batch
            from .sao import decide_from_stats_arrays
            tier = max(self.cfg.sao, 1)
            with stage("ai.sao_decide_host"):
                sao_arr = [decide_from_stats_arrays(res["sao_stats"],
                                                    meta[1], tier)
                           for res, meta in zip(results, metas)]
            with stage("ai.sao_apply"):
                stk = [jnp.asarray(np.stack([a[k] for a in sao_arr]))
                       for k in range(4)]
                recon_dev = sao_apply_batch(
                    *recon_dev, *stk, sao_luma=True, sao_chroma=True,
                    w=self.sps.width, h=self.sps.height,
                    cs=self.sps.ctb_size)
        for (di, qp, cplx), it, res, sa in zip(metas, batch, results,
                                               sao_arr):
            self._intra_cache[di] = dict(
                qp=qp, frame_cplx=float(cplx), log2m=it["log2m"],
                modes8=it["modes8"], cmodes8=it["cmodes8"],
                qp_map8=it["qp_map8"], coeffs=res["coeffs"],
                sao_arrays=sa, deblocked=res["deblocked"],
                recon_dev=recon_dev, fidx=res["fidx"])

    def _encode_picture(self, frame: YUVFrame, display_idx: int,
                        plan, is_idr: bool = False,
                        cra: bool = False, rasl: bool = False,
                        lead_count: int = 0) -> EncodedFrame:
        cfg = self.cfg
        from .config import RC_FIXQP
        if is_idr and cra:
            # open-GOP intra refresh: CRA keeps the POC timeline. With
            # lead_count > 0 the drain codes RASL leading pictures AFTER
            # this CRA (coding order) that display BEFORE it and
            # reference ACROSS it — open GOP's actual compression point
            # (fillRpsForCra analog) — so the DPB must survive until the
            # leads have coded; the leads' own RPS bookkeeping then
            # retires the pre-CRA references. Without leads (legacy
            # close-at-boundary shape) the DPB clears here as before.
            poc = self.gop_base + 1 + lead_count
            if lead_count == 0:
                self.gop_base += 1
                for rp in self.dpb:
                    self.frame_pool.release(rp.fs)
                self.dpb.clear()
            slice_type = I_SLICE
            tid = 0
            ftype = "I"
        elif is_idr:
            self.poc = 0
            self.gop_base = 0
            for rp in self.dpb:
                self.frame_pool.release(rp.fs)
            self.dpb.clear()
            poc = 0
            slice_type = I_SLICE
            tid = 0
            ftype = "I"
        else:
            poc = self.gop_base + plan.poc_in_gop
            slice_type = P_SLICE if plan.slice_type == "P" else B_SLICE
            tid = plan.tid
            ftype = plan.slice_type
        cached = self._intra_cache.pop(display_idx, None) if is_idr else None
        if cached is not None:
            # FPP semantics: the batched pass fixed this frame's QP from the
            # (bounded-stale) RC state at batch time — CEncRcAbrSync analog
            qp = cached["qp"]
        elif cfg.rc == RC_FIXQP:
            qp = int(np.clip(cfg.qp + (0 if is_idr else plan.qp_offset),
                             0, 51))
        else:
            fa = self.la.get(display_idx)
            qp = self.rc.frame_qp(ftype, tid, fa.cost if fa else None)
        if cached is None and self.pass2_dqp:
            qp = int(np.clip(qp + self.pass2_dqp.get(display_idx, 0),
                             cfg.qp_min, cfg.qp_max))
        hdr = SliceHeader(
            nal_type=(NalType.CRA_NUT if (is_idr and cra)
                      else NalType.IDR_W_RADL if is_idr
                      else NalType.RASL_R if rasl
                      else NalType.TRAIL_R),
            temporal_id=tid,
            first_slice_in_pic=1,
            pps_id=0,
            slice_type=slice_type,
            slice_qp=qp,
            pic_order_cnt_lsb=poc & 0xFF,
        )
        hdr.poc = poc        # MotionDeriver scaling / no_backward need it
        # inherit PPS deblock state so header writing/parsing agree on
        # whether the loop_filter_across_slices flag is present
        hdr.deblocking_filter_disabled = self.pps.deblocking_filter_disabled
        hdr.beta_offset_div2 = self.pps.beta_offset_div2
        hdr.tc_offset_div2 = self.pps.tc_offset_div2
        if is_idr and cra:
            # CRA is IRAP but not IDR: its header carries POC + a
            # short-term RPS. With RASL leads pending the RPS must NAME
            # the pre-CRA anchor (used_by_curr = 0) or the normative DPB
            # update evicts it before the leads reference it — the
            # reference encoder's CRA does exactly this (observed
            # rps=[-6]/used=[0] in its open-GOP streams). Without leads
            # the RPS is empty (nothing survives the refresh).
            if lead_count > 0:
                hdr.st_rps = ShortTermRPS(
                    delta_pocs=[-(lead_count + 1)], used=[0],
                    num_negative=1, num_positive=0)
            else:
                hdr.st_rps = ShortTermRPS(delta_pocs=[], used=[],
                                          num_negative=0, num_positive=0)
            hdr.st_rps_idx = -1
        sao_on = bool(self.sps.sao_enabled)
        if sao_on:
            hdr.sao_luma = 1
            hdr.sao_chroma = 1
        by_poc = {rp.poc: rp for rp in self.dpb}
        lt_rp = None
        if cfg.long_term_ref and not is_idr:
            lt_rp = next((rp for rp in self.dpb
                          if getattr(rp, "lt_candidate", False)), None)
        l0 = l1 = None
        if not is_idr:
            # trim RPS entries to pictures actually in the DPB (early
            # frames of a multi-ref window would otherwise name pictures
            # that never existed — conformant decoders reject that)
            pairs = [(d, u) for d, u in zip(plan.ref_deltas,
                                            plan.ref_used)
                     if poc + d in by_poc]
            if not pairs:
                pairs = [(plan.ref_deltas[0], 1)]
            deltas = [d for d, _ in pairs]
            hdr.st_rps = ShortTermRPS(
                delta_pocs=deltas,
                used=[u for _, u in pairs],
                num_negative=sum(1 for d in deltas if d < 0),
                num_positive=sum(1 for d in deltas if d > 0))
            hdr.st_rps_idx = -1
            l0 = [by_poc[poc + d] for d in plan.l0 if poc + d in by_poc]
            l1 = [by_poc[poc + d] for d in plan.l1 if poc + d in by_poc]
            if lt_rp is not None and lt_rp.poc not in (
                    rp.poc for rp in l0):
                # long-term ref appended after the short-term entries —
                # the decoder's RefPicListTemp order (StCurr then LtCurr)
                mask = (1 << sps_poc_bits(self.sps)) - 1
                hdr.num_lt_pics = 1
                hdr.lt_poc = [lt_rp.poc & mask]
                hdr.lt_used = [1]
                hdr.lt_msb_present = [0]
                hdr.lt_delta_poc_msb = [0]
                hdr.lt_from_sps = [-1]
                # normative LT marking happens when the RPS first SIGNALS
                # the picture as LT (decoder semantics, decoder.py:238) —
                # not at DPB insertion. Until then both sides must treat
                # it as short-term (MV scaling + TMVP gates read this)
                lt_rp.is_long_term = True
                l0 = l0 + [lt_rp]
            if slice_type == B_SLICE and (not l0 or not l1):
                # missing ref (shouldn't happen): degrade to P off any ref
                slice_type = P_SLICE
                hdr.slice_type = P_SLICE
                l0 = l0 or [self.dpb[-1]]
                l1 = []
            hdr.num_ref_idx = [max(1, len(l0)),
                               len(l1) if slice_type == B_SLICE else 0]
            if self.sps.temporal_mvp_enabled:
                # collocated picture = L0[0] (closest ref): the temporal
                # merge/AMVP candidate comes from its stored motion grid
                # (spec 8.5.3.2.8; derivation shared with the decoder)
                hdr.temporal_mvp_enabled = 1
                hdr.collocated_from_l0 = 1
                hdr.collocated_ref_idx = 0
            if cfg.weightp and slice_type == P_SLICE and l0:
                # explicit weighted prediction (fade handling): per-ref
                # least-squares (gain, offset) fit on subsampled luma;
                # the shared motion_compensate applies hdr.weights on
                # both sides, so recon consistency is automatic
                wt = decide_weightp(frame.y, l0)
                if wt is not None:
                    from ..utils.log import log
                    log(0, "weightp engaged poc %d: %s" % (
                        poc, [(c[0].weight, c[0].offset) for c in wt]))
                    hdr.luma_log2_weight_denom = 6
                    hdr.chroma_log2_weight_denom = 6
                    hdr.weights = [wt, []]

        def make_enc(fstate):
            args = (fstate, self.sps, self.pps, hdr,
                    frame.y.astype(np.int32), frame.u.astype(np.int32),
                    frame.v.astype(np.int32), qp)
            if is_idr:
                e = IntraFrameEncoder(*args)
                # NxN rides the sequential host path (the wavefront batch
                # codes the 2Nx2N tiers only). Enable it exactly where
                # that path is the ONLY path for this config — inter-GOP
                # I frames, AQ/cutree/PCM streams, forced-sequential —
                # so the FPP-batch == per-frame bitstream identity holds
                # for wavefront-eligible all-intra configs.
                import os as _os
                host_only = (cfg.intra_period != 1 or cfg.aq_mode
                             or cfg.cutree or self.sps.pcm_enabled
                             or bool(_os.environ.get("KS265_SEQ_COMPUTE")))
                e.use_nxn = bool(cfg.intra_nxn) and host_only
            elif hdr.slice_type == B_SLICE:
                e = BFrameEncoder(*args, [l0, l1], subme=cfg.subme)
            else:
                e = PFrameEncoder(*args, [l0, []], subme=cfg.subme)
            e.lam_scale = cfg.lambda_scale
            e.rdoq = bool(cfg.rdoq)
            e.decide_effort = int(cfg.decide_effort)
            e.merange = int(cfg.merange)
            e.me_method = int(cfg.me)
            e.partitions = int(cfg.partitions)
            e.inter_tu_depth = int(cfg.inter_tu_depth)
            e.dev_dpb = self.dev_dpb
            e.sao_tier = max(int(cfg.sao), 1)
            if cfg.noise_reduction:
                e.noise_reduction = int(cfg.noise_reduction)
                # noise stats accumulate across the whole sequence
                if not hasattr(self, "_nr_shared"):
                    self._nr_shared = {}
                e._nr_state = self._nr_shared
            return e

        fs = self.frame_pool.acquire(self.sps)
        fs.poc = poc
        enc = make_enc(fs)
        if cfg.aq_mode or cfg.cutree:
            fa = self.la.get(display_idx)
            if fa is not None and fa.dqp_ctu is not None:
                enc.dqp_ctu = fa.dqp_ctu
        if cached is not None:
            # stage 1 already ran in the batched device pass; the recon
            # stays device-resident (None planes) and is fetched lazily
            enc.frame_cplx = cached["frame_cplx"]
            enc.apply_coded_planes(cached["log2m"], cached["modes8"],
                                   cached["cmodes8"], cached["qp_map8"],
                                   None, None, None, *cached["coeffs"])
        else:
            enc.compute()   # stage 1: decisions + recon + maps + coeffs
        # normative deblock on the reconstruction (refs are filtered pics);
        # SAO decision runs on the deblocked picture, single coding pass.
        # The fused batch pipeline already deblocked on device and fetched
        # per-CTU SAO stats in the same packed transfer.
        if self.pps.cu_qp_delta_enabled:
            from .map_writer import apply_effective_qp
            apply_effective_qp(fs, enc.syn, self.sps, self.pps, hdr)
        dev_post = getattr(enc, "device_post", None)
        deblocked = (cached is not None and cached.get("deblocked")) or \
            (dev_post is not None and dev_post.get("deblocked"))
        if not deblocked:
            deblock_frame(fs, hdr.beta_offset_div2, hdr.tc_offset_div2,
                          bool(self.pps.deblocking_filter_disabled),
                          self.pps.cb_qp_offset, self.pps.cr_qp_offset)
        sao_params = None
        sao_applied = False
        if sao_on:
            from .sao import _decide_from_stats, decide_sao, \
                params_from_arrays
            if cached is not None and cached.get("sao_arrays") is not None:
                # decision arrays already computed at collect time; the
                # offsets were applied ON DEVICE to the cached recon
                sao_params = params_from_arrays(fs, *cached["sao_arrays"])
                sao_applied = True
            elif dev_post is not None \
                    and dev_post.get("sao_arrays") is not None:
                # inter engine: decision AND apply ran on device inside
                # the coding dispatch; the chosen params came back in the
                # packed row for syntax
                sao_params = params_from_arrays(fs,
                                                *dev_post["sao_arrays"])
                sao_applied = bool(dev_post.get("sao_applied"))
            else:
                dev_stats = None
                if dev_post is not None:
                    dev_stats = dev_post.get("sao_stats")
                if dev_stats is not None:
                    sao_params = _decide_from_stats(
                        fs, dev_stats, qp, max(cfg.sao, 1))
                else:
                    sao_params = decide_sao(fs, enc.src_y, enc.src_cb,
                                            enc.src_cr, qp,
                                            max(cfg.sao, 1))
        # stage 2: entropy-code the slice from the maps
        from .map_writer import write_slice_data
        import os as _os
        nthreads = (cfg.threads if cfg.threads > 0
                    else min(_os.cpu_count() or 1, 8))
        seg_datas = None
        if cfg.slices > 1 and not self.pps.tiles_enabled \
                and not self.pps.entropy_coding_sync_enabled:
            # multi-slice-segment picture: one independent + N-1 DEPENDENT
            # segments (ctx continuation); CTU rows split evenly
            from .map_writer import write_slice_data_py
            hctb = self.sps.pic_height_in_ctbs
            wctb = self.sps.pic_width_in_ctbs
            nseg = max(1, min(int(cfg.slices), hctb))
            rows = [(k * hctb) // nseg for k in range(nseg)]
            seg_starts = sorted({r * wctb for r in rows})
            seg_datas, raw_entries = write_slice_data_py(
                fs, enc.syn, self.sps, self.pps, hdr, sao_params,
                segments=seg_starts)
            slice_data = seg_datas[0]
        else:
            from ..utils.trace import stage as _stage
            with _stage("enc.write_slice"):
                slice_data, raw_entries = write_slice_data(
                    fs, enc.syn, self.sps, self.pps, hdr, sao_params,
                    threads=nthreads)
        if self.pps.entropy_coding_sync_enabled or self.pps.tiles_enabled:
            hdr.num_entry_points = len(raw_entries)
            hdr.entry_points = list(raw_entries)
        # entry_point_offsets count bytes AS CODED IN THE NAL, i.e. after
        # emulation-prevention insertion (7.4.7.1); iterate because the
        # adjusted values may change the header length and thus the EPB
        # positions near the header/data boundary
        from ..bitstream.nal import epb_insert_positions
        for _ in range(8):
            bw = write_slice_header(hdr, self.sps, self.pps)
            assert bw.byte_aligned()
            rbsp = bytearray(bw.getvalue())
            data_start = len(rbsp)
            rbsp += slice_data
            if not raw_entries:
                break
            ins = epb_insert_positions(bytes(rbsp))
            adjusted = []
            b_prev = data_start
            for raw in raw_entries:
                b_k = b_prev + raw
                adjusted.append(raw + sum(1 for i in ins
                                          if b_prev < i <= b_k))
                b_prev = b_k
            if adjusted == hdr.entry_points:
                break
            hdr.entry_points = adjusted
        data = b""
        if is_idr and (not self.headers_written
                       or self.cfg.headers_before_keyframe):
            data += self.encode_headers()
        if cfg.pic_timing_sei:
            from ..hevc.sei import pic_timing_payload, write_sei_rbsp
            data += write_nal(
                NalType.PREFIX_SEI,
                write_sei_rbsp([(1, pic_timing_payload())]),
                temporal_id=tid)
        data += write_nal(hdr.nal_type, bytes(rbsp), temporal_id=tid)
        if seg_datas is not None and len(seg_datas) > 1:
            from copy import copy as _shallow
            for k in range(1, len(seg_datas)):
                dh = _shallow(hdr)
                dh.first_slice_in_pic = 0
                dh.dependent_slice_segment = 1
                dh.segment_address = seg_starts[k]
                dbw = write_slice_header(dh, self.sps, self.pps)
                assert dbw.byte_aligned()
                data += write_nal(
                    hdr.nal_type,
                    bytes(bytearray(dbw.getvalue()) + seg_datas[k]),
                    temporal_id=tid)
        # SAO applies on the already-deblocked recon (normative order);
        # the batched device path applied it on device already
        if sao_params is not None and not sao_applied:
            fs.sao = sao_params
            sao_frame(fs, bool(hdr.sao_luma), bool(hdr.sao_chroma))
        if cached is not None and cached.get("recon_dev") is not None:
            recon = self._lazy_recon(cached["recon_dev"], cached["fidx"],
                                     poc)
        elif dev_post is not None and dev_post.get("recon_dev") is not None:
            recon = self._lazy_recon(dev_post["recon_dev"], None, poc)
        else:
            recon = self._wrap_recon(fs, frame)
        if cfg.md5:
            # self-verifying stream: decoded_picture_hash suffix SEI with
            # the final (post-filter) recon MD5s (Annex D type 132)
            from ..hevc.sei import picture_hash_payload, write_sei_rbsp
            data += write_nal(
                NalType.SUFFIX_SEI,
                write_sei_rbsp([(132, picture_hash_payload(
                    recon.y, recon.u, recon.v))]), temporal_id=tid)
        # DPB update: keep pictures named by this RPS (they cover all
        # future needs of the GOP pattern) plus the new picture
        keep = set()
        if not is_idr:
            keep = {poc + d for d in hdr.st_rps.delta_pocs}
        elif cra and lead_count > 0:
            # CRA with pending RASL leads: the CRA's own RPS names the
            # pre-CRA anchor (used_by_curr 0) precisely so it survives
            # for the leads — normative trimming follows that RPS
            keep = {poc + d for d in hdr.st_rps.delta_pocs}
        dead = [rp for rp in self.dpb
                if not (rp.poc in keep
                        or (getattr(rp, "lt_candidate", False)
                            and cfg.long_term_ref))]
        self.dpb = [rp for rp in self.dpb
                    if rp.poc in keep or (getattr(rp, "lt_candidate", False)
                                          and cfg.long_term_ref)]
        for rp in dead:
            self.frame_pool.release(rp.fs)
        new_rp = RefPic(fs, poc)
        if cfg.long_term_ref and is_idr:
            # encoder INTENT to keep this picture long-term; the normative
            # is_long_term flag flips only when an RPS signals it as LT
            new_rp.lt_candidate = True
        self.dpb.append(new_rp)
        # device DPB mirror: engine frames' planes already live on device;
        # batched-intra frames register their stack slice; host-path
        # frames upload lazily on first reference use
        if dev_post is not None and dev_post.get("recon_dev") is not None:
            self.dev_dpb.put(fs, dev_post["recon_dev"])
        elif cached is not None and cached.get("recon_dev") is not None:
            rd, fi = cached["recon_dev"], cached["fidx"]
            self.dev_dpb.put(fs, tuple(d[fi] for d in rd))
        self.dev_dpb.trim({rp.fs.serial for rp in self.dpb})
        from ..utils.log import log
        log(-1, "enc poc %d %s qp %d bits %d" % (
            poc, "I" if is_idr else ("P" if slice_type == P_SLICE
                                     else "B"), qp, len(data) * 8))
        ef = EncodedFrame(data=data, recon=recon, poc=poc, qp=qp,
                          bits=len(data) * 8,
                          slice_type="I" if is_idr
                          else ("P" if slice_type == P_SLICE else "B"))
        ef.display_idx = display_idx
        ef.temporal_id = tid
        # pts in display order; dts shifted down by the reorder depth so
        # dts <= pts always holds (QY265Nal semantics, frame-tick units)
        ef.pts = display_idx
        ef.dts = self._coded_count - self.sps.num_reorder_pics[-1]
        self._coded_count += 1
        if cfg.psnr:
            ef.psnr = _psnr(frame, recon)
        if cfg.ssim:
            from ..utils.metrics import frame_ssim
            ef.ssim = frame_ssim(frame, recon)
        # RC feedback must use the SAME complexity the decide side used
        # (lookahead cost) or the rate-factor model mis-tracks
        fa_done = self.la.get(display_idx)
        cplx_rc = (fa_done.cost if fa_done is not None
                   else getattr(enc, "frame_cplx", 1e5))
        self.rc.update(ef.slice_type, tid, qp, ef.bits, cplx_rc)
        if self.stats is not None:
            self.stats.add(display_idx, ef.slice_type, qp, ef.bits,
                           cplx_rc)
            self.stats.write()
        return ef

    def _lazy_recon(self, dev, fidx, poc: int):
        """Device-resident recon -> lazily-fetched YUV view (conf-window
        cropped like _wrap_recon). fidx indexes a batched stack; None
        means unbatched per-frame planes (the inter engine's output)."""
        from ..utils.yuv import LazyYUV
        sps = self.sps
        l, r, t, b = sps.conf_win
        x0, x1 = 2 * l, sps.width - 2 * r
        y0, y1 = 2 * t, sps.height - 2 * b

        def fetch():
            pl = dev if fidx is None else tuple(d[fidx] for d in dev)
            return (np.asarray(pl[0])[y0:y1, x0:x1],
                    np.asarray(pl[1])[y0 // 2:y1 // 2, x0 // 2:x1 // 2],
                    np.asarray(pl[2])[y0 // 2:y1 // 2, x0 // 2:x1 // 2])

        return LazyYUV(fetch, poc=poc)

    def _wrap_recon(self, fs: FrameState, src: YUVFrame) -> YUVFrame:
        fs.ensure_planes()
        sps = self.sps
        l, r, t, b = sps.conf_win
        x0, x1 = 2 * l, sps.width - 2 * r
        y0, y1 = 2 * t, sps.height - 2 * b
        return YUVFrame(
            fs.y[y0:y1, x0:x1].astype(np.uint8),
            fs.cb[y0 // 2:y1 // 2, x0 // 2:x1 // 2].astype(np.uint8),
            fs.cr[y0 // 2:y1 // 2, x0 // 2:x1 // 2].astype(np.uint8),
            poc=fs.poc)


def sps_poc_bits(sps) -> int:
    return sps.log2_max_poc_lsb


def _psnr(a: YUVFrame, b: YUVFrame) -> tuple[float, float, float]:
    out = []
    for pa, pb in ((a.y, b.y), (a.u, b.u), (a.v, b.v)):
        mse = np.mean((pa.astype(np.float64) - pb.astype(np.float64)) ** 2)
        out.append(99.99 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse))
    return tuple(out)


def encode_sequence(frames: list[YUVFrame], cfg: EncoderConfig) -> tuple[bytes, list[YUVFrame]]:
    """Convenience: encode a list of frames. Returns (annexb in coding
    order, recons in DISPLAY order)."""
    enc = HevcEncoder(cfg)
    bs = b""
    efs: list[EncodedFrame] = []
    for f in frames:
        for ef in enc.encode_frame(f):
            bs += ef.data
            efs.append(ef)
    for ef in enc.flush():
        bs += ef.data
        efs.append(ef)
    efs.sort(key=lambda e: e.display_idx)
    return bs, [e.recon for e in efs]
