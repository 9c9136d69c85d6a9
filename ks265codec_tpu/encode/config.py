"""Encoder configuration: preset x tune x latency axes resolving to a full
config, mirroring the reference's 3-layer design (QY265ConfigDefaultPreset /
QY265ConfigParse — qy265enc.h:226-233, SURVEY.md 5.6) with the run-captured
preset ladder.
"""

from __future__ import annotations

from dataclasses import dataclass, field

PRESETS = ["ultrafast", "superfast", "veryfast", "fast", "medium", "slow",
           "slower", "veryslow", "placebo"]
TUNES = ["default", "selfshow", "game", "movie", "screen"]
LATENCIES = ["offline", "livestreaming", "netvideo", "zerolatency"]

RC_FIXQP, RC_CBR, RC_ABR, RC_CRF = 0, 1, 2, 3
# constrained VBR / constrained quality (qy265enc.h:74 RC_MODES tail):
# cvbr = ABR machinery with a mandatory VBV cap; cvq = CRF machinery with
# an ABR-style correction once the running rate overshoots the target
RC_CVBR, RC_CVQ = 4, 5


@dataclass
class EncoderConfig:
    """Full resolved configuration (TEncConfigExt analog)."""
    width: int = 0
    height: int = 0
    frame_rate: float = 30.0
    preset: str = "medium"
    tune: str = "default"
    latency: str = "offline"
    profile: int = 1                 # main
    # rate control
    rc: int = RC_FIXQP
    qp: int = 26
    crf: float = 23.0
    bitrate_kbps: int = 0
    vbv_maxrate_kbps: int = 0
    vbv_bufsize_kbits: int = 0
    qp_min: int = 0
    qp_max: int = 51
    frame_skip: bool = False
    pass_num: int = 0                # 2-pass: 0 off, 1 analyze, 2 encode
    stat_file: str = "ks265_2pass.log"
    # GOP
    intra_period: int = 64           # -iper
    intra_min: int = 0
    bframes: int = 7                 # hierarchical GOP-8 when offline
    b_adapt: int = 1                 # motion-adaptive mini-GOP shortening
    lookahead: int = 40
    temporal_layers: int = 3
    open_gop: bool = False
    long_term_ref: bool = False   # qy265enc.h:144 longTermRef
    pic_timing_sei: bool = False  # per-AU pic_timing SEI + VUI field info
    headers_before_keyframe: bool = True   # -hbk
    # tools (preset-resolved)
    me: int = 1                      # 0 DIA 1 HEX 2 UMH 3 EPZS 4 CROSS
    subme: int = 1                   # 0 off, 1 fast, 2 square-full
    merange: int = 64
    refs: int = 1
    inter_tu_depth: int = 0
    intra_tu_depth: int = 0
    transform_skip: bool = False
    partitions: int = 0              # 0: 2Nx2N only, 1: +2NxN/Nx2N, 2: +NxN/AMP
    deblock: bool = True
    sao: int = 1                     # 0 off .. 4 full (ladder tiers)
    strong_intra_smoothing: bool = True
    rdoq: bool = False
    tmvp: bool = True                # temporal MV predictor (merge+AMVP)
    weightp: bool = False            # explicit weighted pred for P (fades)
    intra_nxn: bool = False          # 4x4 intra PUs (part NxN at min CB)
    noise_reduction: int = 0         # -nr coefficient-domain denoise
    decide_effort: int = 1      # 0: fast md (1 RDO cand, DM chroma)
    do64: bool = True
    sign_bit_hiding: bool = False
    pcm: bool = False                # enable PCM fallback for 16/32 CUs
    aq_mode: int = 0
    aq_strength: float = 1.0
    cutree: int = 0                  # lookahead CU-tree propagation
    slices: int = 1                  # dependent slice segments / picture
    wpp: bool = True
    fpp: bool = True
    threads: int = 0
    # tile partition (TPU/multi-chip scaling axis, SURVEY.md 5.7): "CxR"
    # CTB-uniform tile grid; tiles and WPP are mutually exclusive here
    tiles: str = ""
    # tune-resolved knobs (fillCfgsSCC / tune analog)
    lambda_scale: float = 1.0        # mode/split decision lambda multiplier
    deblock_beta: int = 0            # slice beta_offset_div2
    deblock_tc: int = 0              # slice tc_offset_div2
    chroma_qp_offset: int = 0        # PPS cb/cr qp offset
    # diagnostics
    psnr: int = 0
    ssim: int = 0
    md5: bool = False
    log_level: int = 1

    def __post_init__(self):
        if isinstance(self.preset, int):
            self.preset = PRESETS[self.preset]
        if isinstance(self.latency, int):
            self.latency = LATENCIES[self.latency]


# run-captured ladder (SURVEY.md 5.6): preset -> (me, subme, refs, intertu,
# partitions, sao tier, rdoq)
_LADDER = {
    "ultrafast": dict(me=1, subme=1, refs=1, inter_tu_depth=0, partitions=0, decide_effort=0,
                      sao=1, rdoq=False, sign_bit_hiding=False),
    "superfast": dict(me=1, subme=1, refs=1, inter_tu_depth=0, partitions=0, decide_effort=0,
                      sao=1, rdoq=False, sign_bit_hiding=False),
    "veryfast":  dict(me=1, subme=1, refs=1, inter_tu_depth=0, partitions=0,
                      sao=3, rdoq=False, sign_bit_hiding=True),
    "fast":      dict(me=1, subme=1, refs=1, inter_tu_depth=0, partitions=0,
                      sao=3, rdoq=True, sign_bit_hiding=True),
    "medium":    dict(me=1, subme=1, refs=1, inter_tu_depth=0, partitions=0,
                      weightp=True, intra_nxn=True, intra_tu_depth=1,
                      cutree=1, sao=4, rdoq=True,
                      sign_bit_hiding=True),
    "slow":      dict(me=2, subme=1, refs=1, inter_tu_depth=0, partitions=0,
                      weightp=True, intra_nxn=True, intra_tu_depth=1,
                      cutree=1, sao=4, rdoq=True,
                      sign_bit_hiding=True),
    "slower":    dict(me=2, subme=1, refs=2, inter_tu_depth=1, partitions=1,
                      weightp=True, intra_nxn=True, intra_tu_depth=1,
                      cutree=1, sao=4, rdoq=True,
                      sign_bit_hiding=True),
    "veryslow":  dict(me=2, subme=2, refs=4, inter_tu_depth=1, partitions=1,
                      weightp=True, intra_nxn=True, intra_tu_depth=1,
                      cutree=1, sao=4, rdoq=True,
                      sign_bit_hiding=True),
    "placebo":   dict(me=2, subme=2, refs=5, inter_tu_depth=2, partitions=2,
                      weightp=True, intra_nxn=True, intra_tu_depth=1,
                      cutree=1, sao=4, rdoq=True,
                      sign_bit_hiding=True),
}


# tune -> parameter deltas (qy265enc.h:23-29 tunes; the reference's
# fillCfgsSCC/tune tables are not recoverable from the binaries, so these
# are our own mappings with the same INTENT per tune name)
_TUNE = {
    "default": {},
    # static talking-head content: softer deblock, spend bits on chroma
    "selfshow": dict(deblock_beta=1, deblock_tc=1, chroma_qp_offset=-1),
    # game renders: sharp edges — keep detail, weaker deblock, no strong
    # reference smoothing
    "game": dict(deblock_beta=-2, deblock_tc=-2,
                 strong_intra_smoothing=False, lambda_scale=0.9),
    # film: favor smoothness, slightly coarser mode decision
    "movie": dict(deblock_beta=1, deblock_tc=0, lambda_scale=1.1),
    # screen content: hard edges + flat areas; no reference smoothing,
    # no deblock blur, sharper decisions
    "screen": dict(strong_intra_smoothing=False, deblock_beta=-2,
                   deblock_tc=-2, lambda_scale=0.8, sao=4,
                   transform_skip=True, intra_nxn=True),
}


def resolve_preset(cfg: EncoderConfig) -> EncoderConfig:
    """Apply preset ladder, tune deltas, then latency policy
    (fillCfgs<Preset> + fillCfgsSCC/tune + fillCfgByLatency analog).
    Explicitly-set fields win over the ladder (reference semantics: CLI
    flags override the preset defaults) — detected by comparison with the
    dataclass defaults."""
    if cfg.tune not in _TUNE:
        raise ValueError(f"BAD_VALUE: tune={cfg.tune}")
    ref = EncoderConfig(width=cfg.width or 16, height=cfg.height or 16)
    for k, v in _LADDER[cfg.preset].items():
        if getattr(cfg, k) == getattr(ref, k):
            setattr(cfg, k, v)
    for k, v in _TUNE[cfg.tune].items():
        if getattr(cfg, k) == getattr(ref, k):
            setattr(cfg, k, v)
    if cfg.latency == "zerolatency":
        cfg.bframes = 0
        cfg.lookahead = 0
        cfg.temporal_layers = 1
    elif cfg.latency in ("livestreaming", "netvideo"):
        if cfg.bframes == ref.bframes:
            cfg.bframes = 3
        if cfg.temporal_layers == ref.temporal_layers:
            cfg.temporal_layers = 2
    if cfg.slices > 1:
        cfg.wpp = False               # one entropy-segmentation axis
        if cfg.tiles:
            raise ValueError("BAD_VALUE: slices with tiles")
    if cfg.intra_period == 1:
        # CU-tree propagates importance through INTER references; an
        # all-intra stream has none (per-frame energy AQ is aq_mode's
        # job) — and dropping it keeps cu_qp_delta off, so the all-intra
        # fused device pipeline and native writer stay engaged
        cfg.cutree = 0
    if cfg.tiles:
        try:
            c, r = cfg.tiles.lower().split("x")
            if int(c) < 1 or int(r) < 1:
                raise ValueError
        except ValueError:
            raise ValueError(f"BAD_VALUE: tiles={cfg.tiles}") from None
        cfg.wpp = False               # one entropy-segmentation axis at a time
    return cfg


def tile_dims(cfg: EncoderConfig) -> tuple[int, int]:
    """(num_tile_columns, num_tile_rows) from the resolved config."""
    if not cfg.tiles:
        return 1, 1
    c, r = cfg.tiles.lower().split("x")
    return int(c), int(r)


def parse_config_string(cfg: EncoderConfig, opts: str) -> EncoderConfig:
    """x264-style 'k=v:k=v' override parser (QY265ConfigParse analog).
    Raises ValueError(BAD_NAME/BAD_VALUE) like the reference's error codes."""
    if not opts:
        return cfg
    for pair in opts.replace(",", ":").split(":"):
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(f"BAD_NAME: {pair}")
        k, v = pair.split("=", 1)
        k = k.strip().replace("-", "_")
        if not hasattr(cfg, k):
            raise ValueError(f"BAD_NAME: {k}")
        cur = getattr(cfg, k)
        try:
            if isinstance(cur, bool):
                setattr(cfg, k, v.strip() in ("1", "true", "yes"))
            elif isinstance(cur, int):
                setattr(cfg, k, int(v))
            elif isinstance(cur, float):
                setattr(cfg, k, float(v))
            else:
                setattr(cfg, k, v.strip())
        except ValueError as e:
            raise ValueError(f"BAD_VALUE: {k}={v}") from e
    return cfg
