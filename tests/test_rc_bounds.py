"""Rate-control compliance bounds (VERDICT r2 weak #3): ABR within
±10%, CBR VBV never persistently underflows on a per-frame trace, 2-pass
hits the target within ±10%. Reference analog: CEncRcAbr::{updateVbv,
vbv2Pass, analyseABR2Pass}."""

import numpy as np
import pytest

from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import HevcEncoder

W, H, FPS = 192, 96, 30.0


def _clip(n=64, seed=4):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    from ks265codec_tpu.utils.yuv import YUVFrame
    out = []
    for t in range(n):
        y = (120 + 50 * np.sin((xx + 4 * t) / 23.0)
             + 40 * np.cos((yy + 2 * t) / 19.0))
        y[(yy - H // 2) ** 2 + (xx - W // 2 - 3 * t) ** 2 < 200] = 210
        y = np.clip(y + rng.randn(H, W) * 2, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 123, np.uint8)
        v = np.full((H // 2, W // 2), 133, np.uint8)
        out.append(YUVFrame(y, u, v, poc=t))
    return out


def _encode(cfg, frames):
    enc = HevcEncoder(cfg)
    coded = []
    for f in frames:
        coded.extend(enc.encode_frame(f))
    coded.extend(enc.flush())
    return coded


def test_abr_within_10pct():
    target_kbps = 300
    frames = _clip(64)
    coded = _encode(EncoderConfig(width=W, height=H, preset="fast",
                                  latency="zerolatency", rc=2,
                                  bitrate_kbps=target_kbps,
                                  intra_period=32, frame_rate=FPS),
                    frames)
    total_bits = sum(c.bits for c in coded)
    kbps = total_bits * FPS / len(frames) / 1000.0
    assert abs(kbps - target_kbps) / target_kbps <= 0.10, kbps


def test_cbr_vbv_trace_compliant():
    """Decoder-buffer simulation: with CBR+VBV the fill level must never
    go persistently negative (a frame larger than fill+inflow stalls a
    real decoder)."""
    target_kbps = 250
    vbv_kbits = 125          # half-second buffer: tight
    frames = _clip(64)
    coded = _encode(EncoderConfig(width=W, height=H, preset="fast",
                                  latency="zerolatency", rc=1,
                                  bitrate_kbps=target_kbps,
                                  vbv_maxrate_kbps=target_kbps,
                                  vbv_bufsize_kbits=vbv_kbits,
                                  intra_period=32, frame_rate=FPS),
                    frames)
    coded.sort(key=lambda c: c.display_idx)
    size = vbv_kbits * 1000.0
    inflow = target_kbps * 1000.0 / FPS
    fill = size * 0.9
    worst = 0.0
    under_run = 0
    for c in coded:
        fill = min(fill + inflow, size)
        fill -= c.bits
        worst = min(worst, fill)
        under_run = under_run + 1 if fill < 0 else 0
        assert under_run <= 1, (c.display_idx, fill)
        fill = max(fill, 0.0)
    # any transient dip stays tiny relative to the buffer
    assert worst >= -0.10 * size, worst


def test_two_pass_hits_target():
    target_kbps = 300
    frames = _clip(48)
    stat = "/tmp/ks265_rc_test_2pass.log"
    _encode(EncoderConfig(width=W, height=H, preset="fast",
                          latency="zerolatency", rc=2,
                          bitrate_kbps=target_kbps, intra_period=24,
                          frame_rate=FPS, pass_num=1, stat_file=stat),
            frames)
    coded = _encode(EncoderConfig(width=W, height=H, preset="fast",
                                  latency="zerolatency", rc=2,
                                  bitrate_kbps=target_kbps,
                                  intra_period=24, frame_rate=FPS,
                                  pass_num=2, stat_file=stat),
                    frames)
    total_bits = sum(c.bits for c in coded)
    kbps = total_bits * FPS / len(frames) / 1000.0
    assert abs(kbps - target_kbps) / target_kbps <= 0.10, kbps
