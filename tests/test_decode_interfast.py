"""Decoder P/B fast path (one-dispatch MC + residual + masked intra
wavefront + filters) vs the scalar per-CU walk: bit-exact on every
configuration the path covers, scalar fallback engaged (and correct)
outside coverage."""

import hashlib
import os

import numpy as np
import pytest

from ks265codec_tpu.decode import decoder as D
from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import encode_sequence
from ks265codec_tpu.utils.yuv import YUVFrame

W, H = 192, 128


def _clip(n=6, seed=5):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(n):
        y = np.clip(120 + 50 * np.sin((xx + 7 * t) / 23.0)
                    + 40 * np.cos((yy - 3 * t) / 17.0)
                    + rng.randn(H, W) * 2, 0, 255).astype(np.uint8)
        u = np.clip(120 + 30 * np.sin((xx[::2, ::2]) / 31.0),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 20 * np.cos((yy[::2, ::2]) / 29.0),
                    0, 255).astype(np.uint8)
        out.append(YUVFrame(y, u, v, poc=t))
    return out


def _decode_both(bs):
    os.environ["KS265_DECODE_FAST"] = "0"
    try:
        scalar = D.HevcDecoder().decode_all(bs)
    finally:
        del os.environ["KS265_DECODE_FAST"]
    fast = D.HevcDecoder().decode_all(bs)
    return scalar, fast


@pytest.mark.parametrize("kw", [
    dict(preset="fast", latency="zerolatency", intra_period=0),
    dict(preset="veryfast", latency="offline", intra_period=8),
    dict(preset="fast", latency="zerolatency", intra_period=0, sao=0,
         deblock=False),
])
def test_inter_fast_path_bit_exact(kw):
    frames = _clip()
    cfg = EncoderConfig(width=W, height=H, qp=30, **kw)
    bs, recons = encode_sequence(frames, cfg)
    scalar, fast = _decode_both(bs)
    m_s = [hashlib.md5(f.tobytes()).hexdigest() for f in scalar]
    m_f = [hashlib.md5(f.tobytes()).hexdigest() for f in fast]
    m_r = [hashlib.md5(r.tobytes()).hexdigest() for r in recons]
    assert m_s == m_f == m_r
    assert len(fast) == len(frames)


def test_inter_fast_path_abort_fallback():
    """Partitioned streams (sub-8 PUs possible) must abort to the scalar
    walk mid-stream and still decode exactly."""
    frames = _clip(4)
    cfg = EncoderConfig(width=W, height=H, qp=30, preset="slower",
                        latency="offline", intra_period=4)
    bs, recons = encode_sequence(frames, cfg)
    scalar, fast = _decode_both(bs)
    assert [f.tobytes() for f in fast] == [f.tobytes() for f in scalar]
    assert [f.tobytes() for f in fast] == [r.tobytes() for r in recons]
