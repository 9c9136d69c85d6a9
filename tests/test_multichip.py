"""Multi-device production path: the encoder's fused FPP batch sharded
over the 8-virtual-device CPU mesh must produce the IDENTICAL bitstream
to the single-device path (SURVEY.md 5.8 north-star)."""

import numpy as np
import pytest

from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import encode_sequence
from ks265codec_tpu.utils.yuv import YUVFrame


def _clip(F, W, H, seed=9):
    rng = np.random.RandomState(seed)
    out = []
    for t in range(F):
        y = np.clip(120 + 60 * np.sin((np.arange(W)[None, :] + 3 * t) / 17)
                    + rng.randn(H, W) * 12, 0, 255).astype(np.uint8)
        u = np.clip(110 + rng.randn(H // 2, W // 2) * 18, 0,
                    255).astype(np.uint8)
        v = np.clip(140 + rng.randn(H // 2, W // 2) * 18, 0,
                    255).astype(np.uint8)
        out.append(YUVFrame(y, u, v, poc=t))
    return out


def test_sharded_batch_bit_identical():
    import jax

    from ks265codec_tpu.ops import wavefront as wf
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    frames = _clip(8, 96, 64)
    cfg = dict(width=96, height=64, preset="superfast", qp=30,
               intra_period=1, latency="offline")

    sharded_calls = []
    orig = wf.fused_rows_sharded

    def spy(mesh, arrays, statics):
        r = orig(mesh, arrays, statics)      # raises -> no call recorded
        sharded_calls.append(mesh.devices.size)
        return r

    wf.fused_rows_sharded = spy
    try:
        bs_multi, rec_multi = encode_sequence(frames,
                                              EncoderConfig(**cfg))
    finally:
        wf.fused_rows_sharded = orig
    assert sharded_calls == [8], sharded_calls

    # force the single-device path for the same encode
    orig_mesh = wf._frame_mesh
    wf._frame_mesh = lambda F: None
    try:
        bs_one, rec_one = encode_sequence(frames, EncoderConfig(**cfg))
    finally:
        wf._frame_mesh = orig_mesh
    assert bs_multi == bs_one
    for a, b in zip(rec_multi, rec_one):
        assert (a.y == b.y).all() and (a.u == b.u).all() \
            and (a.v == b.v).all()


def test_gop_sharded_inter_bit_identical():
    """Closed GOPs sharded round-robin across the 8-device mesh produce
    the SAME bytes as the serial encode (SURVEY.md 5.7 GOP axis): IDR
    boundaries make GOPs independent, fixed-QP RC is GOP-stationary."""
    import jax

    from ks265codec_tpu.parallel import encode_gops_sharded
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    frames = _clip(8, 96, 64)
    mk = lambda: EncoderConfig(width=96, height=64, preset="fast",
                               latency="zerolatency", qp=32,
                               intra_period=4, frame_rate=30)
    bs_serial, _ = encode_sequence(frames, mk())
    bs_shard, coded = encode_gops_sharded(frames, mk(),
                                          devices=jax.devices())
    assert bs_shard == bs_serial
    assert [ef.display_idx for ef in coded] == list(range(8))
    # P frames actually present (the inter engine ran per shard)
    assert any(ef.slice_type == "P" for ef in coded)
    from ks265codec_tpu.decode.decoder import HevcDecoder
    out = HevcDecoder().decode_all(bs_shard)
    assert len(out) == 8
