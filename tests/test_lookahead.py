"""Lookahead pre-analysis: scene-cut detection -> forced IDR; frame-cost
feed to rate control (EncPreAnalyze analog, SURVEY.md 2.3)."""

import numpy as np

from ks265codec_tpu.bitstream.nal import NalType, parse_nals
from ks265codec_tpu.decode.decoder import HevcDecoder
from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import encode_sequence
from ks265codec_tpu.utils.yuv import YUVFrame

W, H = 192, 96


def _two_scene_clip(n=10, cut=5):
    rng = np.random.RandomState(5)
    frames = []
    xx = np.arange(W)[None, :]
    for t in range(n):
        if t < cut:
            y = np.clip(100 + 60 * np.sin((xx + 4 * t) / 19.0)
                        + rng.randn(H, W) * 3, 0, 255)
        else:
            # completely different content after the cut
            y = np.clip(rng.randint(0, 255, (H, W)) * 0.7 + 40, 0, 255)
        u = np.full((H // 2, W // 2), 120 if t < cut else 90, np.uint8)
        v = np.full((H // 2, W // 2), 130 if t < cut else 160, np.uint8)
        frames.append(YUVFrame(y.astype(np.uint8), u, v, poc=t))
    return frames


def test_scenecut_forces_idr():
    frames = _two_scene_clip()
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=30,
                        latency="zerolatency", intra_period=64)
    bs, recons = encode_sequence(frames, cfg)
    idr_positions = []
    frame_no = -1
    for nal in parse_nals(bs):
        if nal.nal_type in (NalType.IDR_W_RADL, NalType.IDR_N_LP,
                            NalType.TRAIL_R, NalType.TRAIL_N):
            frame_no += 1
        if nal.nal_type in (NalType.IDR_W_RADL, NalType.IDR_N_LP):
            idr_positions.append(frame_no)
    assert 0 in idr_positions
    assert 5 in idr_positions, f"scene cut at 5 not IDR'd: {idr_positions}"
    # no IDR storm: the smooth first scene must stay P
    assert not any(p in (1, 2, 3, 4) for p in idr_positions), idr_positions
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 10
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


def test_frame_cost_feeds_rc():
    """With lookahead, the first P frame's QP comes from ITS OWN cost, not
    a stale same-type predictor (RC no longer blind)."""
    from ks265codec_tpu.encode.encoder import HevcEncoder
    frames = _two_scene_clip()
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast",
                        latency="zerolatency", rc=2, bitrate_kbps=200,
                        intra_period=64)
    enc = HevcEncoder(cfg)
    outs = []
    for f in frames:
        outs += enc.encode_frame(f)
    outs += enc.flush()
    assert len(outs) == 10
    assert all(fa.cost > 0 for fa in enc.la.analyses.values())


def test_aq_mode_roundtrip_and_reference(tmp_path):
    """aq_mode=1: per-CTU QP deltas through the cu_qp_delta encode path —
    own decoder round-trip and reference-decoder bit-exactness."""
    import subprocess

    from conftest import _ref_bin, have_reference
    rng = np.random.RandomState(3)
    frames = []
    for t in range(3):
        # mixed-energy content so AQ picks nonzero offsets
        y = np.full((H, W), 120, np.uint8)
        y[:, : W // 2] = np.clip(
            120 + rng.randn(H, W // 2) * 40, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 115, np.uint8)
        v = np.full((H // 2, W // 2), 135, np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))
    for latency, iper in (("offline", 1), ("zerolatency", 64)):
        cfg = EncoderConfig(width=W, height=H, preset="medium", qp=32,
                            intra_period=iper, latency=latency, aq_mode=1)
        bs, recons = encode_sequence(frames, cfg)
        dec = HevcDecoder().decode_all(bs)
        assert len(dec) == 3
        for d, r in zip(dec, recons):
            assert d.tobytes() == r.tobytes()
        # QP actually varies across CTUs in the I frame
        if have_reference():
            bsf = tmp_path / f"aq_{latency}.265"
            bsf.write_bytes(bs)
            outf = tmp_path / "aqdec.yuv"
            r = subprocess.run(
                [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
                 str(outf), "-threads", "1"], capture_output=True)
            assert r.returncode == 0
            assert outf.read_bytes() == b"".join(
                rc.tobytes() for rc in recons)

def test_cutree_roundtrip_and_reference(tmp_path):
    """cutree=1: lookahead CU-tree propagation lowers QP on blocks that
    feed future frames (static background) via cu_qp_delta on P frames —
    own decoder round-trip and reference-decoder bit-exactness."""
    import subprocess

    from conftest import _ref_bin, have_reference
    rng = np.random.RandomState(7)
    frames = []
    bg = np.clip(110 + rng.randn(H, W) * 25, 0, 255).astype(np.uint8)
    for t in range(6):
        # static detailed background (referenced by every future frame)
        # + a moving noisy box (poorly predicted, transient)
        y = bg.copy()
        bx = 8 * t
        y[20:60, bx:bx + 40] = rng.randint(0, 255, (40, 40))
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))
    # offline: the GOP reorder buffers frames, so the lazy lookahead
    # flush sees a multi-frame window to propagate across (zerolatency
    # codes frame-by-frame -> single-frame windows -> no propagation,
    # matching x264's cutree-off-at-zerolatency behavior)
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=32,
                        intra_period=64, latency="offline", cutree=1)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 6
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
    # the analyses must carry tree offsets (<= 0 by construction)
    from ks265codec_tpu.encode.encoder import HevcEncoder
    enc = HevcEncoder(cfg)
    for f in frames:
        enc.encode_frame(f)
    enc.flush()
    das = [fa.dqp_ctu for fa in enc.la.analyses.values()
           if fa.dqp_ctu is not None]
    assert das and any(d.min() < 0 for d in das), \
        "cutree produced no negative offsets"
    if have_reference():
        bsf = tmp_path / "cutree.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "ctdec.yuv"
        r = subprocess.run(
            [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
             str(outf), "-threads", "1"], capture_output=True)
        assert r.returncode == 0
        assert outf.read_bytes() == b"".join(
            rc.tobytes() for rc in recons)
