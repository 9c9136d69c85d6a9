"""Encoder conformance (SURVEY.md section 4 test strategy):
1. our stream must decode bit-exactly under the reference AppDecoder,
2. our recon must equal our own decode (encoder-recon == decoder-output
   invariant — the single most valuable end-to-end test),
3. quality sanity: PSNR at the produced bitrate.
"""

import subprocess

import numpy as np
import pytest

from ks265codec_tpu.decode.decoder import HevcDecoder
from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import HevcEncoder, encode_sequence
from ks265codec_tpu.utils.yuv import YUVFrame

from conftest import CACHE, have_reference, make_synthetic_yuv

W, H = 192, 96


def _frames(n=3, w=W, h=H, seed=11):
    p = CACHE / f"enc_in_{w}x{h}_{seed}_{n}.yuv"
    CACHE.mkdir(parents=True, exist_ok=True)
    if not p.exists():
        make_synthetic_yuv(p, w, h, frames=n, seed=seed)
    data = p.read_bytes()
    fsz = w * h * 3 // 2
    out = []
    for i in range(min(n, len(data) // fsz)):
        off = i * fsz
        y = np.frombuffer(data[off:off + w * h], np.uint8).reshape(h, w)
        u = np.frombuffer(data[off + w * h:off + w * h + w * h // 4],
                          np.uint8).reshape(h // 2, w // 2)
        v = np.frombuffer(data[off + w * h + w * h // 4:off + fsz],
                          np.uint8).reshape(h // 2, w // 2)
        out.append(YUVFrame(y, u, v, poc=i))
    return out


@pytest.fixture(scope="session")
def ai_stream():
    frames = _frames(2)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=30,
                        intra_period=1)
    return encode_sequence(frames, cfg)


@pytest.fixture(scope="session")
def ipp_stream():
    frames = _frames(4)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=30,
                        intra_period=64)
    return encode_sequence(frames, cfg)


def test_ai_roundtrip_own_decoder(ai_stream):
    bs, recons = ai_stream
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(recons)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert d.tobytes() == r.tobytes(), f"frame {i} recon != decode"


def test_ipp_roundtrip_own_decoder(ipp_stream):
    """I + P frames (merge/skip/AMVP + dense ME) round-trip."""
    bs, recons = ipp_stream
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(recons)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert d.tobytes() == r.tobytes(), f"frame {i}"


@pytest.mark.parametrize("qp", [22, 40])
def test_qp_sweep_roundtrip(qp):
    frames = _frames(1)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=qp,
                        intra_period=1)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert dec[0].tobytes() == recons[0].tobytes()


def test_quality_sane():
    frames = _frames(1)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=27,
                        intra_period=1, psnr=1)
    enc = HevcEncoder(cfg)
    # all-intra offline batches frames (FPP analog): drain via flush
    ef = (enc.encode_frame(frames[0]) + enc.flush())[0]
    assert ef.psnr[0] > 33, f"PSNR too low: {ef.psnr[0]}"
    assert ef.bits < W * H * 8, "bitstream larger than raw"


@pytest.mark.skipif(not have_reference(), reason="no reference binaries")
def test_reference_decoder_accepts(tmp_path, ai_stream, ipp_stream):
    """The shipped appdecoder must decode our streams to exactly our recon."""
    from conftest import _ref_bin
    for name, (bs, recons) in (("ai", ai_stream), ("ipp", ipp_stream)):
        bsf = tmp_path / f"{name}.265"
        bsf.write_bytes(bs)
        outf = tmp_path / f"{name}_dec.yuv"
        r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf),
                            "-o", str(outf), "-threads", "1"],
                           capture_output=True, text=True)
        assert r.returncode == 0, f"appdecoder failed on {name}: {r.stdout}"
        want = b"".join(rc.tobytes() for rc in recons)
        assert outf.read_bytes() == want, f"{name}: reference decode differs"


def test_deblock_off_roundtrip():
    frames = _frames(1)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=32,
                        intra_period=1, deblock=False)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert dec[0].tobytes() == recons[0].tobytes()


def test_idr_cadence():
    """Mid-stream IDR every 2 frames (POC reset exercised)."""
    frames = _frames(4)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=30,
                        intra_period=2)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


def test_nondivisible_dimensions():
    """Conformance-window cropping: 176x100 (not multiples of 16)."""
    frames = _frames(1, w=176, h=100)
    cfg = EncoderConfig(width=176, height=100, sao=0, preset="ultrafast", qp=30,
                        intra_period=1)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert dec[0].y.shape == (100, 176)
    assert dec[0].tobytes() == recons[0].tobytes()


def test_gop8_bframes_roundtrip():
    """Hierarchical-B GOP-8: reordering, L1 refs, DPB bumping."""
    frames = _frames(10, seed=21)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="medium",
                        latency="offline", qp=30, intra_period=64)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 10
    assert [d.poc for d in dec] == list(range(10))
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert d.tobytes() == r.tobytes(), f"display {i}"


@pytest.mark.skipif(not have_reference(), reason="no reference binaries")
def test_gop8_reference_decoder(tmp_path):
    from conftest import _ref_bin
    frames = _frames(10, seed=21)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="medium",
                        latency="offline", qp=30, intra_period=64)
    bs, recons = encode_sequence(frames, cfg)
    bsf = tmp_path / "b.265"
    bsf.write_bytes(bs)
    outf = tmp_path / "bdec.yuv"
    r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
                        str(outf), "-threads", "1"], capture_output=True)
    assert r.returncode == 0
    assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)


@pytest.mark.parametrize("rc_mode,kw", [
    (3, dict(crf=30)),                                  # CRF
    (2, dict(bitrate_kbps=120)),                        # ABR
    (1, dict(bitrate_kbps=120, vbv_maxrate_kbps=150,
             vbv_bufsize_kbits=150)),                   # CBR + VBV
])
def test_rate_control_roundtrip(rc_mode, kw):
    frames = _frames(6, seed=33)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast",
                        latency="zerolatency", rc=rc_mode,
                        intra_period=64, **kw)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 6
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
    if rc_mode in (1, 2):
        # 6 frames is too short for convergence; just pin gross sanity
        kbps = len(bs) * 8 * 30.0 / 6 / 1000.0
        assert kbps < kw["bitrate_kbps"] * 2.0, f"way over target: {kbps}"


def test_abr_converges_within_25pct():
    """ABR over a 30-frame clip must land within +-25% of target (the
    reference hits single-digit error; this pins regression room)."""
    frames = _frames(30, seed=7)
    for target in (120, 300):
        cfg = EncoderConfig(width=W, height=H, preset="ultrafast",
                            latency="zerolatency", rc=2,
                            bitrate_kbps=target, frame_rate=30,
                            intra_period=64)
        bs, _ = encode_sequence(frames, cfg)
        kbps = len(bs) * 8 * 30.0 / 30 / 1000.0
        assert abs(kbps / target - 1.0) < 0.25, (target, kbps)


def test_frame_skip_on_vbv_underflow():
    """cfg.frame_skip + starved VBV -> skipped pictures (no NAL, repeated
    recon), and the coded stream still decodes (judgeSkipFrame analog)."""
    frames = _frames(20, seed=13)
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast",
                        latency="zerolatency", rc=1, bitrate_kbps=5,
                        vbv_maxrate_kbps=5, vbv_bufsize_kbits=3,
                        frame_rate=30, frame_skip=1, intra_period=64)
    enc = HevcEncoder(cfg)
    outs = []
    for f in frames:
        outs += enc.encode_frame(f)
    outs += enc.flush()
    skips = [ef for ef in outs if ef.slice_type == "skip"]
    coded = [ef for ef in outs if ef.slice_type != "skip"]
    assert len(outs) == 20
    assert skips, "VBV starvation must trigger frame skips"
    assert all(ef.data == b"" and ef.bits == 0 for ef in skips)
    bs = b"".join(ef.data for ef in outs)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(coded)
    # no-skip control: same config without frame_skip codes every frame
    cfg2 = EncoderConfig(width=W, height=H, preset="ultrafast",
                         latency="zerolatency", rc=1, bitrate_kbps=5,
                         vbv_maxrate_kbps=5, vbv_bufsize_kbits=3,
                         frame_rate=30, frame_skip=0, intra_period=64)
    bs2, rec2 = encode_sequence(frames, cfg2)
    assert len(rec2) == 20


def test_wpp_encode_roundtrip():
    """Encoder WPP substreams: per-row engines, ctx inheritance, entry
    points. (cfg.wpp defaults on, so this pins the explicit case.)"""
    frames = _frames(3, seed=41)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=30,
                        intra_period=0, latency="zerolatency", wpp=True)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


def test_no_wpp_encode_roundtrip():
    frames = _frames(2, seed=42)
    cfg = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast", qp=30,
                        intra_period=1, wpp=False)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


def test_two_pass(tmp_path):
    """2-pass RC: pass 1 writes the stats file, pass 2 redistributes QP."""
    frames = _frames(4, seed=51)
    stat = str(tmp_path / "2p.log")
    cfg1 = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast",
                         latency="zerolatency", rc=2, bitrate_kbps=150,
                         intra_period=0, pass_num=1, stat_file=stat)
    bs1, _ = encode_sequence(frames, cfg1)
    assert (tmp_path / "2p.log").exists()
    cfg2 = EncoderConfig(width=W, height=H, sao=0, preset="ultrafast",
                         latency="zerolatency", rc=2, bitrate_kbps=150,
                         intra_period=0, pass_num=2, stat_file=stat)
    bs2, recons = encode_sequence(frames, cfg2)
    dec = HevcDecoder().decode_all(bs2)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


def test_sao_roundtrip():
    """SAO encoding (two-pass slice coding) end-to-end."""
    frames = _frames(2, seed=61)
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=32,
                        latency="zerolatency", intra_period=0, sao=4)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


@pytest.mark.skipif(not have_reference(), reason="no reference binaries")
def test_sao_reference_decoder(tmp_path):
    from conftest import _ref_bin
    frames = _frames(2, seed=61)
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=32,
                        latency="zerolatency", intra_period=0, sao=4)
    bs, recons = encode_sequence(frames, cfg)
    bsf = tmp_path / "sao.265"
    bsf.write_bytes(bs)
    outf = tmp_path / "sdec.yuv"
    import subprocess
    r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
                        str(outf), "-threads", "1"], capture_output=True)
    assert r.returncode == 0
    assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)


@pytest.mark.skipif(not have_reference(), reason="no reference binaries")
def test_reference_decoder_accepts_sbh_and_gop_shapes(tmp_path):
    """SBH streams (medium preset) and the bframes-resolved mini-GOP shapes
    (GOP2/GOP3/GOP4) must decode bit-exactly under the shipped appdecoder."""
    from conftest import _ref_bin
    frames = _frames(9)
    cases = (
        ("sbh_ai", dict(preset="medium", qp=30, intra_period=1)),
        ("sbh_gop8", dict(preset="medium", qp=30, intra_period=0)),
        ("gop4", dict(preset="medium", qp=32, intra_period=0, bframes=3)),
        ("gop3", dict(preset="medium", qp=32, intra_period=0, bframes=2)),
        ("gop2", dict(preset="medium", qp=32, intra_period=0, bframes=1)),
    )
    for name, kw in cases:
        cfg = EncoderConfig(width=W, height=H, sao=0, **kw)
        bs, recons = encode_sequence(frames, cfg)
        bsf = tmp_path / f"{name}.265"
        bsf.write_bytes(bs)
        outf = tmp_path / f"{name}_dec.yuv"
        r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf),
                            "-o", str(outf), "-threads", "1"],
                           capture_output=True, text=True)
        assert r.returncode == 0, f"appdecoder failed on {name}: {r.stdout}"
        want = b"".join(rc.tobytes() for rc in recons)
        assert outf.read_bytes() == want, f"{name}: reference decode differs"


def test_gop_shapes_reorder_latency():
    """bframes resolves to the right mini-GOP and reorder depth
    (VERDICT weak #4: livestreaming bframes=3 must not code GOP-8)."""
    from ks265codec_tpu.encode.gop import gop_plan, gop_size, reorder_depth
    assert gop_size("livestreaming", 3) == 4
    assert reorder_depth(gop_plan("livestreaming", 3)) <= 2
    assert gop_size("offline", 1) == 2
    assert gop_size("offline", 2) == 3
    assert gop_size("offline", 7) == 8
    assert gop_size("zerolatency", 3) == 1


def test_wide_merange_catches_large_motion():
    """me>=2 presets engage the pyramid search (merange 64 default): a
    40 px/frame pan must code dramatically cheaper than the +-16 grid
    of the fast tiers (the reference's UMH/EPZS wide-range behavior)."""
    rng = np.random.RandomState(2)
    base = np.clip(rng.randn(H, W + 200) * 30 + 128, 0,
                   255).astype(np.uint8)
    frames = []
    for t in range(3):
        y = base[:, t * 40:t * 40 + W].copy()
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 140, np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))
    sizes = {}
    for name, merange in (("narrow", 12), ("wide", 64)):
        cfg = EncoderConfig(width=W, height=H, preset="slow", qp=32,
                            latency="zerolatency", sao=0, merange=merange)
        bs, recons = encode_sequence(frames, cfg)
        dec = HevcDecoder().decode_all(bs)
        for d, r in zip(dec, recons):
            assert d.tobytes() == r.tobytes(), name
        sizes[name] = len(bs)
    # the pyramid search (merange 64) must beat a +-12 grid on this pan.
    # (The device engine runs the wide hierarchical search for EVERY
    # preset's 8-tier now, so the contrast is drawn via -merange.)
    assert sizes["wide"] < 0.95 * sizes["narrow"], sizes


def test_open_gop_cra_and_long_term_refs(tmp_path):
    """Open-GOP CRA intra refresh (POC continues, nal CRA_NUT) and
    long-term reference marking/use both round-trip and decode under the
    reference decoder (qy265enc.h:144,147 analogs)."""
    import subprocess

    from conftest import _ref_bin, have_reference
    from ks265codec_tpu.bitstream.nal import NalType, parse_nals
    frames = _frames(8, seed=77)
    for name, kw in (
            ("cra", dict(intra_period=3, open_gop=True)),
            ("lt", dict(long_term_ref=True)),
            ("pic_timing", dict(pic_timing_sei=True))):
        cfg = EncoderConfig(width=W, height=H, preset="medium", qp=32,
                            latency="zerolatency", **kw)
        bs, recons = encode_sequence(frames, cfg)
        dec = HevcDecoder().decode_all(bs)
        assert len(dec) == 8, name
        for d, r in zip(dec, recons):
            assert d.tobytes() == r.tobytes(), name
        types = [n.nal_type for n in parse_nals(bs)]
        if name == "cra":
            assert NalType.CRA_NUT in types
            pocs = [d.poc for d in dec]
            assert pocs == sorted(pocs) and len(set(pocs)) == 8, pocs
        if name == "pic_timing":
            assert types.count(NalType.PREFIX_SEI) >= 8
        if have_reference():
            bsf = tmp_path / f"{name}.265"
            bsf.write_bytes(bs)
            outf = tmp_path / "out.yuv"
            r = subprocess.run(
                [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
                 str(outf), "-threads", "1"], capture_output=True)
            assert r.returncode == 0, name
            assert outf.read_bytes() == b"".join(
                rc.tobytes() for rc in recons), name


def test_inter_partitions_roundtrip(tmp_path):
    """2NxN / Nx2N inter PUs (slower+ ladder or explicit -partitions):
    per-PU motion + the implicit depth-0 TU split, bit-exact under the
    reference decoder."""
    import subprocess

    from conftest import _ref_bin, have_reference
    frames = _frames(5, seed=55)
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=32,
                        latency="zerolatency", partitions=1, sao=0)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 5
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
    # partitions must actually fire on this clip
    import ks265codec_tpu.decode.slice_dec as SD
    seen = []
    orig = SD.SliceDecoder._parse_part_mode_inter

    def spy(self, log2):
        p = orig(self, log2)
        seen.append(p)
        return p

    SD.SliceDecoder._parse_part_mode_inter = spy
    try:
        HevcDecoder().decode_all(bs)
    finally:
        SD.SliceDecoder._parse_part_mode_inter = orig
    assert any(p in (1, 2) for p in seen), "no rectangular PU coded"
    if have_reference():
        bsf = tmp_path / "part.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "out.yuv"
        r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf),
                            "-o", str(outf), "-threads", "1"],
                           capture_output=True)
        assert r.returncode == 0
        assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)


def test_inter_tu_split_roundtrip(tmp_path):
    """-intertu (inter TU-split search): explicit split_transform_flag
    trees, four child TUs, conformant both directions."""
    import subprocess

    from conftest import _ref_bin, have_reference
    frames = _frames(5, seed=91)
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=30,
                        latency="zerolatency", inter_tu_depth=1)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 5
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
    if have_reference():
        bsf = tmp_path / "tus.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "out.yuv"
        r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf),
                            "-o", str(outf), "-threads", "1"],
                           capture_output=True)
        assert r.returncode == 0
        assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)


def test_weighted_prediction_encode(tmp_path):
    """weightp: fade content gets explicit per-ref luma (gain, offset)
    weights; streams round-trip our decoder and the reference decoder."""
    import subprocess

    from conftest import _ref_bin, have_reference
    rng = np.random.RandomState(17)
    base = np.clip(120 + rng.randn(H, W) * 30, 0, 255)
    frames = []
    for t in range(6):
        fade = 1.0 - 0.12 * t                 # global fade to black
        y = np.clip(base * fade, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 135, np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=30,
                        latency="zerolatency", intra_period=64)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 6
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
    # the fade must actually trigger a non-identity weight
    from ks265codec_tpu.encode.encoder import decide_weightp

    class _RP:
        def __init__(self, y):
            self.fs = type("F", (), {"y": y})()

    wt = decide_weightp(frames[1].y, [_RP(frames[0].y.astype(np.int32))])
    assert wt is not None and wt[0][0].flag == 1
    assert wt[0][0].weight < 64          # fade down -> gain < 1
    if have_reference():
        bsf = tmp_path / "wp.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "wpdec.yuv"
        r = subprocess.run(
            [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
             str(outf), "-threads", "1"], capture_output=True)
        assert r.returncode == 0
        assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)


def test_noise_reduction_acts():
    """-nr: coefficient-domain denoise attenuates small inter coeffs —
    fewer bits on noisy content, stream still decodes bit-exact."""
    rng = np.random.RandomState(23)
    base = np.clip(120 + rng.randn(H, W) * 18, 0, 255)
    frames = []
    for t in range(4):
        y = np.clip(base + rng.randn(H, W) * 6, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 135, np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))
    sizes = {}
    for nr in (0, 600):
        cfg = EncoderConfig(width=W, height=H, preset="medium", qp=28,
                            latency="zerolatency", intra_period=64,
                            noise_reduction=nr)
        bs, recons = encode_sequence(frames, cfg)
        dec = HevcDecoder().decode_all(bs)
        for d, r in zip(dec, recons):
            assert d.tobytes() == r.tobytes(), f"nr={nr}"
        sizes[nr] = len(bs)
    assert sizes[600] < sizes[0], sizes


def test_intra_nxn_roundtrip(tmp_path, monkeypatch):
    """intra NxN (4x4 PUs + DST TUs at the min CB): acts on detail
    content, decodes bit-exactly on our decoder and the reference's.
    KS265_SEQ_COMPUTE forces the sequential host path (NxN's home; the
    wavefront batch codes the 2Nx2N tiers)."""
    import subprocess

    from conftest import _ref_bin, have_reference
    monkeypatch.setenv("KS265_SEQ_COMPUTE", "1")
    rng = np.random.RandomState(31)
    frames = []
    for t in range(2):
        # text-like content (flat bg + sparse thin strokes): the 4x4 PU
        # sweet spot — periodic/noisy textures collapse to large CUs
        y = np.full((H, W), 200, np.float64)
        for _ in range(220):
            x0, y0 = rng.randint(0, W - 8), rng.randint(0, H - 8)
            if rng.rand() < 0.5:
                y[y0:y0 + 1 + rng.randint(2),
                  x0:x0 + rng.randint(3, 9)] = rng.randint(0, 90)
            else:
                y[y0:y0 + rng.randint(3, 9),
                  x0:x0 + 1 + rng.randint(2)] = rng.randint(0, 90)
        y = np.clip(y + rng.randn(H, W) * 2, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 135, np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))
    sizes = {}
    from ks265codec_tpu.encode import config as cfgmod
    for nxn in (False, True):
        # an explicit False equals the dataclass default, which the
        # ladder overrides (reference CLI semantics) — pin via ladder
        monkeypatch.setitem(cfgmod._LADDER["medium"], "intra_nxn", nxn)
        cfg = EncoderConfig(width=W, height=H, preset="medium", qp=24,
                            latency="offline", intra_period=1)
        bs, recons = encode_sequence(frames, cfg)
        dec = HevcDecoder().decode_all(bs)
        assert len(dec) == 2
        for d, r in zip(dec, recons):
            assert d.tobytes() == r.tobytes(), f"nxn={nxn}"
        sizes[nxn] = len(bs)
        if nxn and have_reference():
            bsf = tmp_path / "nxn.265"
            bsf.write_bytes(bs)
            outf = tmp_path / "nxndec.yuv"
            r = subprocess.run(
                [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
                 str(outf), "-threads", "1"], capture_output=True)
            assert r.returncode == 0
            assert outf.read_bytes() == b"".join(
                rc.tobytes() for rc in recons)
    assert sizes[True] != sizes[False], sizes


def test_dependent_slice_segments(tmp_path):
    """-slices N: one independent + N-1 dependent slice segments per
    picture (CABAC ctx continuation, qPY_PREV reset per segment) —
    round-trips our decoder and the reference decoder, I and P frames."""
    import subprocess

    from ks265codec_tpu.bitstream.nal import is_vcl, parse_nals

    from conftest import _ref_bin, have_reference
    frames = _frames(3, seed=41)
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=31,
                        latency="zerolatency", intra_period=64, slices=2)
    bs, recons = encode_sequence(frames, cfg)
    vcl = sum(1 for n in parse_nals(bs) if is_vcl(n.nal_type))
    assert vcl == 6, f"expected 2 segments x 3 pictures, got {vcl}"
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 3
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
    if have_reference():
        bsf = tmp_path / "seg.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "segdec.yuv"
        r = subprocess.run(
            [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
             str(outf), "-threads", "1"], capture_output=True)
        assert r.returncode == 0
        assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)


def test_transform_skip_encode(tmp_path, monkeypatch):
    """-tune screen: transform_skip 4x4 TUs on text content — the flag
    acts, streams round-trip ours and the reference decoder."""
    import subprocess

    from conftest import _ref_bin, have_reference
    monkeypatch.setenv("KS265_SEQ_COMPUTE", "1")
    rng = np.random.RandomState(47)
    y = np.full((H, W), 220, np.float64)
    for _ in range(260):
        x0, y0 = rng.randint(0, W - 8), rng.randint(0, H - 8)
        if rng.rand() < 0.5:
            y[y0:y0 + 1, x0:x0 + rng.randint(3, 9)] = rng.randint(0, 70)
        else:
            y[y0:y0 + rng.randint(3, 9), x0:x0 + 1] = rng.randint(0, 70)
    yb = np.clip(y, 0, 255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 135, np.uint8)
    frames = [YUVFrame(yb, u, v, poc=0)]
    sizes = {}
    for ts in (False, True):
        cfg = EncoderConfig(width=W, height=H, preset="medium", qp=27,
                            latency="offline", intra_period=1,
                            tune="screen" if ts else "default")
        bs, recons = encode_sequence(frames, cfg)
        dec = HevcDecoder().decode_all(bs)
        for d, r in zip(dec, recons):
            assert d.tobytes() == r.tobytes(), f"screen={ts}"
        sizes[ts] = len(bs)
        if ts and have_reference():
            bsf = tmp_path / "ts.265"
            bsf.write_bytes(bs)
            outf = tmp_path / "tsdec.yuv"
            r = subprocess.run(
                [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
                 str(outf), "-threads", "1"], capture_output=True)
            assert r.returncode == 0
            assert outf.read_bytes() == b"".join(
                rc.tobytes() for rc in recons)
    assert sizes[True] != sizes[False], sizes


def test_amp_partitions_roundtrip(tmp_path):
    """partitions=2 (placebo tier): AMP PUs (2NxnU/2NxnD/nLx2N/nRx2N) —
    streams round-trip ours and the reference decoder."""
    import subprocess

    from conftest import _ref_bin, have_reference
    frames = _frames(5, seed=55)
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=32,
                        latency="zerolatency", intra_period=64,
                        partitions=2, sao=0)
    # AMP parts (4..7) must actually decode from the stream
    import ks265codec_tpu.decode.slice_dec as SD
    seen = []
    orig = SD.SliceDecoder._parse_part_mode_inter

    def spy(self, log2):
        p = orig(self, log2)
        seen.append(p)
        return p

    SD.SliceDecoder._parse_part_mode_inter = spy
    try:
        bs, recons = encode_sequence(frames, cfg)
        dec = HevcDecoder().decode_all(bs)
    finally:
        SD.SliceDecoder._parse_part_mode_inter = orig
    assert any(p >= 4 for p in seen), f"no AMP parts decoded: {set(seen)}"
    assert len(dec) == 5
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
    if have_reference():
        bsf = tmp_path / "amp.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "ampdec.yuv"
        r = subprocess.run(
            [str(_ref_bin("appdecoder")), "-b", str(bsf), "-o",
             str(outf), "-threads", "1"], capture_output=True)
        assert r.returncode == 0
        assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)


@pytest.mark.parametrize("preset", ["slower", "placebo"])
def test_deep_preset_offline_roundtrip(preset, tmp_path):
    """slower/placebo offline-B: every deep tool at once (partitions/AMP,
    TU splits, multi-ref, cutree per-CTU QP, NxN, weightp) — caught a
    real interaction bug: apply_effective_qp judged split-tree CUs by
    their top-left cell's cbf only."""
    frames = _frames(8, seed=99)
    cfg = EncoderConfig(width=W, height=H, preset=preset, qp=31,
                        latency="offline", intra_period=8)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == 8
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert d.tobytes() == r.tobytes(), f"{preset} display {i}"
    if have_reference():
        from conftest import _ref_bin
        bsf = tmp_path / f"{preset}.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "deep.yuv"
        r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf),
                            "-o", str(outf), "-threads", "1"],
                           capture_output=True)
        assert r.returncode == 0
        assert outf.read_bytes() == b"".join(rc.tobytes() for rc in recons)
    # truncation mid-stream must conceal, not raise (BitReaderError is a
    # ValueError so the resilience handlers cover header truncation too)
    partial = HevcDecoder().decode_all(bs[:len(bs) // 2])
    assert len(partial) >= 1
