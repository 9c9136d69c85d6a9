"""Stage-split encoder tests: wavefront device pass vs sequential oracle,
native slice writer vs Python writer, and EPB/entry-point accounting."""

import numpy as np
import pytest

from ks265codec_tpu.bitstream.nal import (epb_insert_positions, insert_epb,
                                          remove_epb_pos)
from ks265codec_tpu.bitstream.nal import NalType
from ks265codec_tpu.decode.slice_dec import FrameState
from ks265codec_tpu.encode.config import EncoderConfig, resolve_preset
from ks265codec_tpu.encode.encoder import HevcEncoder
from ks265codec_tpu.encode.intra_frame import IntraFrameEncoder
from ks265codec_tpu.hevc.slicehdr import I_SLICE, SliceHeader


def _mk_intra(W, H, qp, seed=7):
    rng = np.random.RandomState(seed)
    cfg = resolve_preset(EncoderConfig(width=W, height=H, preset="medium",
                                       qp=qp, intra_period=1))
    he = HevcEncoder(cfg)
    y = np.clip(rng.randint(0, 255, (H, W)) * 0.4 + 80
                + np.arange(W)[None, :] * 0.5, 0, 255).astype(np.int32)
    u = np.clip(128 + rng.randn(H // 2, W // 2) * 25, 0, 255).astype(np.int32)
    v = np.clip(128 + rng.randn(H // 2, W // 2) * 25, 0, 255).astype(np.int32)
    hdr = SliceHeader(nal_type=NalType.IDR_W_RADL, temporal_id=0,
                      first_slice_in_pic=1, pps_id=0, slice_type=I_SLICE,
                      slice_qp=qp, pic_order_cnt_lsb=0)
    hdr.poc = 0
    return he, hdr, y, u, v


@pytest.mark.parametrize("W,H,qp", [(96, 64, 30), (128, 80, 22)])
def test_wavefront_matches_sequential(W, H, qp):
    from ks265codec_tpu.ops.wavefront import WavefrontIntraCoder
    coder = WavefrontIntraCoder()
    if not coder.available:
        pytest.skip("native library unavailable")
    he, hdr, y, u, v = _mk_intra(W, H, qp)

    def mk():
        fs = FrameState(he.sps)
        return fs, IntraFrameEncoder(fs, he.sps, he.pps, hdr, y, u, v, qp)

    fs1, e1 = mk()
    e1.compute_sequential()
    fs2, e2 = mk()
    e2.compute_wavefront(coder)
    for name in ("y", "cb", "cr"):
        assert np.array_equal(getattr(fs1, name), getattr(fs2, name)), name
    for name in ("cy", "ccb", "ccr"):
        assert np.array_equal(getattr(e1.syn, name),
                              getattr(e2.syn, name)), name
    for name in ("cu_depth", "qp", "intra_mode", "pred_mode", "cbf_luma",
                 "cu_edge_v", "cu_edge_h", "tu_edge_v", "tu_edge_h"):
        assert np.array_equal(getattr(fs1, name), getattr(fs2, name)), name
    for name in ("chroma_mode", "cbf_cb", "cbf_cr"):
        assert np.array_equal(getattr(e1.syn, name),
                              getattr(e2.syn, name)), name


def test_native_slice_writer_matches_python():
    """Whole-slice native CABAC == Python map writer, byte for byte,
    on an intra frame and a B-GOP sequence."""
    from ks265codec_tpu import native
    if not native.HAVE_NATIVE:
        pytest.skip("native library unavailable")
    import ks265codec_tpu.encode.map_writer as mw
    from ks265codec_tpu.encode.encoder import encode_sequence
    from ks265codec_tpu.utils.yuv import YUVFrame

    calls = []
    orig = mw.write_slice_data

    def checked(fs, syn, sps, pps, hdr, sao_params=None, threads=1):
        py = mw.write_slice_data_py(fs, syn, sps, pps, hdr, sao_params)
        nat = native.write_slice_native(fs, syn, sps, pps, hdr, sao_params)
        assert nat is not None
        assert nat[0] == py[0]
        assert nat[1] == py[1]
        calls.append(hdr.slice_type)
        return nat

    mw.write_slice_data = checked
    try:
        rng = np.random.RandomState(3)
        W, H = 96, 64
        frames = []
        for t in range(4):
            y = np.clip(rng.randint(0, 255, (H, W)) * 0.3 + 100
                        + np.arange(W)[None, :], 0, 255).astype(np.uint8)
            u = np.clip(128 + rng.randn(H // 2, W // 2) * 20,
                        0, 255).astype(np.uint8)
            v = np.clip(128 + rng.randn(H // 2, W // 2) * 20,
                        0, 255).astype(np.uint8)
            frames.append(YUVFrame(y, u, v, poc=t))
        cfg = EncoderConfig(width=W, height=H, preset="medium", qp=30,
                            intra_period=0)
        encode_sequence(frames, cfg)
    finally:
        mw.write_slice_data = orig
    assert len(calls) >= 4
    assert 2 in calls          # at least one non-I slice exercised
    assert 0 in calls or 1 in calls


# ------------------------------------------------------------- EPB mapping

def test_epb_roundtrip_positions():
    rng = np.random.RandomState(1)
    for _ in range(200):
        raw = bytes(rng.randint(0, 4, size=rng.randint(1, 60),
                                dtype=np.uint8).tobytes())
        esc = insert_epb(raw)
        back, pos = remove_epb_pos(esc)
        assert back == raw
        ins = epb_insert_positions(raw)
        # every insertion position must be recovered by removal
        assert list(pos) == ins


def test_entry_point_epb_mapping():
    """Decoder's coded-offset -> rbsp-offset conversion against brute
    force, on adversarial zero-laden substreams."""
    from ks265codec_tpu.decode.slice_dec import SliceDecoder

    class HdrStub:
        pass

    rng = np.random.RandomState(5)
    for _ in range(100):
        data_start = rng.randint(0, 6)
        rbsp = bytes(rng.randint(0, 4, size=rng.randint(10, 80),
                                 dtype=np.uint8).tobytes())
        esc = insert_epb(rbsp)
        back, pos = remove_epb_pos(esc)
        assert back == rbsp
        # pick substream boundaries in rbsp coords after data_start
        bounds = sorted(set(rng.randint(data_start, len(rbsp), size=3)))
        # encoder-side: coded sizes from insert positions
        ins = epb_insert_positions(rbsp)
        entries = []
        prev = data_start
        for b in bounds:
            raw = b - prev
            adj = raw + sum(1 for i in ins if prev < i <= b)
            entries.append(adj)
            prev = b
        sd = SliceDecoder.__new__(SliceDecoder)
        sd.data_start = data_start
        sd.epb_pos = pos
        sd.rbsp = rbsp
        sd.hdr = HdrStub()
        sd.hdr.entry_points = entries
        for k, b in enumerate(bounds):
            assert sd._entry_byte_offset(k) == b, (k, b, entries, ins, pos)


# ----------------------------------------------- batched multi-frame (FPP)

def test_device_decide_outputs():
    """Decision invariants: delegation equals the batched pass, chroma
    modes are legal syntax candidates (0/26/10/1/34 or DM), split maps
    shaped right."""
    from ks265codec_tpu.encode.intra_frame import decide_frame
    from ks265codec_tpu.ops.decide import decide_frames

    rng = np.random.RandomState(11)
    W, H = 128, 64
    planes, cbs, crs, qps = [], [], [], []
    for t, qp in enumerate((22, 30, 37)):
        y = np.clip(rng.randint(0, 255, (H, W)) * 0.4 + 60 + 2 * t
                    + np.arange(W)[None, :] * 0.3, 0, 255).astype(np.uint8)
        planes.append(y)
        cbs.append(np.clip(110 + rng.randn(H // 2, W // 2) * 25,
                           0, 255).astype(np.uint8))
        crs.append(np.clip(140 + rng.randn(H // 2, W // 2) * 25,
                           0, 255).astype(np.uint8))
        qps.append(qp)
    batched = decide_frames(np.stack(planes), np.stack(cbs),
                            np.stack(crs), qps)
    for plane, cb, cr, qp, dec in zip(planes, cbs, crs, qps, batched):
        one = decide_frame(plane.astype(np.int32), cb.astype(np.int32),
                           cr.astype(np.int32), qp)
        for a, b in zip(one, dec):
            if np.isscalar(a) or getattr(a, "ndim", 1) == 0:
                assert abs(a - b) < 1e-3 * max(abs(a), 1.0)
            else:
                assert np.array_equal(a, b)
        (s32, m16, m32, cplx, s16, m8, cm8, cm16, cm32, c8, c16,
         _m4, _nxn) = dec
        assert c8.shape == (H // 8, W // 8) and (c8 > 0).all()
        assert c16.shape == (H // 16, W // 16) and (c16 > 0).all()
        assert s32.shape == (H // 32, W // 32)
        for lm, cm in ((m8, cm8), (m16, cm16), (m32, cm32)):
            assert (np.isin(cm, (0, 26, 10, 1, 34)) | (cm == lm)).all()
            # 34 only appears via the duplicate->34 substitution
            assert (np.isin(lm[cm == 34], (0, 26, 10, 1))).all()


def test_fpp_batch_matches_per_frame():
    """All-intra FPP batching (8 frames through one vmapped wavefront
    dispatch) must produce the identical bitstream to the per-frame path."""
    from ks265codec_tpu.encode.encoder import encode_sequence
    from ks265codec_tpu.utils.yuv import YUVFrame

    rng = np.random.RandomState(4)
    W, H = 96, 64
    frames = []
    for t in range(8):
        y = np.clip(rng.randint(0, 255, (H, W)) * 0.35 + 90 + 3 * t,
                    0, 255).astype(np.uint8)
        u = np.clip(128 + rng.randn(H // 2, W // 2) * 20,
                    0, 255).astype(np.uint8)
        v = np.clip(128 + rng.randn(H // 2, W // 2) * 20,
                    0, 255).astype(np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))

    def run(fpp):
        cfg = EncoderConfig(width=W, height=H, preset="medium", qp=30,
                            intra_period=1, fpp=fpp)
        return encode_sequence(frames, cfg)

    bs_seq, rec_seq = run(False)
    bs_fpp, rec_fpp = run(True)
    assert bs_fpp == bs_seq
    for a, b in zip(rec_seq, rec_fpp):
        assert a.tobytes() == b.tobytes()
