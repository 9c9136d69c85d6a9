"""QY265-shaped API surface (qy265enc.h/qy265dec.h contract) +
lenthevcdec legacy shim."""

import numpy as np

from ks265codec_tpu import api
from ks265codec_tpu.utils.yuv import YUVFrame


def _frames(n=3, w=192, h=96):
    rng = np.random.RandomState(5)
    out = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        y = np.clip(128 + 50 * np.sin((xx + 4 * t) / 9), 0,
                    255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        out.append(YUVFrame(y, u, v, poc=t))
    return out


def test_qy265_roundtrip():
    cfg = api.QY265ConfigDefaultPreset(192, 96, "ultrafast",
                                       latency="zerolatency")
    assert api.QY265ConfigParse(cfg, "qp", "31") == api.QY_OK
    assert api.QY265ConfigParse(cfg, "nonsense", "1") == \
        api.QY_CONFIG_BAD_NAME
    assert api.QY265ConfigParse(cfg, "qp", "xyz") == api.QY_CONFIG_BAD_VALUE
    cfg.intra_period = 0
    enc = api.QY265EncoderOpen(cfg)
    bs = b""
    coded = []
    for f in _frames():
        for ef in api.QY265EncoderEncodeFrame(enc, f):
            bs += ef.data
            coded.append(ef)
    for ef in api.QY265EncoderDelayedFrames(enc):
        bs += ef.data
        coded.append(ef)
    api.QY265EncoderClose(enc)
    assert coded and coded[0].qp == 31

    dec = api.QY265DecoderOpen()
    assert dec.decode_frame(bs) == api.QY_OK
    dec.flush()
    frames = []
    while True:
        f = dec.get_decoded_frame()
        if f is None:
            break
        frames.append(f)
        dec.return_decoded_frame(f)
    api.QY265DecoderClose(dec)
    want = sorted(coded, key=lambda e: e.display_idx)
    assert len(frames) == len(want)
    for f, ef in zip(frames, want):
        assert f.tobytes() == ef.recon.tobytes()

    # garbage in -> error status, no exception
    d2 = api.QY265DecoderOpen()
    assert d2.decode_frame(b"\x00\x00\x01\xff\x33") in (
        api.QY_OK, api.QY_BITSTREAM_ERROR)


def test_lenthevcdec_shim():
    cfg = api.QY265ConfigDefaultPreset(192, 96, "ultrafast",
                                       latency="zerolatency")
    cfg.intra_period = 1
    enc = api.QY265EncoderOpen(cfg)
    bs = b""
    for f in _frames(2):
        for ef in api.QY265EncoderEncodeFrame(enc, f):
            bs += ef.data
    ld = api.lenthevcdec_create(threads=1)
    got = ld.decode_frame(bs)
    rest = ld.flush()
    n = (1 if got else 0) + len(rest)
    assert n == 2
    if got:
        w, h, planes = got
        assert (w, h) == (192, 96)
    ld.destroy()
