"""Native C CABAC residual codec vs the Python reference implementation:
byte-exact writes, exact parses, identical context evolution."""

import numpy as np
import pytest

from ks265codec_tpu import native
from ks265codec_tpu.bitstream.cabac import CabacDec, CabacEnc
from ks265codec_tpu.hevc import cabac_tables as CT

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native library not built")


class _FakePPS:
    transform_skip_enabled = 0
    sign_data_hiding_enabled = 0


class _FakeHdr:
    slice_type = 2
    slice_qp = 30
    cabac_init_flag = 0


def _py_writer(ctx):
    import ks265codec_tpu.encode.sbac as SB
    from ks265codec_tpu.encode.sbac import CtuSyntaxWriter
    w = CtuSyntaxWriter.__new__(CtuSyntaxWriter)
    w.pps = _FakePPS
    w.hdr = _FakeHdr
    w.enc = CabacEnc(ctx)
    return w, SB


def test_native_matches_python_roundtrip():
    rng = np.random.RandomState(7)
    for trial in range(120):
        log2 = int(rng.choice([2, 3, 4, 5]))
        n = 1 << log2
        c_idx = int(rng.choice([0, 1]))
        imode = None
        if log2 == 2 or (log2 == 3 and c_idx == 0):
            imode = int(rng.choice([8, 24, 0]))  # ver/hor/diag scans
        scan_idx = 0
        if imode is not None and (log2 == 2 or (log2 == 3 and c_idx == 0)):
            if 6 <= imode <= 14:
                scan_idx = 2
            elif 22 <= imode <= 30:
                scan_idx = 1
        coeffs = np.zeros((n, n), np.int32)
        nnz = int(rng.randint(1, max(2, n * n // 2)))
        pos = rng.choice(n * n, nnz, replace=False)
        coeffs.flat[pos] = rng.randint(-3000, 3000, nnz)
        if not coeffs.any():
            coeffs[0, 0] = 7
        # python write
        ctx_p = CT.init_contexts(2, 30)
        w, SB = _py_writer(ctx_p)
        saved = SB._native
        SB._native = None
        try:
            w.write_residual(coeffs, log2, c_idx, imode)
        finally:
            SB._native = saved
        # native write
        ctx_n = CT.init_contexts(2, 30)
        enc = CabacEnc(ctx_n)
        native.write_residual(enc, coeffs, log2, c_idx, scan_idx, 0)
        assert bytes(w.enc.out) == bytes(enc.out), f"trial {trial} bytes"
        assert bytes(ctx_p) == bytes(ctx_n), f"trial {trial} ctx"
        assert (w.enc.low, w.enc.range, w.enc.bits_left) == \
            (enc.low, enc.range, enc.bits_left), f"trial {trial} state"
        # native parse of the native stream
        enc.encode_terminate(1)
        payload = enc.finish()
        tv, tn = enc.get_tail_bits()
        acc = (tv << 1) | 1
        nb = tn + 1
        pad = (8 - nb % 8) % 8
        data = bytes(payload) + int(acc << pad).to_bytes((nb + pad) // 8,
                                                         "big")
        ctx_d = CT.init_contexts(2, 30)
        dec = CabacDec(data, 0, ctx_d)
        got, ts = native.parse_residual(dec, log2, c_idx, scan_idx, 0, 0)
        assert ts == 0
        np.testing.assert_array_equal(got, coeffs, err_msg=f"trial {trial}")


def test_wpp_mt_writer_matches_serial(monkeypatch, tmp_path):
    """The WPP row-parallel pthread writer must be byte-identical to the
    serial writer (same ctx snapshot point after CTB 1, per-row qp reset,
    same entry sizes) on intra AND inter slices."""
    import numpy as np

    import ks265codec_tpu.encode.map_writer as MW
    from ks265codec_tpu.encode.config import EncoderConfig
    from ks265codec_tpu.encode.encoder import HevcEncoder
    from ks265codec_tpu.utils.yuv import YUVFrame

    checked = []

    def both(fs, syn, sps, pps, hdr, sao_params=None, threads=1):
        got_1 = native.write_slice_native(fs, syn, sps, pps, hdr,
                                          sao_params, threads=1)
        got_mt = native.write_slice_native(fs, syn, sps, pps, hdr,
                                           sao_params, threads=4)
        assert got_1 is not None
        assert got_mt == got_1
        checked.append(hdr.slice_type)
        return got_1

    monkeypatch.setattr(MW, "write_slice_data", both)
    rng = np.random.RandomState(7)
    W2, H2 = 192, 128
    yy, xx = np.mgrid[0:H2, 0:W2]
    frames = []
    for t in range(4):
        y = np.clip(100 + 60 * np.sin((xx + 6 * t) / 19.0)
                    + rng.randn(H2, W2) * 3, 0, 255).astype(np.uint8)
        u = np.full((H2 // 2, W2 // 2), 120, np.uint8)
        v = np.clip(128 + 40 * np.cos((yy[::2, ::2]) / 13.0),
                    0, 255).astype(np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))
    cfg = EncoderConfig(width=W2, height=H2, preset="fast",
                        latency="zerolatency", qp=30, intra_period=4,
                        sao=4)
    assert cfg.wpp
    enc = HevcEncoder(cfg)
    for f in frames:
        enc.encode_frame(f)
    enc.flush()
    assert 2 in checked          # at least one intra slice
    assert any(t != 2 for t in checked)   # and one inter slice
