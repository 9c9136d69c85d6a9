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

W, H = 320, 192


def _frames(n=3, w=W, h=H):
    p = CACHE / f"enc_in_{w}x{h}.yuv"
    CACHE.mkdir(parents=True, exist_ok=True)
    make_synthetic_yuv(p, w, h, frames=n, seed=11)
    data = p.read_bytes()
    fsz = w * h * 3 // 2
    out = []
    for i in range(n):
        off = i * fsz
        y = np.frombuffer(data[off:off + w * h], np.uint8).reshape(h, w)
        u = np.frombuffer(data[off + w * h:off + w * h + w * h // 4],
                          np.uint8).reshape(h // 2, w // 2)
        v = np.frombuffer(data[off + w * h + w * h // 4:off + fsz],
                          np.uint8).reshape(h // 2, w // 2)
        out.append(YUVFrame(y, u, v, poc=i))
    return out


@pytest.mark.parametrize("qp", [22, 30, 40])
def test_roundtrip_own_decoder(qp):
    """encode -> our decode == recon, all-intra fixed QP."""
    frames = _frames(3)
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=qp,
                        intra_period=1)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(frames)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert d.tobytes() == r.tobytes(), f"frame {i} recon != decode"


def test_quality_sane():
    frames = _frames(2)
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=27,
                        intra_period=1, psnr=1)
    enc = HevcEncoder(cfg)
    ef = enc.encode_frame(frames[0])
    y_psnr = ef.psnr[0]
    assert y_psnr > 33, f"PSNR too low: {y_psnr}"
    assert ef.bits < W * H * 8, "bitstream larger than raw"


@pytest.mark.skipif(not have_reference(), reason="no reference binaries")
def test_reference_decoder_accepts(tmp_path):
    """The shipped appdecoder must decode our stream to exactly our recon."""
    from conftest import _ref_bin
    frames = _frames(3)
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=30,
                        intra_period=1)
    bs, recons = encode_sequence(frames, cfg)
    bsf = tmp_path / "ours.265"
    bsf.write_bytes(bs)
    outf = tmp_path / "dec.yuv"
    dec = _ref_bin("appdecoder")
    r = subprocess.run([str(dec), "-b", str(bsf), "-o", str(outf),
                        "-threads", "1"], capture_output=True, text=True)
    assert r.returncode == 0, f"appdecoder failed: {r.stdout} {r.stderr}"
    got = outf.read_bytes()
    want = b"".join(rc.tobytes() for rc in recons)
    assert len(got) == len(want), f"size {len(got)} != {len(want)}"
    assert got == want, "reference decode differs from our recon"


def test_deblock_off_roundtrip():
    frames = _frames(2)
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=32,
                        intra_period=1, deblock=False)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


def test_nondivisible_dimensions():
    """Conformance-window cropping: 176x100 (not multiples of 16)."""
    frames = _frames(2, w=176, h=100)
    cfg = EncoderConfig(width=176, height=100, preset="ultrafast", qp=30,
                        intra_period=1)
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert dec[0].y.shape == (100, 176)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()
