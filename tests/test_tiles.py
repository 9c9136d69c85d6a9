"""Tile support, both directions (SURVEY.md 5.7 tile scaling axis):
- encode with a uniform tile grid -> our decoder round-trips bit-exactly,
- the reference appdecoder accepts the tiled stream and produces identical
  output (conformance oracle for the tile-scan CTU walk, per-tile CABAC
  reset, entry points, and the same-tile availability rule 6.4.1).
"""

import subprocess

import numpy as np
import pytest

from ks265codec_tpu.decode.decoder import HevcDecoder
from ks265codec_tpu.encode.config import EncoderConfig, resolve_preset
from ks265codec_tpu.encode.encoder import HevcEncoder, encode_sequence
from ks265codec_tpu.utils.md5 import frame_md5

from conftest import CACHE, have_reference, make_synthetic_yuv
from test_encoder import _frames

W, H = 256, 192


def _clip(n=3):
    return _frames(n, w=W, h=H, seed=23)


def _roundtrip(cfg, frames):
    bs, recons = encode_sequence(frames, cfg)
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(recons)
    for d, r in zip(dec, sorted(recons, key=lambda x: x.poc)):
        np.testing.assert_array_equal(d.y, r.y)
        np.testing.assert_array_equal(d.u, r.u)
        np.testing.assert_array_equal(d.v, r.v)
    return bs, dec


@pytest.mark.parametrize("tiles", ["2x2", "3x1", "1x2"])
def test_tiles_allintra_roundtrip(tiles):
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=30,
                        intra_period=1, tiles=tiles)
    _roundtrip(cfg, _clip(2))


def test_tiles_config_disables_wpp():
    cfg = resolve_preset(EncoderConfig(width=W, height=H, tiles="2x2"))
    assert cfg.wpp is False
    with pytest.raises(ValueError):
        resolve_preset(EncoderConfig(width=W, height=H, tiles="0x2"))


def test_tiles_inter_roundtrip():
    cfg = EncoderConfig(width=W, height=H, preset="ultrafast", qp=31,
                        intra_period=64, bframes=0, tiles="2x2")
    _roundtrip(cfg, _clip(4))


def test_tiles_sao_roundtrip():
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=30,
                        intra_period=1, sao=4, tiles="2x2")
    _roundtrip(cfg, _clip(2))


@pytest.mark.skipif(not have_reference(), reason="no reference binaries")
def test_tiles_reference_decoder(tmp_path):
    """The shipped appdecoder is the conformance oracle for our tiled
    streams (the reference encoder itself never emits tiles)."""
    from conftest import _ref_bin
    dec = _ref_bin("appdecoder")
    for name, cfg, n in (
            ("ai", EncoderConfig(width=W, height=H, preset="ultrafast",
                                 qp=30, intra_period=1, tiles="2x2"), 2),
            ("ipp", EncoderConfig(width=W, height=H, preset="ultrafast",
                                  qp=31, intra_period=64, bframes=0,
                                  tiles="2x2"), 4),
    ):
        bs, our_dec = _roundtrip(cfg, _clip(n))
        p = tmp_path / f"tiles_{name}.265"
        p.write_bytes(bs)
        r = subprocess.run(
            [str(dec), "-b", str(p), "-o", str(tmp_path / "out.yuv"),
             "-md5", "1", "-threads", "1"],
            check=True, capture_output=True, text=True)
        lines = [l for l in r.stdout.splitlines() if "MD5" in l]
        assert len(lines) == n, r.stdout
        for line, f in zip(lines, our_dec):
            want = line.split("MD5")[1].strip().split(",")
            assert list(frame_md5(f)) == want


def test_tiles_native_writer_matches_python(monkeypatch):
    """The native whole-slice writer must produce byte-identical tiled
    slices to the Python reference writer (walk order, per-tile context
    resets, entry sizes)."""
    from ks265codec_tpu import native
    if not native.HAVE_NATIVE:
        pytest.skip("native library not built")
    import ks265codec_tpu.encode.map_writer as MW

    real = MW.write_slice_data
    checked = []

    def both(fs, syn, sps, pps, hdr, sao_params=None, threads=1):
        got_n = native.write_slice_native(fs, syn, sps, pps, hdr, sao_params)
        got_p = MW.write_slice_data_py(fs, syn, sps, pps, hdr, sao_params)
        got_mt = native.write_slice_native(fs, syn, sps, pps, hdr,
                                           sao_params, threads=4)
        assert got_n is not None
        assert got_n[0] == got_p[0]
        assert got_n[1] == got_p[1]
        # pthread tile pool must be byte-identical to the serial writer
        assert got_mt == got_n
        checked.append(1)
        return got_n

    monkeypatch.setattr(MW, "write_slice_data", both)
    cfg = EncoderConfig(width=W, height=H, preset="medium", qp=30,
                        intra_period=1, sao=4, tiles="3x2")
    _roundtrip(cfg, _clip(2))
    assert checked
