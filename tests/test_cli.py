"""CLI front-ends: appencoder/appdecoder-compatible flag surface,
-c config-file support, stat-row output format (SURVEY.md 2.5, 5.1)."""

import subprocess
import sys

import numpy as np

from ks265codec_tpu.cli.app_encoder import (build_parser, cfg_from_args,
                                            read_config_file)

W, H = 128, 64


def _write_yuv(path, n=3, seed=1):
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        for t in range(n):
            y = np.clip(110 + rng.randn(H, W) * 20, 0, 255).astype(np.uint8)
            u = np.full((H // 2, W // 2), 120, np.uint8)
            v = np.full((H // 2, W // 2), 135, np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())


def test_config_file_parsing(tmp_path):
    cf = tmp_path / "enc.cfg"
    cf.write_text("""
# comment line
qp = 35
merange : 32     # HM-style separator
rdoq = 0
""")
    a = build_parser().parse_args(
        ["-i", "x.yuv", "-b", "x.265", "-wdt", str(W), "-hgt", str(H),
         "-c", str(cf)])
    cfg = cfg_from_args(a)
    assert cfg.qp == 35 and cfg.merange == 32 and cfg.rdoq is False


def test_config_file_opts_precedence(tmp_path):
    cf = tmp_path / "enc.cfg"
    cf.write_text("qp = 35\n")
    a = build_parser().parse_args(
        ["-i", "x.yuv", "-b", "x.265", "-wdt", str(W), "-hgt", str(H),
         "-c", str(cf), "-opts", "qp=40"])
    assert cfg_from_args(a).qp == 40


def test_config_file_bad_key(tmp_path):
    cf = tmp_path / "enc.cfg"
    cf.write_text("not_a_field = 1\n")
    a = build_parser().parse_args(
        ["-i", "x.yuv", "-b", "x.265", "-wdt", str(W), "-hgt", str(H),
         "-c", str(cf)])
    try:
        cfg_from_args(a)
    except ValueError as e:
        assert "BAD_NAME" in str(e)
    else:
        raise AssertionError("bad config key accepted")


def test_encode_decode_cli_roundtrip(tmp_path):
    """End-to-end through the subprocess entry points: encode with -c,
    decode, compare recon to decode."""
    import os
    yuv = tmp_path / "in.yuv"
    _write_yuv(yuv)
    cf = tmp_path / "enc.cfg"
    cf.write_text("qp = 33\nsao = 0\n")
    bs = tmp_path / "out.265"
    rec = tmp_path / "rec.yuv"
    # subprocesses must not grab the TPU tunnel (slow remote compile):
    # KS265_PLATFORM is the package's own forced-platform env var
    env = dict(os.environ, KS265_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)          # single CPU device is fine
    r = subprocess.run(
        [sys.executable, "-m", "ks265codec_tpu.cli.app_encoder",
         "-i", str(yuv), "-b", str(bs), "-o", str(rec),
         "-wdt", str(W), "-hgt", str(H), "-frms", "3",
         "-preset", "ultrafast", "-latency", "zerolatency",
         "-c", str(cf)],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert bs.stat().st_size > 0
    dec = tmp_path / "dec.yuv"
    r2 = subprocess.run(
        [sys.executable, "-m", "ks265codec_tpu.cli.app_decoder",
         "-b", str(bs), "-o", str(dec)],
        capture_output=True, text=True, timeout=900, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert dec.read_bytes() == rec.read_bytes()
