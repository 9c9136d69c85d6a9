"""Round-5 features: open-GOP RASL leading pictures.

With -openGop, the frames displayed just before an intra-refresh
boundary code AFTER the CRA as RASL_R pictures referencing BOTH the
previous anchor and the CRA (fillRpsForCra analog, qy265enc.h:147
enOpenGop) — the compression point a closed GOP forfeits. A decoder
joining the stream AT the CRA must discard the leading pictures
(NoRaslOutputFlag, spec 8.1) and decode everything after exactly."""

import hashlib
import os
import shutil
import stat
import subprocess

import numpy as np
import pytest

from ks265codec_tpu.bitstream.nal import NalType, parse_nals
from ks265codec_tpu.decode.decoder import HevcDecoder
from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import HevcEncoder
from ks265codec_tpu.utils.yuv import YUVFrame

W, H, N = 192, 128, 13


def _clip():
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(N):
        y = np.clip(120 + 50 * np.sin((xx + 7 * t) / 23.0),
                    0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.clip(128 + 30 * np.cos(yy[::2, ::2] / 19.0),
                    0, 255).astype(np.uint8)
        out.append(YUVFrame(y, u, v, poc=t))
    return out


def _encode_open_gop():
    cfg = EncoderConfig(width=W, height=H, qp=30, preset="veryfast",
                        latency="offline", bframes=3, intra_period=6,
                        open_gop=True)
    enc = HevcEncoder(cfg)
    efs = []
    for f in _clip():
        efs.extend(enc.encode_frame(f))
    efs.extend(enc.flush())
    bs = b"".join(e.data for e in efs)
    return enc, efs, bs


def test_rasl_leading_pictures_roundtrip(tmp_path):
    enc, efs, bs = _encode_open_gop()
    types = [n.nal_type for n in parse_nals(bs)]
    assert types.count(NalType.CRA_NUT) >= 1
    assert types.count(NalType.RASL_R) >= 1
    dec = HevcDecoder().decode_all(bs)
    efs = sorted(efs, key=lambda e: e.display_idx)
    assert len(dec) == N
    for d, e in zip(dec, efs):
        assert d.tobytes() == e.recon.tobytes()
    # reference decoder conformance
    ref = "/root/reference/ubuntu_x64/appdecoder"
    if os.path.exists(ref):
        exe = tmp_path / "appdecoder"
        shutil.copy(ref, exe)
        exe.chmod(exe.stat().st_mode | stat.S_IXUSR)
        bsf = tmp_path / "rasl.265"
        bsf.write_bytes(bs)
        out = tmp_path / "dec.yuv"
        subprocess.run([str(exe), "-b", str(bsf), "-o", str(out),
                        "-threads", "1"], check=True, capture_output=True,
                       cwd=str(tmp_path))
        data = out.read_bytes()
        fsz = W * H * 3 // 2
        assert len(data) == N * fsz
        for i, e in enumerate(efs):
            assert (hashlib.md5(data[i * fsz:(i + 1) * fsz]).hexdigest()
                    == hashlib.md5(e.recon.tobytes()).hexdigest())


def test_rasl_discarded_on_cra_join():
    enc, efs, bs = _encode_open_gop()
    # cut the stream at the first CRA and prepend parameter sets
    cra_off = None
    for n in parse_nals(bs):
        if n.nal_type == NalType.CRA_NUT:
            cra_off = n.start_code_pos if hasattr(n, "start_code_pos") \
                else None
            break
    if cra_off is None:
        # locate by scanning start codes
        import re
        for m in re.finditer(b"\x00\x00\x01", bs):
            p = m.end()
            if ((bs[p] >> 1) & 0x3F) == NalType.CRA_NUT:
                cra_off = m.start()
                break
    assert cra_off is not None
    joined = enc.encode_headers() + bs[cra_off:]
    dec = HevcDecoder().decode_all(joined)
    # the full decode's tail (CRA onward, leads excluded)
    full = HevcDecoder().decode_all(bs)
    efs = sorted(efs, key=lambda e: e.display_idx)
    cra_disp = next(e.display_idx for e in efs
                    if e.slice_type == "I" and e.display_idx > 0)
    tail = full[cra_disp:]
    assert len(dec) == len(tail)
    for d, f in zip(dec, tail):
        assert d.tobytes() == f.tobytes()
