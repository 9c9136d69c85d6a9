"""Decoder conformance vs the reference binaries (SURVEY.md section 4:
AppDecoder/AppEncoder are the oracle — our decode of an AppEncoder stream
must equal the encoder's own reconstruction bit-for-bit)."""

from pathlib import Path

import pytest

from ks265codec_tpu.decode.decoder import HevcDecoder

from conftest import CACHE

W, H = 320, 192
FSZ = W * H * 3 // 2


def _assert_bit_exact(bs: Path, rec: Path, nframes: int):
    frames = HevcDecoder().decode_all(bs.read_bytes())
    ref = rec.read_bytes()
    assert len(frames) == nframes
    for i, f in enumerate(frames):
        assert f.tobytes() == ref[i * FSZ:(i + 1) * FSZ], f"frame {i} differs"


def test_allintra_nofilter(stream_ai_nofilter):
    _assert_bit_exact(*stream_ai_nofilter, nframes=10)


def test_allintra_deblock(stream_ai_deblock):
    _assert_bit_exact(*stream_ai_deblock, nframes=10)


def test_allintra_deblock_sao(stream_ai_full):
    _assert_bit_exact(*stream_ai_full, nframes=10)


@pytest.mark.parametrize("preset,extra", [
    ("superfast", []),
    ("medium", []),
    ("veryslow", []),       # NxN partitions, TU search, RDOQ, SAO full
    ("placebo", []),
    ("medium", ["-ts", "1", "-qp", "17"]),  # transform skip
    ("medium", ["-qp", "45"]),
    ("medium", ["-sis", "0"]),
])
def test_allintra_presets(ref_codec, yuv_320x192, preset, extra):
    tag = f"ai_{preset}_{'_'.join(extra).replace('-', '')}"
    bs = CACHE / f"{tag}.265"
    rec = CACHE / f"{tag}_rec.yuv"
    if not bs.exists():
        ref_codec.encode(yuv_320x192, W, H, bs, rec, frames=5,
                         extra=["-preset", preset, "-latency", "offline",
                                "-rc", "0", "-qp", "27", "-iper", "1"] + extra)
    _assert_bit_exact(bs, rec, nframes=5)


def test_ipp_zerolatency(stream_ipp):
    """P slices: merge/AMVP/MC on an IPPP zerolatency stream."""
    _assert_bit_exact(*stream_ipp, nframes=10)


def test_hierarchical_b(stream_hierb):
    """B slices, hierarchical GOP-8, RPS reordering, TMVP."""
    _assert_bit_exact(*stream_hierb, nframes=10)


@pytest.mark.parametrize("name,extra", [
    ("ipp_medium", ["-preset", "medium", "-latency", "zerolatency"]),
    ("hierb_veryslow", ["-preset", "veryslow", "-latency", "offline"]),
    ("hierb_superfast", ["-preset", "superfast", "-latency", "offline"]),
    ("ld_bframes", ["-preset", "medium", "-latency", "livestreaming"]),
])
def test_inter_presets(ref_codec, yuv_320x192, name, extra):
    bs = CACHE / f"{name}.265"
    rec = CACHE / f"{name}_rec.yuv"
    if not bs.exists():
        ref_codec.encode(yuv_320x192, W, H, bs, rec, frames=10,
                         extra=extra + ["-rc", "0", "-qp", "30", "-iper", "64"])
    _assert_bit_exact(bs, rec, nframes=10)


def test_matches_appdecoder_md5(ref_codec, stream_ai_full):
    """Cross-check against appdecoder's own per-frame MD5 output."""
    from ks265codec_tpu.utils.md5 import frame_md5
    bs, _ = stream_ai_full
    md5_lines = ref_codec.decode(bs, CACHE / "dec_tmp.yuv")
    frames = HevcDecoder().decode_all(bs.read_bytes())
    assert len(md5_lines) == len(frames)
    for line, f in zip(md5_lines, frames):
        want = line.split("MD5 ")[1].split(",")
        assert list(frame_md5(f)) == want


def test_wpp_streams(ref_codec, yuv_320x192):
    """WPP entropy sync: per-row CABAC substreams + entry points."""
    bs = CACHE / "wpp_qp30.265"
    rec = CACHE / "wpp_qp30_rec.yuv"
    if not bs.exists():
        import subprocess
        subprocess.run(
            [str(ref_codec.enc), "-i", str(yuv_320x192), "-wdt", "320",
             "-hgt", "192", "-frms", "5", "-fr", "30", "-b", str(bs),
             "-o", str(rec), "-threads", "4", "-wpp", "1", "-fpp", "0",
             "-preset", "medium", "-latency", "offline", "-rc", "0",
             "-qp", "30", "-iper", "64"],
            check=True, capture_output=True, cwd=str(CACHE))
    _assert_bit_exact(bs, rec, nframes=5)


@pytest.mark.parametrize("name,extra", [
    ("ref4", ["-preset", "medium", "-latency", "offline", "-ref", "4"]),
    ("bf3_live", ["-preset", "fast", "-latency", "livestreaming"]),
    ("tune_game", ["-preset", "medium", "-tune", "game"]),
    ("placebo_off", ["-preset", "placebo", "-latency", "offline"]),
    ("nodf", ["-preset", "medium", "-df", "0"]),
    ("no_sis", ["-preset", "slow", "-sis", "0"]),
    ("crf", ["-preset", "medium", "-rc", "3", "-crf", "30"]),
    ("abr", ["-preset", "fast", "-rc", "2", "-br", "300"]),
])
def test_reference_matrix(ref_codec, yuv_320x192, name, extra):
    """Wider reference-encoder configuration sweep (tunes, multi-ref,
    latencies, RC modes) — all must decode bit-exactly."""
    bs = CACHE / f"mx_{name}.265"
    rec = CACHE / f"mx_{name}_rec.yuv"
    if not bs.exists():
        import subprocess
        subprocess.run(
            [str(ref_codec.enc), "-i", str(yuv_320x192), "-wdt", "320",
             "-hgt", "192", "-frms", "8", "-fr", "30", "-b", str(bs),
             "-o", str(rec), "-threads", "1", "-wpp", "0", "-fpp", "0",
             "-iper", "64"] + extra,
            check=True, capture_output=True, cwd=str(CACHE))
    _assert_bit_exact(bs, rec, nframes=8)
