"""Test config: force JAX onto a virtual 8-device CPU mesh (no TPU needed),
and provide fixtures that build oracle bitstreams with the reference binaries
(/root/reference/ubuntu_x64/app{encoder,decoder} run in this container and
are the conformance oracle — SURVEY.md section 4)."""

import os

# XLA_FLAGS must be in the env before backend init; the platform choice and
# cache dir must go through jax.config (this jax build IGNORES the
# JAX_PLATFORMS / JAX_COMPILATION_CACHE_DIR env vars — the axon TPU-tunnel
# plugin would otherwise claim every test process).
import hashlib as _hashlib


def _host_fp() -> str:
    # /tmp (and this cache) can outlive the container HOST: CPU AOT
    # artifacts embed machine features of the compiling host and SEGV
    # when deserialized on a different one (observed mid-suite). Key the
    # cache dir by the cpuinfo flags line so each host gets its own.
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return _hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:  # pragma: no cover - non-Linux
        pass
    return "nofp"


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_" + _host_fp())

# The full suite compiles hundreds of XLA CPU executables in ONE process;
# each contributes hundreds of vm mappings, crossing the kernel default
# vm.max_map_count=65530 around suite position ~95% — at which point any
# mmap inside XLA (compile, (de)serialize, buffer alloc) fails and the
# process aborts/SEGVs with no Python-visible error. Raise the limit
# (we run as root in the container; harmless if already higher).
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1048576:
            _f.seek(0)
            _f.write("1048576")
except OSError:  # pragma: no cover - non-root / non-Linux
    pass
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import hashlib
import shutil
import stat
import subprocess
from pathlib import Path

import numpy as np
import pytest

REF_DIR = Path("/root/reference/ubuntu_x64")
CACHE = Path("/tmp/ks265_test_assets")


def _ref_bin(name: str) -> Path:
    """Copy a reference binary to a writable dir and chmod +x (the reference
    mount is read-only and not executable)."""
    CACHE.mkdir(parents=True, exist_ok=True)
    dst = CACHE / name
    if not dst.exists():
        shutil.copy(REF_DIR / name, dst)
        dst.chmod(dst.stat().st_mode | stat.S_IXUSR)
    return dst


def have_reference() -> bool:
    return (REF_DIR / "appencoder").exists()


requires_reference = pytest.mark.skipif(
    not have_reference(), reason="reference binaries not available")


def make_synthetic_yuv(path: Path, width=320, height=192, frames=10, seed=42):
    """Deterministic synthetic clip: gradients + moving box + light noise."""
    rng = np.random.RandomState(seed)
    out = []
    for t in range(frames):
        yy, xx = np.mgrid[0:height, 0:width]
        y = 128 + 60 * np.sin((xx + 3 * t) / 23.0) + 40 * np.cos((yy - 2 * t) / 17.0)
        bx, by = 40 + 6 * t, 30 + 4 * t
        y[by:by + 40, bx:bx + 40] = 220 - 3 * t
        y = y + rng.randn(height, width) * 3
        u = 128 + 30 * np.sin((xx[::2, ::2] + t) / 31.0)
        v = 128 + 30 * np.cos((yy[::2, ::2] - t) / 29.0)
        for p in (np.clip(y, 0, 255), np.clip(u, 0, 255), np.clip(v, 0, 255)):
            out.append(p.astype(np.uint8).tobytes())
    path.write_bytes(b"".join(out))


class RefCodec:
    """Drives the reference appencoder/appdecoder as test oracles."""

    def __init__(self):
        self.enc = _ref_bin("appencoder")
        self.dec = _ref_bin("appdecoder")

    def encode(self, yuv: Path, w: int, h: int, out265: Path, rec: Path | None = None,
               frames=10, extra: list[str] = ()):  # noqa: B006
        cmd = [str(self.enc), "-i", str(yuv), "-wdt", str(w), "-hgt", str(h),
               "-frms", str(frames), "-fr", "30", "-b", str(out265),
               "-threads", "1", "-wpp", "0", "-fpp", "0"] + list(extra)
        if rec is not None:
            cmd += ["-o", str(rec)]
        subprocess.run(cmd, check=True, capture_output=True, cwd=str(CACHE))
        return out265

    def decode(self, bs: Path, out_yuv: Path) -> list[str]:
        """Decode; returns the per-frame MD5 lines (y,u,v hex per POC)."""
        r = subprocess.run([str(self.dec), "-b", str(bs), "-o", str(out_yuv),
                            "-md5", "1", "-threads", "1"],
                           check=True, capture_output=True, text=True, cwd=str(CACHE))
        return [l.strip() for l in r.stdout.splitlines() if l.startswith("POC")]


@pytest.fixture(scope="session")
def ref_codec():
    if not have_reference():
        pytest.skip("reference binaries not available")
    return RefCodec()


@pytest.fixture(scope="session")
def yuv_320x192(tmp_path_factory) -> Path:
    CACHE.mkdir(parents=True, exist_ok=True)
    p = CACHE / "in_320x192.yuv"
    if not p.exists():
        make_synthetic_yuv(p)
    return p


def _stream_fixture(ref_codec, yuv, name, extra, frames=10):
    bs = CACHE / f"{name}.265"
    rec = CACHE / f"{name}_rec.yuv"
    if not bs.exists():
        ref_codec.encode(yuv, 320, 192, bs, rec, frames=frames, extra=extra)
    return bs, rec


@pytest.fixture(scope="session")
def stream_ai_nofilter(ref_codec, yuv_320x192):
    """All-intra, fixed QP, deblock OFF, SAO OFF — simplest conformance rung."""
    return _stream_fixture(ref_codec, yuv_320x192, "ai_qp30_nodf_nosao",
                           ["-preset", "ultrafast", "-latency", "offline",
                            "-rc", "0", "-qp", "30", "-iper", "1",
                            "-df", "0", "-sao", "0"])


@pytest.fixture(scope="session")
def stream_ai_deblock(ref_codec, yuv_320x192):
    """All-intra with deblocking on, SAO off."""
    return _stream_fixture(ref_codec, yuv_320x192, "ai_qp30_df_nosao",
                           ["-preset", "ultrafast", "-latency", "offline",
                            "-rc", "0", "-qp", "30", "-iper", "1",
                            "-df", "1", "-sao", "0"])


@pytest.fixture(scope="session")
def stream_ai_full(ref_codec, yuv_320x192):
    """All-intra, deblock + SAO (ultrafast ladder = sao superfast)."""
    return _stream_fixture(ref_codec, yuv_320x192, "ai_qp30_full",
                           ["-preset", "ultrafast", "-latency", "offline",
                            "-rc", "0", "-qp", "30", "-iper", "1"])


@pytest.fixture(scope="session")
def stream_ipp(ref_codec, yuv_320x192):
    """Zerolatency IPPP inter stream (no reordering)."""
    return _stream_fixture(ref_codec, yuv_320x192, "ipp_qp30",
                           ["-preset", "ultrafast", "-latency", "zerolatency",
                            "-rc", "0", "-qp", "30", "-iper", "128"])


@pytest.fixture(scope="session")
def stream_hierb(ref_codec, yuv_320x192):
    """Offline hierarchical-B GOP-8 stream (full reordering/RPS exercise)."""
    return _stream_fixture(ref_codec, yuv_320x192, "hierb_qp30",
                           ["-preset", "medium", "-latency", "offline",
                            "-rc", "0", "-qp", "30", "-iper", "128"])


def md5_planes_of_yuv(path: Path, w: int, h: int):
    """Per-frame (y,u,v) md5 of a raw I420 file."""
    fsz = w * h * 3 // 2
    data = path.read_bytes()
    out = []
    for off in range(0, len(data) - fsz + 1, fsz):
        y = data[off:off + w * h]
        u = data[off + w * h:off + w * h + w * h // 4]
        v = data[off + w * h + w * h // 4:off + fsz]
        out.append(tuple(hashlib.md5(p).hexdigest() for p in (y, u, v)))
    return out
