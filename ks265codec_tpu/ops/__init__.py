"""Device kernels (JAX/XLA/Pallas). Importing this package configures the
persistent XLA compilation cache — codec kernel shapes are stable across
runs, so caching removes the first-compile latency per process."""

import hashlib as _hashlib
import os as _os

import jax as _jax

# KS265_PLATFORM=cpu|tpu forces the JAX platform. This must be OUR env
# var: the axon TPU-tunnel plugin claims every process and jax's own
# JAX_PLATFORMS env var is ignored by this build — only a
# jax.config.update before first backend use works. CLI subprocesses in
# tests (and users without a TPU) need the CPU path.
_plat_env = _os.environ.get("KS265_PLATFORM")
if _plat_env:
    try:
        _jax.config.update("jax_platforms", _plat_env)
    except Exception:                   # pragma: no cover
        pass

# Matmul precision contract. The TPU MXU's default precision truncates
# f32 inputs to bf16, which is EXACT for integers with <= 8 significant
# bits (|v| <= 256, or any 8-bit limb) and accumulates in f32 (exact
# below 2^24). Every conformance-critical matmul in this package is
# therefore written so each operand is bf16-exact — 8-bit limb splits
# for wide integers (ops/wavefront._mm_lhs/_mm_rhs, ops/mc stage 2),
# one-hot selects, filter/DCT matrices (coeffs <= 90) — and runs at the
# fast 1-pass DEFAULT tier. Decision-only matmuls (SATD in ops/cost) are
# allowed to be approximate on TPU: they rank candidates, never feed the
# bitstream. Round 4 instead forced "highest" globally (6 bf16 passes
# per matmul) which cost ~40% of all-intra throughput; the per-site
# exactness audit replaced it. RULE for new code: any matmul whose
# output feeds reconstruction or syntax must keep every operand within
# bf16's 8-bit-exact integer range (split limbs if not) — do NOT rely
# on the global precision default.
try:
    _jax.config.update("jax_default_matmul_precision", "default")
except Exception:                       # pragma: no cover
    pass

# The cache directory is keyed by (platform, host CPU fingerprint): the
# repo (and ~/.cache) persists across container hosts, and CPU AOT
# artifacts embed the compiling host's machine features (AMX,
# prefer-no-scatter, ...). Loading an artifact produced on a different
# host raises cpu_aot_loader warnings and can SIGILL/SEGV mid-run
# (observed as random full-suite crashes). Fingerprinting the flags line
# of /proc/cpuinfo keeps each host's artifacts in its own universe while
# preserving warm-cache startup on the same host.
try:
    _platform = str(_jax.config.jax_platforms or "auto")
except Exception:                       # pragma: no cover
    _platform = "auto"


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return _hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:                     # pragma: no cover - non-Linux
        pass
    return "nofp"


_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/ks265codec_tpu_xla_%s_%s"
                        % (_platform.replace(",", "_"),
                           _host_fingerprint())))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:                       # pragma: no cover - older jax
    pass
