"""Device kernels (JAX/XLA/Pallas). Importing this package configures the
persistent XLA compilation cache — codec kernel shapes are stable across
runs, so caching removes the first-compile latency per process."""

import os as _os

import jax as _jax

_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/ks265codec_tpu_xla"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:                       # pragma: no cover - older jax
    pass
