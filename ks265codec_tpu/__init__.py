"""ks265codec_tpu — a TPU-native HEVC/H.265 encode+decode engine.

Brand-new implementation with the capabilities of Kingsoft's ks265codec SDK
(see SURVEY.md for the reference inventory). Compute-heavy pixel work runs as
batched JAX/Pallas kernels; bit-serial entropy coding runs on the host
(C++/Python); a Python control plane provides the QY265-shaped API, the
preset x tune x latency config system, GOP/RPS planning, DPB management and
rate control.

Reference API contract: /root/reference Android_demo/prebuilt/include/
{qy265def.h, qy265enc.h, qy265dec.h} (studied, not copied).
"""

import os as _os

# Persistent XLA compilation cache: codec kernel shapes are stable across
# runs, so caching removes the multi-second first-compile cost per process.
# Must be set before jax initializes (importing this package first suffices).
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/ks265codec_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

__version__ = "0.1.0"

# Version string mirrors the reference's `appencoder -v` format
# (SURVEY.md section 0: "libqycodec version V2.6.1.3").
VERSION_BANNER = f"ks265codec_tpu version V{__version__} (TPU-native)"
