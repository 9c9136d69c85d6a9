"""Batched cost kernels: SAD and Hadamard SATD as MXU matmuls.

TPU mapping of the reference's SAD/SATD SIMD family (sad_c, sad4blk_8x8_c,
had_c / xCalcHADs8x8 — SURVEY.md 2.2 "Pixel ops / cost"). The batch axis
carries "all candidate blocks of a wavefront / search grid" so the MXU and
VPU stay saturated instead of looping per block like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


# numpy, not jnp: module-level jnp constants get captured as committed
# device buffers and poison the axon tunnel's dispatch path process-wide
# (see ops/transforms.py)
_H4 = np.asarray(_hadamard(4), np.int32)
_H8 = np.asarray(_hadamard(8), np.int32)


@jax.jit
def sad(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum of absolute differences over trailing 2 dims: (..., h, w) -> (...)."""
    return jnp.sum(jnp.abs(a - b), axis=(-2, -1))


@jax.jit
def satd4(a: jax.Array, b: jax.Array) -> jax.Array:
    """4x4 Hadamard SATD per block, HM normalization ((sum+1)>>1).

    f32 matmuls; on CPU these are exact (|d| <= 2^15, sums < 2^24). On
    TPU at DEFAULT matmul precision the MXU truncates inputs to bf16, so
    SATD is approximate (~0.4% relative): acceptable — SATD only ranks
    candidates (decision drift, never conformance), and the 1-pass bf16
    matmul is 6x the throughput of the exact tier. Conformance-critical
    matmuls instead use 8-bit limb splits (ops/wavefront._mm_*, ops/mc)
    that are bit-exact at DEFAULT precision."""
    d = (a - b).astype(jnp.float32)
    t = _H4.astype(jnp.float32) @ d @ _H4.astype(jnp.float32)
    s = jnp.sum(jnp.abs(t), axis=(-2, -1)).astype(jnp.int32)
    return (s + 1) >> 1


@jax.jit
def satd8(a: jax.Array, b: jax.Array) -> jax.Array:
    """8x8 Hadamard SATD per block, HM normalization ((sum+2)>>2)."""
    d = (a - b).astype(jnp.float32)
    t = _H8.astype(jnp.float32) @ d @ _H8.astype(jnp.float32)
    s = jnp.sum(jnp.abs(t), axis=(-2, -1)).astype(jnp.int32)
    return (s + 2) >> 2


@partial(jax.jit, static_argnames=("block",))
def satd(a: jax.Array, b: jax.Array, block: int = 8) -> jax.Array:
    """SATD of (..., h, w) via tiling into 4x4 or 8x8 Hadamard blocks."""
    a, b = jnp.broadcast_arrays(a, b)
    h, w = a.shape[-2], a.shape[-1]
    bs = 4 if (block == 4 or h < 8 or w < 8) else 8
    lead = a.shape[:-2]
    ar = a.reshape(*lead, h // bs, bs, w // bs, bs).swapaxes(-3, -2)
    br = b.reshape(*lead, h // bs, bs, w // bs, bs).swapaxes(-3, -2)
    per = satd4(ar, br) if bs == 4 else satd8(ar, br)
    return jnp.sum(per, axis=(-2, -1))


@jax.jit
def sse(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum of squared errors (RDO distortion) over trailing 2 dims."""
    d = (a - b).astype(jnp.int32)   # |d| <= 2^15 → d*d < 2^30; sums in int32
    return jnp.sum(d * d, axis=(-2, -1))
