"""Batched HEVC transforms + quantization as XLA/MXU integer matmuls.

The 2-D DCT/DST factorizes as T @ X @ T^t — on TPU this is two MXU matmuls
over a batch of TUs of one size class, the idiomatic mapping of the
reference's per-TU SIMD kernels (H265_2dDct*_c / H265_2dIDct*_c,
H265Quant*_c / H265DeQuantBlock_c — SURVEY.md 2.2 "Transforms",
"Quant/dequant"). All arithmetic is bit-exact integer (int32 accumulators
are sufficient: |coeff| < 2^15, |T| <= 90, n <= 32 → |acc| < 2^27).

Property-tested against the scalar NumPy oracle in decode/recon.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hevc.tables import DCT, DST4, LEVEL_SCALE, QUANT_SCALE

# NUMPY, never jnp: a module-level jnp constant becomes a COMMITTED
# device buffer captured by every traced graph that touches it, and on
# the axon TPU tunnel ONE such capture permanently degrades the whole
# process's dispatch path (measured: every later dispatch 30-1700x
# slower — this was the round-4 all-intra regression). numpy constants
# lower to plain HLO literals. Convert with jnp.asarray() INSIDE a trace
# when a tracer-index gather is needed; that is safe.
_T = {n: np.asarray(DCT[n], np.int32) for n in (4, 8, 16, 32)}
_TDST = np.asarray(DST4, np.int32)
_LEVEL_SCALE = np.asarray(LEVEL_SCALE, np.int32)
_QUANT_SCALE = np.asarray(QUANT_SCALE, np.int32)


def _mat(log2: int, is_dst: bool) -> jnp.ndarray:
    return _TDST if is_dst else _T[1 << log2]


def _clip16(x):
    return jnp.clip(x, -32768, 32767)


@partial(jax.jit, static_argnames=("log2", "is_dst", "bd"))
def inverse_transform(coeffs: jax.Array, log2: int, is_dst: bool = False,
                      bd: int = 8) -> jax.Array:
    """Spec 8.6.4.2 two-stage inverse transform over a batch.

    coeffs: (N, n, n) int32 → residual (N, n, n) int32.
    """
    t = _mat(log2, is_dst)
    e = (t.T @ coeffs + 64) >> 7
    e = _clip16(e)
    shift2 = 20 - bd
    r = (e @ t + (1 << (shift2 - 1))) >> shift2
    return _clip16(r)


@partial(jax.jit, static_argnames=("log2", "is_dst", "bd"))
def forward_transform(resi: jax.Array, log2: int, is_dst: bool = False,
                      bd: int = 8) -> jax.Array:
    """Encoder forward transform (HM staged shifts) over a batch (N, n, n)."""
    t = _mat(log2, is_dst)
    shift1 = log2 + bd - 9
    shift2 = log2 + 6
    e = t @ resi
    if shift1 > 0:
        e = (e + (1 << (shift1 - 1))) >> shift1
    c = (e @ t.T + (1 << (shift2 - 1))) >> shift2
    return c.astype(jnp.int32)


@partial(jax.jit, static_argnames=("log2", "bd", "intra"))
def quantize(coeffs: jax.Array, qp: jax.Array, log2: int,
             bd: int = 8, intra: bool = True) -> jax.Array:
    """Forward scalar quantization, batch (N, n, n), qp (N,) or scalar.

    q = sign(c) * ((|c| * quantScale[qp%6] + rnd) >> qbits), qbits =
    29 + qp/6 - bd - log2; rnd = (171 intra / 85 inter) << (qbits - 9)
    (HM lineage). Uses int64 to keep the product exact.
    """
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 29 + qp // 6 - bd - log2
    scale = jnp.asarray(_QUANT_SCALE)[qp % 6]
    # all-int32: |coeff| < 2^15, scale < 2^15, rnd < 2^26 → sum < 2^31
    rnd = jnp.int32(171 if intra else 85) << (qbits - 9)
    a = jnp.abs(coeffs)
    q = (a * scale + rnd) >> qbits
    q = jnp.clip(q, 0, 32767)
    return jnp.where(coeffs < 0, -q, q)


@partial(jax.jit, static_argnames=("log2", "bd"))
def dequantize(levels: jax.Array, qp: jax.Array, log2: int,
               bd: int = 8) -> jax.Array:
    """Spec 8.6.3 dequant (flat scaling matrix m=16), batch (N, n, n)."""
    qp = jnp.asarray(qp, jnp.int32)
    s = bd + log2 - 5
    p = qp // 6
    # int32-exact re-association of ((lv*16*ls) << p + 2^(s-1)) >> s:
    # t = lv * (16*ls[qp%6]) fits int32 (< 2^26); then shift by (s-p) with
    # the matching rounding term, or left-shift when p >= s.
    t = levels * (16 * jnp.asarray(_LEVEL_SCALE)[qp % 6])
    sp = jnp.maximum(s - p, 0)
    ps = jnp.maximum(p - s, 0)
    rnd = jnp.where(s - p >= 1, jnp.int32(1) << jnp.maximum(s - p - 1, 0), 0)
    d = ((t + rnd) >> sp) << ps
    return _clip16(d).astype(jnp.int32)


def inverse_transform_np(coeffs: np.ndarray, log2: int, is_dst: bool = False,
                         bd: int = 8) -> np.ndarray:
    """Host bridge for the decoder: batch (N,n,n) numpy → numpy."""
    return np.asarray(inverse_transform(jnp.asarray(coeffs, jnp.int32),
                                        log2, is_dst, bd))
