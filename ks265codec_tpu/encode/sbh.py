"""Sign-bit-hiding (encoder side): per-4x4 coefficient group, when the
scan distance between the first and last nonzero coefficient exceeds 3 the
sign of the first-in-scan-order coefficient is not coded — the decoder
infers it from the parity of the absolute-level sum (spec 7.4.9.11 /
HM signBitHidingHDQ, SURVEY.md 2.2 "Quant/dequant"). The encoder must
therefore force that parity by +/-1 on the hidden coefficient.

Two implementations sharing the exact same rule: numpy (sequential compute
path) and jnp (wavefront device pass) — equivalence is covered by the
wavefront-vs-sequential A/B test; bitstream legality by the appdecoder
conformance tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..hevc.cabac_tables import SCAN_4x4

# rank[s][y, x] = index of (x, y) in scan order s. Kept as a NUMPY constant
# on purpose: this module may first be imported inside an active jax trace
# (lazy import in the wavefront pass), and a module-level jnp array created
# there would capture the trace context (UnexpectedTracerError on reuse).
_RANK = np.zeros((3, 4, 4), np.int32)
for _s in range(3):
    for _r, (_x, _y) in enumerate(SCAN_4x4[_s]):
        _RANK[_s, _y, _x] = _r


def scan_for(log2: int, c_idx: int, intra_mode) -> int:
    """scan_idx for a TU (mirror of the residual writer/parser rule)."""
    if intra_mode is not None and (log2 == 2 or (log2 == 3 and c_idx == 0)):
        if 6 <= intra_mode <= 14:
            return 2
        if 22 <= intra_mode <= 30:
            return 1
    return 0


def apply_sbh_np(lev: np.ndarray, scan_idx: int) -> np.ndarray:
    """Adjust one TU's levels (n, n) in place-compatible copy."""
    n = lev.shape[0]
    g = lev.reshape(n // 4, 4, n // 4, 4).transpose(0, 2, 1, 3)  # (gy,gx,4,4)
    rank = _RANK[scan_idx]
    nz = g != 0
    any_nz = nz.any(axis=(2, 3))
    rk = np.where(nz, rank[None, None], 99)
    mn = rk.min(axis=(2, 3))
    rk2 = np.where(nz, rank[None, None], -1)
    mx = rk2.max(axis=(2, 3))
    cond = any_nz & (mx - mn > 3)
    parity = (np.abs(g).sum(axis=(2, 3)) & 1).astype(np.int32)
    # hidden coefficient = the one whose rank equals mn
    hid_mask = nz & (rank[None, None] == mn[:, :, None, None])
    hid_val = (g * hid_mask).sum(axis=(2, 3))       # unique per group
    want = (hid_val < 0).astype(np.int32)
    fix = cond & (parity != want)
    # |c| > 1 -> toward zero, else away from zero (stays nonzero, parity flips)
    sign = np.sign(hid_val)
    delta = np.where(np.abs(hid_val) > 1, -sign, sign)
    adj = g + np.where((fix[:, :, None, None] & hid_mask), 1, 0) \
        * delta[:, :, None, None]
    return adj.transpose(0, 2, 1, 3).reshape(n, n)


def apply_sbh_jnp(lev, scan_sel, n: int):
    """Batched jnp version: lev (K, n, n), scan_sel (K,) int32."""
    K = lev.shape[0]
    g = lev.reshape(K, n // 4, 4, n // 4, 4).transpose(0, 1, 3, 2, 4)
    rank = jnp.asarray(_RANK)[scan_sel][:, None, None]   # (K,1,1,4,4)
    nz = g != 0
    any_nz = nz.any(axis=(3, 4))
    rk = jnp.where(nz, rank, 99)
    mn = rk.min(axis=(3, 4))
    rk2 = jnp.where(nz, rank, -1)
    mx = rk2.max(axis=(3, 4))
    cond = any_nz & (mx - mn > 3)
    parity = (jnp.abs(g).sum(axis=(3, 4)) & 1).astype(jnp.int32)
    hid_mask = nz & (rank == mn[:, :, :, None, None])
    hid_val = (g * hid_mask).sum(axis=(3, 4))
    want = (hid_val < 0).astype(jnp.int32)
    fix = cond & (parity != want)
    sign = jnp.sign(hid_val)
    delta = jnp.where(jnp.abs(hid_val) > 1, -sign, sign)
    adj = g + jnp.where(fix[:, :, :, None, None] & hid_mask,
                        delta[:, :, :, None, None], 0)
    return adj.transpose(0, 1, 3, 2, 4).reshape(K, n, n)
