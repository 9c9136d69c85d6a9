"""Lookahead / pre-analysis host orchestration (EncPreAnalyze analog:
CInputPicManage + scenecut + calcFrameAdaptQuant, SURVEY.md 2.3).

Per pushed frame, one device pass (ops/lookahead.frame_features) yields
per-8x8-half-res-block intra cost, inter cost and variance. From those:

- frame cost: sum(min(icost, pcost)) — fed to rate control BEFORE the
  frame is coded (the reference's rateEstimateQscale input; previously RC
  extrapolated from the previous frame of the same type, i.e. was blind)
- scene-cut detection (x264 rule shape): a frame whose inter cost is no
  better than bias * intra cost starts a new scene -> force an IDR
- adaptive-quant offsets (aq_mode 1): per-CTU QP deltas from log2 block
  energy relative to the frame average (strength-scaled, clamped) —
  consumed once cu_qp_delta writing is enabled
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

SCENECUT_BIAS = 0.85      # cut when pcost >= bias * icost (inter useless)
SCENECUT_MIN_GAP = 2      # frames; avoids IDR storms on flashes


@dataclass
class FrameAnalysis:
    display_idx: int
    icost: float            # summed intra cost (half-res SAD units)
    pcost: float            # summed inter cost vs previous frame
    cost: float             # min-combined frame cost for RC
    scenecut: bool
    dqp_ctu: np.ndarray | None    # (cty, ctx) int8 AQ offsets or None


class Lookahead:
    """Feed frames in display order; read analyses keyed by display idx."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.prev_half = None
        self.analyses: dict[int, FrameAnalysis] = {}
        self._last_cut = -(1 << 30)
        self._pending: list[tuple[int, object]] = []   # (idx, device half)
        self._first_done = False

    def push(self, display_idx: int, y: np.ndarray) -> None:
        """Buffer the frame (downsample stays on device). Features are
        computed lazily in ONE batched dispatch when analyses are read —
        per-frame dispatch/fetch round-trips dominated the cost."""
        import jax.numpy as jnp

        from ..ops.lookahead import downsample2x
        h, w = y.shape
        # pad to a 16-multiple so the half plane blocks evenly
        ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        if (ph, pw) != (h, w):
            yp = np.empty((ph, pw), np.uint8)
            yp[:h, :w] = y
            yp[h:, :w] = y[h - 1:]
            yp[:, w:] = yp[:, w - 1:w]
            y = yp
        self._pending.append((display_idx, downsample2x(jnp.asarray(y))))

    def ensure(self) -> None:
        """Run the batched feature pass over every buffered frame."""
        if not self._pending:
            return
        import jax
        import jax.numpy as jnp

        from ..ops.lookahead import (frame_features_batch,
                                     frame_features_first)
        want_var = bool(self.cfg.aq_mode)
        idxs = [i for i, _ in self._pending]
        halves = [h for _, h in self._pending]
        prevs = ([self.prev_half] if self.prev_half is not None
                 else [halves[0]]) + halves[:-1]
        packed = np.array(frame_features_batch(
            jnp.stack(halves), jnp.stack(prevs), want_var))
        if not self._first_done:
            # recompute frame 0 without an inter reference
            packed0 = np.asarray(frame_features_first(halves[0], want_var))
            packed[0] = packed0
        self.prev_half = halves[-1]
        self._pending.clear()
        for k, di in enumerate(idxs):
            first = not self._first_done
            row = packed[k].astype(np.float64)
            icost = float(row[0])
            pcost = float(row[1]) if not first else icost
            cost = float(row[2]) if not first else icost
            var = None
            if want_var:
                hh, hw = self.prev_half.shape
                var = row[3:].reshape(hh // 8, hw // 8)
            cut = False
            if not first and di - self._last_cut >= SCENECUT_MIN_GAP:
                cut = pcost >= SCENECUT_BIAS * max(icost, 1.0) \
                    and pcost > 1.5 * self._typical_pcost()
            if cut or first:
                self._last_cut = di
            dqp = self._aq_offsets(var) if want_var else None
            fa = FrameAnalysis(di, icost, pcost, cost, cut, dqp)
            self.analyses[di] = fa
            if len(self.analyses) > 256:
                self.analyses.pop(min(self.analyses), None)
            self._pcosts = getattr(self, "_pcosts", [])
            if not first:
                self._pcosts.append(pcost)
                if len(self._pcosts) > 32:
                    self._pcosts.pop(0)
            self._first_done = True

    def get(self, display_idx: int):
        self.ensure()
        return self.analyses.get(display_idx)

    def _typical_pcost(self) -> float:
        pc = getattr(self, "_pcosts", [])
        return float(np.median(pc)) if pc else 0.0

    def _aq_offsets(self, var: np.ndarray) -> np.ndarray:
        """aq_mode 1: CTU-granular dQP from relative block energy
        (calcFrameAdaptQuant analog; x264 AQ shape). var is per-8x8 block
        of the HALF plane -> a CTU (64 luma) covers 4x4 blocks."""
        strength = 1.0 * float(self.cfg.aq_strength)
        e = np.log2(1.0 + var)
        cty, ctx = e.shape[0] // 4, e.shape[1] // 4
        ectu = e[:cty * 4, :ctx * 4].reshape(cty, 4, ctx, 4).mean((1, 3))
        dqp = -strength * 1.5 * (ectu - ectu.mean())
        return np.clip(np.round(dqp), -6, 6).astype(np.int8)

    def pop(self, display_idx: int) -> FrameAnalysis | None:
        return self.analyses.pop(display_idx, None)
