"""All-intra frame encoder.

TPU-first structure (SURVEY.md 7.1/7.3#2-3): the expensive mode search runs
as ONE batched jitted pass over every block of the frame (all 35 modes x all
blocks on the MXU/VPU — predict_all_modes + SATD), using source-pixel
references so there is no wavefront dependency. The sequential host pass
then codes the chosen structure with true reconstruction references
(normative), CABAC-writing each CU — bit-serial work the device can't do.
This mirrors the reference's fast-preset "decide on CtuCache originals,
code once" design (EncIntraMD decideBestLumaModeBySadFast) rather than its
per-PU recursive RDO.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..decode.recon import intra_filter_refs, intra_predict, reconstruct
from ..decode.slice_dec import FrameState
from ..hevc.tables import chroma_qp
from ..ops import cost as jcost
from ..ops import intra as jintra
from ..ops import transforms as jt
from .sbac import CtuSyntaxWriter

# per-CU header bit estimate by size (split flags, part/mode/cbf syntax)
# used only for the split decision bias — small CUs pay more per pixel
_HDR_BITS = {8: 14.0, 16: 8.0, 32: 6.0}


def _build_source_refs(plane: np.ndarray, n: int, bd: int = 8):
    """Vectorized reference construction from SOURCE pixels for every n x n
    block of the (padded) plane. Availability is raster-causal (left/top
    inside the picture). Returns (nby, nbx, 4n+1) int32."""
    h, w = plane.shape
    nby, nbx = h // n, w // n
    L = 4 * n + 1
    refs = np.empty((nby, nbx, L), np.int32)
    mid = 1 << (bd - 1)
    p = plane.astype(np.int32)
    for by in range(nby):
        y0 = by * n
        for bx in range(nbx):
            x0 = bx * n
            # left column (top->bottom, 2n entries, clamped at bottom)
            if x0 > 0:
                ys = np.minimum(np.arange(y0, y0 + 2 * n), h - 1)
                left = p[ys, x0 - 1]
                corner = p[y0 - 1, x0 - 1] if y0 > 0 else left[0]
            else:
                left = None
            if y0 > 0:
                xs = np.minimum(np.arange(x0, x0 + 2 * n), w - 1)
                top = p[y0 - 1, xs]
                if x0 == 0:
                    corner = top[0]
            else:
                top = None
            if left is None and top is None:
                refs[by, bx] = mid
                continue
            if left is None:
                left = np.full(2 * n, top[0], np.int32)
                corner = top[0]
            if top is None:
                top = np.full(2 * n, left[0], np.int32)
                corner = left[0]
            refs[by, bx, :2 * n] = left
            refs[by, bx, 2 * n] = corner
            refs[by, bx, 2 * n + 1:] = top
    return refs


def _filter_refs_batch(refs: np.ndarray, n: int) -> np.ndarray:
    """[1 2 1] smoothing of the bottom-left..top-right contour, batched."""
    if n == 4:
        return refs
    nb = refs.shape[0]
    n2 = 2 * n
    # contour order: left reversed, corner, top
    ext = np.concatenate([refs[:, :n2][:, ::-1], refs[:, n2:n2 + 1],
                          refs[:, n2 + 1:]], axis=1)
    sm = ext.copy()
    sm[:, 1:-1] = (ext[:, :-2] + 2 * ext[:, 1:-1] + ext[:, 2:] + 2) >> 2
    out = np.concatenate([sm[:, :n2][:, ::-1], sm[:, n2:n2 + 1],
                          sm[:, n2 + 1:]], axis=1)
    return out


def _mode_costs(refs_u, refs_f, src_blocks, n, lam_bits):
    """Batched: best mode + cost per block. src_blocks (N, n, n).

    Two separate jit dispatches (predict, then SATD): fusing them into one
    jit triggers a pathologically slow XLA emitter for the gather+matmul
    combination at small block sizes."""
    preds = jintra.predict_all_modes(refs_u, refs_f, n, True)   # (N,35,n,n)
    costs = jcost.satd(preds, src_blocks[:, None], 8)           # (N,35)
    best = jnp.argmin(costs, axis=1)
    return best, jnp.min(costs, axis=1) + lam_bits


def decide_frame(src_y: np.ndarray, qp: int):
    """Batched decision: per-32x32 block, split into 16s or not; modes for
    both options. Returns (split32 (nby32,nbx32) bool, mode16, mode32)."""
    lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
    lam_satd = float(np.sqrt(lam))
    out = {}
    for n in (8, 16, 32):
        refs = _build_source_refs(src_y, n)
        nby, nbx, L = refs.shape
        refs_u = refs.reshape(-1, L)
        refs_f = _filter_refs_batch(refs_u, n)
        h, w = src_y.shape
        blocks = (src_y.astype(np.int32)
                  .reshape(h // n, n, w // n, n).swapaxes(1, 2)
                  .reshape(-1, n, n))
        best, cost = _mode_costs(jnp.asarray(refs_u), jnp.asarray(refs_f),
                                 jnp.asarray(blocks), n,
                                 lam_satd * _HDR_BITS[n])
        out[n] = (np.asarray(best).reshape(nby, nbx),
                  np.asarray(cost).reshape(nby, nbx))
    mode8, cost8 = out[8]
    mode16, cost16 = out[16]
    mode32, cost32 = out[32]
    c8sum = (cost8.reshape(cost8.shape[0] // 2, 2,
                           cost8.shape[1] // 2, 2).sum(axis=(1, 3)))
    split16 = c8sum < cost16
    best16 = np.minimum(c8sum, cost16)
    c16sum = (best16.reshape(best16.shape[0] // 2, 2,
                             best16.shape[1] // 2, 2).sum(axis=(1, 3)))
    split32 = c16sum < cost32
    frame_cplx = float(np.minimum(c16sum, cost32).sum())
    return (split32, mode16, mode32, frame_cplx, split16, mode8)


class IntraFrameEncoder:
    """Codes one all-intra frame (single slice) into CABAC slice data and
    reconstructs into a FrameState (shared with the decoder's filters)."""

    def __init__(self, fs: FrameState, sps, pps, hdr, src_y, src_cb, src_cr,
                 qp: int):
        self.fs = fs
        self.sps = sps
        self.pps = pps
        self.hdr = hdr
        self.qp = qp
        self.qp_cb = chroma_qp(qp + pps.cb_qp_offset + hdr.cb_qp_offset)
        self.qp_cr = chroma_qp(qp + pps.cr_qp_offset + hdr.cr_qp_offset)
        # pad source to the CTU grid by edge replication
        self.src_y = self._pad(src_y, fs.ph, fs.pw)
        self.src_cb = self._pad(src_cb, fs.ph // 2, fs.pw // 2)
        self.src_cr = self._pad(src_cr, fs.ph // 2, fs.pw // 2)
        self.w = CtuSyntaxWriter(fs, sps, pps, hdr)
        self.sao_params = None        # set for SAO pass-2 re-encode
        self._skip_pre = False

    @staticmethod
    def _pad(plane, ph, pw):
        h, w = plane.shape
        out = np.empty((ph, pw), np.int32)
        out[:h, :w] = plane
        out[h:, :w] = plane[h - 1:h, :]
        out[:h, w:] = plane[:, w - 1:w]
        out[h:, w:] = plane[h - 1, w - 1]
        return out

    @property
    def _sao_off(self):
        """All-off SAO grid for the throwaway pass-1 syntax."""
        if getattr(self, "_sao_off_grid", None) is None:
            from ..decode.slice_dec import SaoCtuParam
            sps = self.sps
            self._sao_off_grid = [
                [SaoCtuParam() for _ in range(sps.pic_width_in_ctbs)]
                for _ in range(sps.pic_height_in_ctbs)]
        return self._sao_off_grid

    def _pre_analyze(self) -> None:
        (self.split32, self.mode16, self.mode32, self.frame_cplx,
         self.split16, self.mode8) = decide_frame(self.src_y, self.qp)

    def _code_ctu(self, x0: int, y0: int) -> None:
        self._code_cq(x0, y0, self.sps.log2_ctb, 0)

    def encode(self):
        """Code all CTUs. Returns slice data bytes (WPP: also sets
        self.entry_points = substream byte sizes, all but the last)."""
        fs, sps = self.fs, self.sps
        if not self._skip_pre:
            self._pre_analyze()
        wctb = sps.pic_width_in_ctbs
        nctb = wctb * sps.pic_height_in_ctbs
        wpp = bool(self.pps.entropy_coding_sync_enabled)
        substreams: list[bytes] = []
        saved_ctx = None
        self.entry_points = []
        for addr in range(nctb):
            rx, ry = addr % wctb, addr // wctb
            if wpp and rx == 0 and ry > 0:
                self.w.start_substream(saved_ctx)
            x0, y0 = rx << sps.log2_ctb, ry << sps.log2_ctb
            cs = sps.ctb_size
            fs.slice_id[y0 >> 2:(y0 + cs) >> 2, x0 >> 2:(x0 + cs) >> 2] = 0
            if self.hdr.sao_luma or self.hdr.sao_chroma:
                self.w.write_sao(rx, ry,
                                 self.sao_params if self.sao_params
                                 is not None else self._sao_off)
            self._code_ctu(x0, y0)
            if wpp and rx == min(1, wctb - 1):
                saved_ctx = self.w.enc.save_ctx()
            last = addr == nctb - 1
            self.w.end_ctu(last)
            if wpp and rx == wctb - 1 and not last:
                # end_of_subset_one_bit + byte alignment, then a fresh
                # engine for the next row
                self.w.enc.encode_terminate(1)
                sub = self.w.finish_substream()
                substreams.append(sub)
                self.entry_points.append(len(sub))
        if wpp:
            # final substream flushed by the caller's slice-end handling;
            # prepend the finished rows
            self._wpp_prefix = b"".join(substreams)
        else:
            self._wpp_prefix = b""
        return self.w.finish()

    # ------------------------------------------------------------ quadtree
    def _code_cq(self, x0, y0, log2, depth):
        sps = self.sps
        size = 1 << log2
        inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
        min_cb = sps.log2_min_cb
        if log2 > 5:
            split = True
        elif log2 == 5:
            split = bool(self.split32[y0 >> 5, x0 >> 5]) if inside else True
        elif log2 == 4:
            split = bool(self.split16[y0 >> 4, x0 >> 4]) if inside else True
        else:
            split = False
        if not inside and log2 > min_cb:
            split = True            # inferred at picture boundary
        if log2 <= min_cb:
            split = False
        self.w.write_split_flag(x0, y0, log2, depth, int(split))
        if split:
            h = size >> 1
            for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
                x1, y1 = x0 + dx, y0 + dy
                if x1 < sps.width and y1 < sps.height:
                    self._code_cq(x1, y1, log2 - 1, depth + 1)
            return
        if log2 == 5:
            mode = int(self.mode32[y0 >> 5, x0 >> 5])
        elif log2 == 4:
            mode = int(self.mode16[y0 >> 4, x0 >> 4])
        else:
            mode = int(self.mode8[y0 >> 3, x0 >> 3])
        self._code_cu(x0, y0, log2, depth, mode)

    # ----------------------------------------------------------------- CU
    def _code_cu(self, x0, y0, log2, depth, mode):
        fs = self.fs
        size = 1 << log2
        b4 = size >> 2
        x4, y4 = x0 >> 2, y0 >> 2
        fs.cu_depth[y4:y4 + b4, x4:x4 + b4] = depth
        fs.qp[y4:y4 + b4, x4:x4 + b4] = self.qp
        fs.cu_edge_v[y4:y4 + b4, x4] = True
        fs.cu_edge_h[y4, x4:x4 + b4] = True
        fs.pu_edge_v[y4:y4 + b4, x4] = True
        fs.pu_edge_h[y4, x4:x4 + b4] = True
        fs.tu_edge_v[y4:y4 + b4, x4] = True
        fs.tu_edge_h[y4, x4:x4 + b4] = True
        self.w.write_intra_cu_header(x0, y0, log2, [mode], mode)
        # --- luma TU (same size as CU; max_transform_hierarchy_depth=0)
        pred = self._predict(0, x0, y0, size, mode)
        src = self.src_y[y0:y0 + size, x0:x0 + size]
        coeff_y = self._transform_quant(src - pred, log2, self.qp)
        cbf_y = int(coeff_y.any())
        # --- chroma TUs
        c_log2 = log2 - 1
        csz = size >> 1
        cx0, cy0 = x0 >> 1, y0 >> 1
        pred_cb = self._predict(1, cx0, cy0, csz, mode)
        pred_cr = self._predict(2, cx0, cy0, csz, mode)
        res_cb = self.src_cb[cy0:cy0 + csz, cx0:cx0 + csz] - pred_cb
        res_cr = self.src_cr[cy0:cy0 + csz, cx0:cx0 + csz] - pred_cr
        coeff_cb = self._transform_quant(res_cb, c_log2, self.qp_cb)
        coeff_cr = self._transform_quant(res_cr, c_log2, self.qp_cr)
        cbf_cb, cbf_cr = int(coeff_cb.any()), int(coeff_cr.any())
        # --- syntax: cbf_cb, cbf_cr (depth 0), cbf_luma, then residuals
        self.w.write_cbf_chroma(cbf_cb, 0)
        self.w.write_cbf_chroma(cbf_cr, 0)
        self.w.write_cbf_luma(cbf_y, 0)
        if cbf_y:
            self.w.write_residual(coeff_y, log2, 0, mode)
        if cbf_cb:
            self.w.write_residual(coeff_cb, c_log2, 1, mode)
        if cbf_cr:
            self.w.write_residual(coeff_cr, c_log2, 2, mode)
        # --- reconstruct (normative path, == decoder)
        fs.cbf_luma[y4:y4 + b4, x4:x4 + b4] = bool(cbf_y)
        resi_y = self._recon_residual(coeff_y, log2, self.qp) if cbf_y else None
        fs.y[y0:y0 + size, x0:x0 + size] = reconstruct(pred, resi_y)
        resi_cb = self._recon_residual(coeff_cb, c_log2, self.qp_cb) if cbf_cb else None
        resi_cr = self._recon_residual(coeff_cr, c_log2, self.qp_cr) if cbf_cr else None
        fs.cb[cy0:cy0 + csz, cx0:cx0 + csz] = reconstruct(pred_cb, resi_cb)
        fs.cr[cy0:cy0 + csz, cx0:cx0 + csz] = reconstruct(pred_cr, resi_cr)
        fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True

    # ------------------------------------------------------------- helpers
    def _predict(self, c_idx, x0, y0, size, mode):
        """Normative prediction from reconstruction references."""
        fs = self.fs
        plane = (fs.y, fs.cb, fs.cr)[c_idx]
        shift = 0 if c_idx == 0 else 1
        def avail(x, y):
            lx, ly = x << shift, y << shift
            return bool(fs.recon_done[ly >> 2, lx >> 2])

        refs_u, refs_f = jintra.build_refs_np(
            plane, x0, y0, size, avail, self.sps.width >> shift,
            self.sps.height >> shift,
            bool(self.sps.strong_intra_smoothing), 8, c_idx == 0)
        n2 = 2 * size
        use_f = c_idx == 0 and jintra.use_filtered_refs(mode, size)
        refs = refs_f if use_f else refs_u
        left = refs[:n2]
        corner = int(refs[n2])
        top = refs[n2 + 1:]
        return intra_predict(mode, left, corner, top, size, 8, c_idx == 0)

    # NumPy path for the sequential coding loop (per-CU jit dispatch would
    # dominate host time; the batched jnp versions in ops/ are used by the
    # wavefront-batched pipeline and bit-identical by property test)
    def _transform_quant(self, resi, log2, qp):
        from ..decode.recon import forward_transform as fwd
        from ..hevc.tables import QUANT_SCALE
        c = fwd(np.asarray(resi, np.int32), log2, False)
        qbits = 29 + qp // 6 - 8 - log2
        rnd = 171 << (qbits - 9)
        a = np.abs(c).astype(np.int64)
        q = np.minimum((a * QUANT_SCALE[qp % 6] + rnd) >> qbits, 32767)
        return np.where(c < 0, -q, q).astype(np.int32)

    def _recon_residual(self, levels, log2, qp):
        from ..decode.recon import dequant, inverse_transform
        return inverse_transform(dequant(levels, qp, log2), log2, False)


