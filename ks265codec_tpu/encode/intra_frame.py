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

import os
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
from .map_writer import EncSyntax

# per-CU header bit estimate by size (split flags, part/mode/cbf syntax)
# used only for the split decision bias — small CUs pay more per pixel
_HDR_BITS = {8: 14.0, 16: 8.0, 32: 6.0}


def tile_region_maps(pps, sps):
    """(region map per 4x4 cell, per 8x8 cell, n_tile_cols) for the PPS's
    tile grid, or (None, None, 1) without tiles. Region ids live in
    fs.slice_id so every neighbor-availability equality check enforces the
    same-tile rule (spec 6.4.1) with no extra plumbing."""
    if not pps.tiles_enabled:
        return None, None, 1
    from ..hevc.params import TileGrid
    tg = getattr(pps, "_tile_grid", None)
    if tg is None:
        tg = TileGrid(pps, sps)
        pps._tile_grid = tg
    tile4 = np.repeat(np.repeat(tg.tile8, 2, 0), 2, 1).astype(np.int32)
    return tile4, tg.tile8, pps.num_tile_columns


def _block_any(plane, blk):
    """(H//blk, W//blk) bool: any nonzero in each blk x blk block."""
    h, w = plane.shape
    return (plane.reshape(h // blk, blk, w // blk, blk) != 0).any(axis=(1, 3))


def _cbf_cells8(coeff, log2m, chroma: bool):
    """Per-8x8-cell cbf of the covering CU/TU, from a coefficient plane."""
    a8 = _block_any(coeff, 4 if chroma else 8)
    a16 = np.repeat(np.repeat(_block_any(coeff, 8 if chroma else 16), 2, 0),
                    2, 1)[:a8.shape[0], :a8.shape[1]]
    a32 = np.repeat(np.repeat(_block_any(coeff, 16 if chroma else 32), 4, 0),
                    4, 1)[:a8.shape[0], :a8.shape[1]]
    return np.where(log2m == 5, a32, np.where(log2m == 4, a16, a8))


def decision_maps8(split32, split16, mode8, mode16, mode32, sps,
                   h8: int, w8: int, cm8=None, cm16=None, cm32=None):
    """Per-8x8-cell (log2 size, luma mode, chroma mode) maps from the
    batched decision pass, mirroring _code_cq's split inference."""
    log2m = np.full((h8, w8), 3, np.uint8)
    modes = mode8.astype(np.uint8).copy()
    cmodes = (cm8.astype(np.uint8).copy() if cm8 is not None
              else modes.copy())
    # 16-blocks are always fully inside (dims are multiples of 16)
    m16 = np.repeat(np.repeat(~split16, 2, 0), 2, 1)[:h8, :w8]
    log2m[m16] = 4
    mode16e = np.repeat(np.repeat(mode16, 2, 0), 2, 1)[:h8, :w8]
    modes[m16] = mode16e[m16].astype(np.uint8)
    if cm16 is not None:
        cm16e = np.repeat(np.repeat(cm16, 2, 0), 2, 1)[:h8, :w8]
        cmodes[m16] = cm16e[m16].astype(np.uint8)
    else:
        cmodes[m16] = mode16e[m16].astype(np.uint8)
    # 32-blocks: only where fully inside the picture
    nby32, nbx32 = split32.shape
    full_y = (np.arange(nby32) + 1) * 32 <= sps.height
    full_x = (np.arange(nbx32) + 1) * 32 <= sps.width
    pick32 = (~split32) & (full_y[:, None] & full_x[None, :])
    m32 = np.repeat(np.repeat(pick32, 4, 0), 4, 1)[:h8, :w8]
    log2m[m32] = 5
    mode32e = np.repeat(np.repeat(mode32, 4, 0), 4, 1)[:h8, :w8]
    modes[m32] = mode32e[m32].astype(np.uint8)
    if cm32 is not None:
        cm32e = np.repeat(np.repeat(cm32, 4, 0), 4, 1)[:h8, :w8]
        cmodes[m32] = cm32e[m32].astype(np.uint8)
    else:
        cmodes[m32] = mode32e[m32].astype(np.uint8)
    return log2m, modes, cmodes


def fill_intra_maps(fs, syn, log2m, modes8, cmodes8, qp_map8,
                    cy, ccb, ccr, tile4=None) -> None:
    """Vectorized FrameState/EncSyntax fill for a whole intra frame (the
    per-4x4 stores the sequential walk does one CU at a time). Writes only
    the in-picture cells — the sequential walk never touches the padding,
    and stray edge flags there would deblock across the picture border."""
    rep = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)
    # valid (in-picture) cell region; dims are multiples of 16
    h4v, w4v = fs.sps.height >> 2, fs.sps.width >> 2
    v = (slice(0, h4v), slice(0, w4v))
    depth8 = (fs.sps.log2_ctb - log2m.astype(np.int32)).astype(np.int8)
    fs.cu_depth[v] = rep(depth8)[v]
    fs.qp[v] = rep(qp_map8.astype(np.int8))[v]
    fs.intra_mode[v] = rep(modes8.astype(np.int8))[v]
    fs.pred_mode[v] = 1
    fs.mi_parsed[v] = True
    fs.recon_done[v] = True
    if tile4 is None:
        fs.slice_id[:] = 0
    else:
        fs.slice_id[:] = tile4
    syn.chroma_mode[v] = rep(cmodes8)[v]
    # CU/PU/TU edges: cell starts a CU when its coords align to the CU size
    h4, w4 = fs.h4, fs.w4
    s4 = (1 << (rep(log2m.astype(np.int32)) - 2))
    x4 = np.arange(w4)[None, :]
    y4 = np.arange(h4)[:, None]
    ev = ((x4 % s4) == 0)
    eh = ((y4 % s4) == 0)
    for g in (fs.cu_edge_v, fs.pu_edge_v, fs.tu_edge_v):
        g[v] = ev[v]
    for g in (fs.cu_edge_h, fs.pu_edge_h, fs.tu_edge_h):
        g[v] = eh[v]
    fs.cbf_luma[v] = rep(_cbf_cells8(cy, log2m, False))[v]
    syn.cbf_cb[v] = rep(_cbf_cells8(ccb, log2m, True)).astype(np.uint8)[v]
    syn.cbf_cr[v] = rep(_cbf_cells8(ccr, log2m, True)).astype(np.uint8)[v]


def _build_source_refs(plane: np.ndarray, n: int, bd: int = 8):
    """Vectorized reference construction from SOURCE pixels for every n x n
    block of the (padded) plane. Availability is raster-causal (left/top
    inside the picture). Returns (nby, nbx, 4n+1) int32."""
    h, w = plane.shape
    nby, nbx = h // n, w // n
    n2 = 2 * n
    mid = 1 << (bd - 1)
    p = plane.astype(np.int32)
    # raw left columns: left[by, bx, i] = p[min(by*n+i, h-1), bx*n-1]
    rows = np.minimum(np.arange(nby)[:, None] * n + np.arange(n2)[None, :],
                      h - 1)                                   # (nby, 2n)
    lcols = np.concatenate([np.zeros(1, np.intp),
                            np.arange(1, nbx) * n - 1])        # bx=0 unused
    left = p[rows][:, :, lcols].transpose(0, 2, 1)             # (nby,nbx,2n)
    # raw top rows: top[by, bx, i] = p[by*n-1, min(bx*n+i, w-1)]
    cols = np.minimum(np.arange(nbx)[:, None] * n + np.arange(n2)[None, :],
                      w - 1)                                   # (nbx, 2n)
    trows = np.concatenate([np.zeros(1, np.intp),
                            np.arange(1, nby) * n - 1])        # by=0 unused
    top = p[trows][:, cols]                                    # (nby,nbx,2n)
    corner = p[trows][:, lcols]                                # (nby, nbx)
    has_l = np.zeros((nby, nbx), bool)
    has_l[:, 1:] = True
    has_t = np.zeros((nby, nbx), bool)
    has_t[1:, :] = True
    # availability substitution, mirroring the scalar rules
    l0 = left[:, :, :1]
    t0 = top[:, :, :1]
    left = np.where(has_l[:, :, None], left, t0)
    top = np.where(has_t[:, :, None], top, l0)
    corner = np.where(has_l & has_t, corner,
                      np.where(has_t, t0[:, :, 0],
                               np.where(has_l, l0[:, :, 0], 0)))
    refs = np.concatenate([left, corner[:, :, None], top], axis=2)
    refs[~(has_l | has_t)] = mid
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


def decide_frame(src_y: np.ndarray, src_cb: np.ndarray,
                 src_cr: np.ndarray, qp: int, lam_scale: float = 1.0,
                 effort: int = 1, nxn: bool = False):
    """Whole-frame intra decision (split maps + luma/chroma modes).
    Delegates to the batched device pass (ops/decide) as a single-frame
    batch so the sequential oracle and the wavefront production path share
    ONE decision implementation. Returns (split32, mode16, mode32, cplx,
    split16, mode8, cm8, cm16, cm32)."""
    from ..ops.decide import decide_frames

    def one(a):
        # device uint8 planes pass through (the inter engine shares its
        # single source upload with this decision pass)
        import jax.numpy as jnp
        if isinstance(a, jnp.ndarray) and a.dtype == jnp.uint8:
            return a[None]
        return np.asarray(a, np.uint8)[None]

    return decide_frames(one(src_y), one(src_cb), one(src_cr),
                         [qp], lam_scale, effort=effort, nxn=nxn)[0]


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
        self.syn = EncSyntax(fs)
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

    def _pre_analyze(self) -> None:
        (self.split32, self.mode16, self.mode32, self.frame_cplx,
         self.split16, self.mode8, self.cmode8, self.cmode16,
         self.cmode32, self.icost8, self.icost16, self.mode4,
         self.nxn8) = decide_frame(
             self.src_y, self.src_cb, self.src_cr, self.qp,
             getattr(self, "lam_scale", 1.0),
             effort=getattr(self, "decide_effort", 1),
             nxn=bool(getattr(self, "use_nxn", False)))

    def _code_ctu(self, x0: int, y0: int) -> None:
        self._code_cq(x0, y0, self.sps.log2_ctb, 0)

    def compute(self):
        """Stage 1: decide + reconstruct every CTU, filling the FrameState
        grids, the EncSyntax maps and the coefficient planes. No entropy
        coding happens here (map_writer / native slicewriter do stage 2).

        Production path: the wavefront-batched device pass (ops/wavefront:
        one jitted dispatch per frame). Fallback/oracle: the sequential
        per-CU host walk (compute_sequential), bit-identical by test."""
        if type(self) is IntraFrameEncoder \
                and not self.sps.pcm_enabled \
                and not os.environ.get("KS265_SEQ_COMPUTE"):
            from ..ops.wavefront import WavefrontIntraCoder
            coder = WavefrontIntraCoder()
            if coder.available:
                try:
                    self.compute_wavefront(coder)
                    return
                except Exception as ex:
                    from ..utils.log import log
                    log(2, "wavefront compute failed (%s: %s); sequential "
                        "fallback" % (type(ex).__name__, ex))
        self.compute_sequential()

    def compute_sequential(self):
        fs, sps = self.fs, self.sps
        if not self._skip_pre:
            self._pre_analyze()
        wctb = sps.pic_width_in_ctbs
        nctb = wctb * sps.pic_height_in_ctbs
        tile4, _, _ = tile_region_maps(self.pps, sps)
        if tile4 is None:
            fs.slice_id[:] = 0
        else:
            fs.slice_id[:] = tile4
        for addr in range(nctb):
            rx, ry = addr % wctb, addr // wctb
            self._code_ctu(rx << sps.log2_ctb, ry << sps.log2_ctb)

    # ------------------------------------------- wavefront (device) compute
    def _decision_maps8(self):
        return decision_maps8(self.split32, self.split16, self.mode8,
                              self.mode16, self.mode32, self.sps,
                              self.fs.ph >> 3, self.fs.pw >> 3,
                              self.cmode8, self.cmode16, self.cmode32)

    def apply_coded_planes(self, log2m, modes8, cmodes8, qp_map8,
                           ry, rcb, rcr, cy, ccb, ccr):
        """Install a (possibly externally batch-computed) device-pass result
        into the FrameState + syntax maps. ry may be None: the recon then
        stays device-resident (batched path, lazy fetch) and fs planes are
        left untouched — nothing downstream of the batched path reads
        them (deblock/SAO already ran on device, PCM is off there)."""
        fs, syn = self.fs, self.syn
        if ry is not None:
            fs.y[:], fs.cb[:], fs.cr[:] = ry, rcb, rcr
        syn.cy[:] = cy
        syn.ccb[:] = ccb
        syn.ccr[:] = ccr
        tile4, _, _ = tile_region_maps(self.pps, self.sps)
        fill_intra_maps(fs, syn, log2m, modes8, cmodes8, qp_map8,
                        cy, ccb, ccr, tile4=tile4)

    def _qp_map8(self, shape):
        """Per-8-cell QP map: base QP + per-CTU AQ offsets when set."""
        qp_map8 = np.full(shape, self.qp, np.int32)
        dq = getattr(self, "dqp_ctu", None)
        if dq is not None:
            cty = (shape[0] + 7) // 8
            ctx = (shape[1] + 7) // 8
            d = np.zeros((cty, ctx), np.int32)
            d[:dq.shape[0], :dq.shape[1]] = dq[:cty, :ctx]
            if dq.shape[0] < cty:
                d[dq.shape[0]:] = d[dq.shape[0] - 1]
            if dq.shape[1] < ctx:
                d[:, dq.shape[1]:] = d[:, dq.shape[1] - 1:dq.shape[1]]
            qp_map8 = qp_map8 + np.repeat(np.repeat(d, 8, 0), 8, 1)[
                :shape[0], :shape[1]]
        return np.clip(qp_map8, 0, 51).astype(np.uint8)

    def _cu_qp(self, x0: int, y0: int) -> tuple[int, int, int]:
        """(qp, qp_cb, qp_cr) for the CU at (x0, y0) under AQ."""
        dq = getattr(self, "dqp_ctu", None)
        if dq is None:
            return self.qp, self.qp_cb, self.qp_cr
        cy = min(y0 >> 6, dq.shape[0] - 1)
        cx = min(x0 >> 6, dq.shape[1] - 1)
        qp = int(np.clip(self.qp + int(dq[cy, cx]), 0, 51))
        return (qp,
                chroma_qp(qp + self.pps.cb_qp_offset
                          + self.hdr.cb_qp_offset),
                chroma_qp(qp + self.pps.cr_qp_offset
                          + self.hdr.cr_qp_offset))

    def compute_wavefront(self, coder):
        sps = self.sps
        if not self._skip_pre:
            self._pre_analyze()
        log2m, modes8, cmodes8 = self._decision_maps8()
        qp_map8 = self._qp_map8(log2m.shape)
        _, tile8, ntc = tile_region_maps(self.pps, sps)
        ry, rcb, rcr, cy, ccb, ccr = coder.code_frame(
            self.src_y, self.src_cb, self.src_cr, log2m, modes8, cmodes8,
            qp_map8, self.pps.cb_qp_offset + self.hdr.cb_qp_offset,
            self.pps.cr_qp_offset + self.hdr.cr_qp_offset, sps,
            sbh=bool(self.pps.sign_data_hiding_enabled),
            rdoq=bool(getattr(self, "rdoq", False)),
            tile8=tile8, n_tile_cols=ntc)
        self.apply_coded_planes(log2m, modes8, cmodes8, qp_map8,
                                ry, rcb, rcr, cy, ccb, ccr)

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
        if split:
            h = size >> 1
            for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
                x1, y1 = x0 + dx, y0 + dy
                if x1 < sps.width and y1 < sps.height:
                    self._code_cq(x1, y1, log2 - 1, depth + 1)
            return
        if log2 == 5:
            mode = int(self.mode32[y0 >> 5, x0 >> 5])
            cmode = int(self.cmode32[y0 >> 5, x0 >> 5])
        elif log2 == 4:
            mode = int(self.mode16[y0 >> 4, x0 >> 4])
            cmode = int(self.cmode16[y0 >> 4, x0 >> 4])
        else:
            mode = int(self.mode8[y0 >> 3, x0 >> 3])
            cmode = int(self.cmode8[y0 >> 3, x0 >> 3])
        self._code_cu(x0, y0, log2, depth, mode, cmode)

    # ----------------------------------------------------------------- CU
    def _code_cu_nxn(self, x0, y0, cmode):
        """part_mode NxN at the min CB (8x8): four 4x4 intra PUs with
        their own modes and DST 4x4 TUs (IntraSplitFlag tree), one 4x4
        chroma TU pair — the reference's intraCuMd4x4 tier and the main
        detail-retention tool of its slower presets."""
        from ..decode.recon import (dequant, forward_transform,
                                    inverse_transform, reconstruct)
        from .sbh import apply_sbh_np, scan_for
        fs, syn = self.fs, self.syn
        x4, y4 = x0 >> 2, y0 >> 2
        # chroma DM for NxN references PU0's mode (spec 8.4.3); the
        # decide pass chose cmode against the 2Nx2N winner — remap any
        # unrepresentable choice to DM
        m0 = int(self.mode4[y0 >> 2, x0 >> 2])
        if cmode != m0 and cmode not in (0, 26, 10, 1):
            cmode = m0
        elif cmode == 34 and m0 not in (0, 26, 10, 1):
            cmode = m0
        cu_qp, cu_qp_cb, cu_qp_cr = self._cu_qp(x0, y0)
        fs.cu_depth[y4:y4 + 2, x4:x4 + 2] = self.sps.log2_ctb - 3
        fs.qp[y4:y4 + 2, x4:x4 + 2] = cu_qp
        fs.cu_edge_v[y4:y4 + 2, x4] = True
        fs.cu_edge_h[y4, x4:x4 + 2] = True
        fs.pred_mode[y4:y4 + 2, x4:x4 + 2] = 1
        fs.mi_parsed[y4:y4 + 2, x4:x4 + 2] = True
        syn.nxn[y4, x4] = 1
        syn.chroma_mode[y4:y4 + 2, x4:x4 + 2] = cmode
        for (dx, dy) in ((0, 0), (4, 0), (0, 4), (4, 4)):
            xq, yq, q4x, q4y = x0 + dx, y0 + dy, (x0 + dx) >> 2, \
                (y0 + dy) >> 2
            fs.pu_edge_v[q4y, q4x] = True
            fs.pu_edge_h[q4y, q4x] = True
            fs.tu_edge_v[q4y, q4x] = True
            fs.tu_edge_h[q4y, q4x] = True
            mode = int(self.mode4[yq >> 2, xq >> 2])
            fs.intra_mode[q4y, q4x] = mode
            pred = self._predict(0, xq, yq, 4, mode)
            resi = self.src_y[yq:yq + 4, xq:xq + 4] - pred

            def quant4(c):
                if getattr(self, "rdoq", False):
                    from .rdoq import rdoq_np
                    return rdoq_np(np.asarray(c, np.int32), cu_qp, 2)
                from ..hevc.tables import QUANT_SCALE
                qbits = 29 + cu_qp // 6 - 8 - 2
                rnd = 171 << (qbits - 9)
                a = np.abs(np.asarray(c, np.int64))
                q = np.minimum(
                    (a * QUANT_SCALE[cu_qp % 6] + rnd) >> qbits, 32767)
                return np.where(np.asarray(c) < 0, -q, q).astype(np.int32)

            cf, use_ts = quant4(forward_transform(
                np.asarray(resi, np.int32), 2, True)), False
            if self.pps.transform_skip_enabled:
                # transform_skip candidate: forward "transform" is a
                # left-shift matching the DCT gain at 4x4/8-bit (HM
                # xTransformSkip shift = 13 - bd); pick by D + lam*R
                from ..decode.recon import transform_skip_residual
                cf_ts = quant4(np.asarray(resi, np.int64) << 5)
                lam = 0.57 * 2.0 ** ((cu_qp - 12) / 3.0)

                def jcost4(cfx, tsf):
                    if cfx.any():
                        d = dequant(cfx, cu_qp, 2)
                        r = (transform_skip_residual(d) if tsf
                             else inverse_transform(d, 2, True))
                    else:
                        r = np.zeros((4, 4), np.int32)
                    sse = float(((resi - r) ** 2).sum())
                    a = np.abs(cfx[cfx != 0]).astype(np.float64)
                    bits = (3.1 * a.size + 2.0 * np.log2(
                        np.maximum(a, 1.0)).sum() if a.size else 0.0)
                    return sse + lam * (bits + 1.0)

                if jcost4(cf_ts, True) < jcost4(cf, False):
                    cf, use_ts = cf_ts, True
            if self.pps.sign_data_hiding_enabled:
                cf = apply_sbh_np(cf, scan_for(2, 0, mode))
            syn.cy[yq:yq + 4, xq:xq + 4] = cf
            syn.ts_y[q4y, q4x] = int(use_ts)
            fs.cbf_luma[q4y, q4x] = bool(cf.any())
            if cf.any():
                from ..decode.recon import transform_skip_residual
                d = dequant(cf, cu_qp, 2)
                r = (transform_skip_residual(d) if use_ts
                     else inverse_transform(d, 2, True))
            else:
                r = None
            fs.y[yq:yq + 4, xq:xq + 4] = reconstruct(pred, r)
            fs.recon_done[q4y, q4x] = True
        # chroma: one 4x4 TU pair at the CU origin (spec: chroma coded at
        # blk_idx 3, predicting from the fully reconstructed luma state)
        cx0, cy0 = x0 >> 1, y0 >> 1
        for c_idx, (srcp, dstp, qpc) in enumerate((
                (self.src_cb, fs.cb, cu_qp_cb),
                (self.src_cr, fs.cr, cu_qp_cr)), start=1):
            predc = self._predict(c_idx, cx0, cy0, 4, cmode)
            resc = srcp[cy0:cy0 + 4, cx0:cx0 + 4] - predc
            cfc = self._transform_quant(resc, 2, qpc,
                                        scan_for(2, c_idx, cmode))
            (syn.ccb if c_idx == 1 else syn.ccr)[
                cy0:cy0 + 4, cx0:cx0 + 4] = cfc
            (syn.cbf_cb if c_idx == 1 else syn.cbf_cr)[
                y4:y4 + 2, x4:x4 + 2] = int(cfc.any())
            rc = (self._recon_residual(cfc, 2, qpc) if cfc.any()
                  else None)
            dstp[cy0:cy0 + 4, cx0:cx0 + 4] = reconstruct(predc, rc)

    def _code_cu(self, x0, y0, log2, depth, mode, cmode=None):
        if cmode is None:
            cmode = mode                                  # DM
        fs, syn = self.fs, self.syn
        size = 1 << log2
        b4 = size >> 2
        x4, y4 = x0 >> 2, y0 >> 2
        if log2 == 3 and getattr(self, "nxn8", None) is not None \
                and not np.isscalar(self.nxn8) \
                and self.nxn8[y0 >> 3, x0 >> 3] \
                and int(getattr(self.hdr, "slice_type", 2)) == 2:
            self._code_cu_nxn(x0, y0, cmode)
            return
        cu_qp, cu_qp_cb, cu_qp_cr = self._cu_qp(x0, y0)
        fs.cu_depth[y4:y4 + b4, x4:x4 + b4] = depth
        fs.qp[y4:y4 + b4, x4:x4 + b4] = cu_qp
        fs.cu_edge_v[y4:y4 + b4, x4] = True
        fs.cu_edge_h[y4, x4:x4 + b4] = True
        fs.pu_edge_v[y4:y4 + b4, x4] = True
        fs.pu_edge_h[y4, x4:x4 + b4] = True
        fs.tu_edge_v[y4:y4 + b4, x4] = True
        fs.tu_edge_h[y4, x4:x4 + b4] = True
        fs.intra_mode[y4:y4 + b4, x4:x4 + b4] = mode
        fs.pred_mode[y4:y4 + b4, x4:x4 + b4] = 1      # MODE_INTRA
        fs.mi_parsed[y4:y4 + b4, x4:x4 + b4] = True
        syn.chroma_mode[y4:y4 + b4, x4:x4 + b4] = cmode
        # --- luma TU (same size as CU; max_transform_hierarchy_depth=0)
        from .sbh import scan_for
        pred = self._predict(0, x0, y0, size, mode)
        src = self.src_y[y0:y0 + size, x0:x0 + size]
        coeff_y = self._transform_quant(src - pred, log2, cu_qp,
                                        scan_for(log2, 0, mode))
        cbf_y = int(coeff_y.any())
        # --- chroma TUs
        c_log2 = log2 - 1
        csz = size >> 1
        cx0, cy0 = x0 >> 1, y0 >> 1
        pred_cb = self._predict(1, cx0, cy0, csz, cmode)
        pred_cr = self._predict(2, cx0, cy0, csz, cmode)
        res_cb = self.src_cb[cy0:cy0 + csz, cx0:cx0 + csz] - pred_cb
        res_cr = self.src_cr[cy0:cy0 + csz, cx0:cx0 + csz] - pred_cr
        coeff_cb = self._transform_quant(res_cb, c_log2, cu_qp_cb,
                                         scan_for(c_log2, 1, cmode))
        coeff_cr = self._transform_quant(res_cr, c_log2, cu_qp_cr,
                                         scan_for(c_log2, 2, cmode))
        cbf_cb, cbf_cr = int(coeff_cb.any()), int(coeff_cr.any())
        if (self.sps.pcm_enabled
                and self.sps.log2_min_pcm_cb <= log2
                <= self.sps.log2_max_pcm_cb
                and self._pcm_wins(coeff_y, coeff_cb, coeff_cr, size)):
            # PCM fallback: recon = source verbatim, no residual syntax
            syn.pcm[y4:y4 + b4, x4:x4 + b4] = 1
            syn.cy[y0:y0 + size, x0:x0 + size] = 0
            syn.ccb[cy0:cy0 + csz, cx0:cx0 + csz] = 0
            syn.ccr[cy0:cy0 + csz, cx0:cx0 + csz] = 0
            syn.cbf_cb[y4:y4 + b4, x4:x4 + b4] = 0
            syn.cbf_cr[y4:y4 + b4, x4:x4 + b4] = 0
            fs.cbf_luma[y4:y4 + b4, x4:x4 + b4] = False
            fs.intra_mode[y4:y4 + b4, x4:x4 + b4] = 1     # DC for MPM
            fs.y[y0:y0 + size, x0:x0 + size] = src
            fs.cb[cy0:cy0 + csz, cx0:cx0 + csz] = \
                self.src_cb[cy0:cy0 + csz, cx0:cx0 + csz]
            fs.cr[cy0:cy0 + csz, cx0:cx0 + csz] = \
                self.src_cr[cy0:cy0 + csz, cx0:cx0 + csz]
            fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True
            return
        if (self.sps.max_transform_hierarchy_depth_intra > 0
                and log2 in (4, 5)):
            # intra TU-split: predict-per-sub-TU from progressive recon
            # (the reference's intra transform quadtree — its main
            # intra-prediction-quality tool over our TU==CU baseline).
            # Code the split variant, compare against the unsplit
            # candidates (computed above, unaffected: they only read
            # OUTSIDE neighbors), keep the winner.
            lam = 0.57 * 2.0 ** ((cu_qp - 12) / 3.0)

            def _bits_of(cf):
                a = np.abs(cf[cf != 0]).astype(np.float64)
                return (3.1 * a.size
                        + 2.0 * np.log2(np.maximum(a, 1.0)).sum()
                        if a.size else 0.0)

            ru = reconstruct(pred, self._recon_residual(
                coeff_y, log2, cu_qp) if cbf_y else None)
            rcb = reconstruct(pred_cb, self._recon_residual(
                coeff_cb, c_log2, cu_qp_cb) if cbf_cb else None)
            rcr = reconstruct(pred_cr, self._recon_residual(
                coeff_cr, c_log2, cu_qp_cr) if cbf_cr else None)
            D_u = (float(((src - ru).astype(np.int64) ** 2).sum())
                   + float(((self.src_cb[cy0:cy0 + csz, cx0:cx0 + csz]
                             - rcb).astype(np.int64) ** 2).sum())
                   + float(((self.src_cr[cy0:cy0 + csz, cx0:cx0 + csz]
                             - rcr).astype(np.int64) ** 2).sum()))
            b_u = _bits_of(coeff_y) + _bits_of(coeff_cb) \
                + _bits_of(coeff_cr)
            D_s, b_s = self._code_intra_split(x0, y0, log2, mode, cmode,
                                              cu_qp, cu_qp_cb, cu_qp_cr)
            if D_s + lam * (b_s + 8.0) < D_u + lam * b_u:
                syn.tu_split[y4:y4 + b4, x4:x4 + b4] = 1
                return
            # unsplit wins: clear the split's interior TU edges/marks and
            # fall through (region writes below overwrite the rest)
            syn.tu_split[y4:y4 + b4, x4:x4 + b4] = 0
            fs.tu_edge_v[y4:y4 + b4, x4 + 1:x4 + b4] = False
            fs.tu_edge_h[y4 + 1:y4 + b4, x4:x4 + b4] = False
        syn.cy[y0:y0 + size, x0:x0 + size] = coeff_y
        syn.ccb[cy0:cy0 + csz, cx0:cx0 + csz] = coeff_cb
        syn.ccr[cy0:cy0 + csz, cx0:cx0 + csz] = coeff_cr
        syn.cbf_cb[y4:y4 + b4, x4:x4 + b4] = cbf_cb
        syn.cbf_cr[y4:y4 + b4, x4:x4 + b4] = cbf_cr
        # --- reconstruct (normative path, == decoder)
        fs.cbf_luma[y4:y4 + b4, x4:x4 + b4] = bool(cbf_y)
        resi_y = self._recon_residual(coeff_y, log2, cu_qp) if cbf_y else None
        fs.y[y0:y0 + size, x0:x0 + size] = reconstruct(pred, resi_y)
        resi_cb = self._recon_residual(coeff_cb, c_log2, cu_qp_cb) if cbf_cb else None
        resi_cr = self._recon_residual(coeff_cr, c_log2, cu_qp_cr) if cbf_cr else None
        fs.cb[cy0:cy0 + csz, cx0:cx0 + csz] = reconstruct(pred_cb, resi_cb)
        fs.cr[cy0:cy0 + csz, cx0:cx0 + csz] = reconstruct(pred_cr, resi_cr)
        fs.recon_done[y4:y4 + b4, x4:x4 + b4] = True

    def _code_intra_split(self, x0, y0, log2, mode, cmode, cu_qp,
                          cu_qp_cb, cu_qp_cr):
        """Code this intra CU as FOUR half-size TUs (depth-1 intra
        transform tree): each sub-TU predicts from the progressively
        reconstructed neighbors (mirror of the decoder's per-TU intra
        recon); chroma codes per child. Returns (D_pixel, bits) of the
        written result."""
        from .sbh import scan_for
        fs, syn = self.fs, self.syn
        size = 1 << log2
        h = size >> 1
        clog2 = log2 - 1
        D = 0.0
        bits = 0.0
        for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
            xc, yc = x0 + dx, y0 + dy
            c4x, c4y, cb4 = xc >> 2, yc >> 2, h >> 2
            fs.tu_edge_v[c4y:c4y + cb4, c4x] = True
            fs.tu_edge_h[c4y, c4x:c4x + cb4] = True
            predc = self._predict(0, xc, yc, h, mode)
            srcc = self.src_y[yc:yc + h, xc:xc + h]
            cf = self._transform_quant(srcc - predc, clog2, cu_qp,
                                       scan_for(clog2, 0, mode))
            syn.cy[yc:yc + h, xc:xc + h] = cf
            fs.cbf_luma[c4y:c4y + cb4, c4x:c4x + cb4] = bool(cf.any())
            rec = reconstruct(predc, self._recon_residual(
                cf, clog2, cu_qp) if cf.any() else None)
            fs.y[yc:yc + h, xc:xc + h] = rec
            fs.recon_done[c4y:c4y + cb4, c4x:c4x + cb4] = True
            D += float(((srcc - rec).astype(np.int64) ** 2).sum())
            a = np.abs(cf[cf != 0]).astype(np.float64)
            bits += (3.1 * a.size
                     + 2.0 * np.log2(np.maximum(a, 1.0)).sum()
                     if a.size else 0.0)
            # chroma child TU
            csz2 = h >> 1
            ccx, ccy = xc >> 1, yc >> 1
            for c_idx, (srcp, dstp, cmap, qpc) in enumerate((
                    (self.src_cb, fs.cb, syn.ccb, cu_qp_cb),
                    (self.src_cr, fs.cr, syn.ccr, cu_qp_cr)), start=1):
                pch = self._predict(c_idx, ccx, ccy, csz2, cmode)
                sch = srcp[ccy:ccy + csz2, ccx:ccx + csz2]
                cfc = self._transform_quant(sch - pch, clog2 - 1, qpc,
                                            scan_for(clog2 - 1, c_idx,
                                                     cmode))
                cmap[ccy:ccy + csz2, ccx:ccx + csz2] = cfc
                (syn.cbf_cb if c_idx == 1 else syn.cbf_cr)[
                    c4y:c4y + cb4, c4x:c4x + cb4] = int(cfc.any())
                rch = reconstruct(pch, self._recon_residual(
                    cfc, clog2 - 1, qpc) if cfc.any() else None)
                dstp[ccy:ccy + csz2, ccx:ccx + csz2] = rch
                D += float(((sch - rch).astype(np.int64) ** 2).sum())
                ac = np.abs(cfc[cfc != 0]).astype(np.float64)
                bits += (3.1 * ac.size
                         + 2.0 * np.log2(np.maximum(ac, 1.0)).sum()
                         if ac.size else 0.0)
        return D, bits

    # ------------------------------------------------------------- helpers
    @staticmethod
    def _pcm_wins(cy, ccb, ccr, size: int) -> bool:
        """Crude CU bit estimate vs raw PCM cost (8 bits/sample, 4:2:0).
        PCM only wins at very low QP on dense content — the reference's
        lossless-fallback rationale (sps pcm_enabled, spec 7.3.8.7)."""
        est = 32.0
        for c in (cy, ccb, ccr):
            a = np.abs(c[c != 0])
            est += 2.0 * len(a) + 2.0 * np.log2(a + 1.0).sum()
        return est > 8 * size * size * 1.5

    def _predict(self, c_idx, x0, y0, size, mode):
        """Normative prediction from reconstruction references."""
        fs = self.fs
        plane = (fs.y, fs.cb, fs.cr)[c_idx]
        shift = 0 if c_idx == 0 else 1
        region = fs.slice_id[(y0 << shift) >> 2, (x0 << shift) >> 2]

        def avail(x, y):
            lx, ly = x << shift, y << shift
            return bool(fs.recon_done[ly >> 2, lx >> 2]
                        and fs.slice_id[ly >> 2, lx >> 2] == region)

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
    def _transform_quant(self, resi, log2, qp, scan_idx=0):
        from ..decode.recon import forward_transform as fwd
        from ..hevc.tables import QUANT_SCALE
        c = fwd(np.asarray(resi, np.int32), log2, False)
        if getattr(self, "rdoq", False):
            from .rdoq import rdoq_np
            out = rdoq_np(c, qp, log2)
        else:
            qbits = 29 + qp // 6 - 8 - log2
            rnd = 171 << (qbits - 9)
            a = np.abs(c).astype(np.int64)
            q = np.minimum((a * QUANT_SCALE[qp % 6] + rnd) >> qbits, 32767)
            out = np.where(c < 0, -q, q).astype(np.int32)
        if self.pps.sign_data_hiding_enabled:
            from .sbh import apply_sbh_np
            out = apply_sbh_np(out, scan_idx)
        return out

    def _recon_residual(self, levels, log2, qp):
        from ..decode.recon import dequant, inverse_transform
        return inverse_transform(dequant(levels, qp, log2), log2, False)


