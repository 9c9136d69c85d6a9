"""Native host components: C CABAC residual codec, built on first import.

The Python implementations in bitstream/cabac.py, decode/slice_dec.py and
encode/sbac.py remain the reference (and fallback); this library makes the
bit-serial residual path native per the architecture stance (SURVEY.md 7.1:
"C++ host components for bit-serial work"). `HAVE_NATIVE` reports whether
the library is available; set KS265_NO_NATIVE=1 to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
_src = os.path.join(_here, "cabac.c")
_so = os.path.join(_here, "_cabac.so")

HAVE_NATIVE = False
_lib = None


def _build() -> bool:
    if not os.path.exists(_src):
        return False
    if (os.path.exists(_so)
            and os.path.getmtime(_so) >= os.path.getmtime(_src)):
        return True
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-pthread", _src, "-o", _so],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
    return False


if not os.environ.get("KS265_NO_NATIVE"):
    try:
        if _build():
            _lib = ctypes.CDLL(_so)
            _lib.ks_parse_residual.restype = ctypes.c_long
            _lib.ks_write_residual.restype = ctypes.c_long
            _lib.ks_write_slice.restype = ctypes.c_long
            HAVE_NATIVE = True
    except (OSError, AttributeError):
        _lib = None
        HAVE_NATIVE = False


def _ctx_bases():
    from ..hevc.cabac_tables import CTX_OFFSET
    return (ctypes.c_int * 7)(
        CTX_OFFSET["transform_skip"], CTX_OFFSET["last_x"],
        CTX_OFFSET["last_y"], CTX_OFFSET["sig_cg"], CTX_OFFSET["sig_flag"],
        CTX_OFFSET["one_flag"], CTX_OFFSET["abs_flag"])


_BASES = None


def parse_residual(dec, log2: int, c_idx: int, scan_idx: int, sbh: int,
                   parse_ts: int):
    """Native residual_coding parse, advancing the CabacDec in place.
    Returns (coeffs int32 (n,n), ts_flag)."""
    global _BASES
    if _BASES is None:
        _BASES = _ctx_bases()
    n = 1 << log2
    coeffs = np.zeros((n, n), np.int32)
    bitpos = ctypes.c_long(dec.bitpos)
    rng = ctypes.c_int(dec.range)
    off = ctypes.c_int(dec.offset)
    ts = ctypes.c_int(0)
    ctx = (ctypes.c_ubyte * len(dec.ctx)).from_buffer(dec.ctx)
    _lib.ks_parse_residual(
        ctx, ctypes.c_char_p(bytes(dec.data) if not isinstance(dec.data, bytes)
                             else dec.data),
        ctypes.c_long(dec.nbits),
        ctypes.byref(bitpos), ctypes.byref(rng), ctypes.byref(off),
        log2, c_idx, scan_idx, sbh, parse_ts, _BASES,
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(ts))
    dec.bitpos = bitpos.value
    dec.range = rng.value
    dec.offset = off.value
    return coeffs, ts.value


def write_residual(enc, coeffs: np.ndarray, log2: int, c_idx: int,
                   scan_idx: int, write_ts_zero: int, sbh: int = 0) -> None:
    """Native residual_coding write, advancing the CabacEnc in place."""
    global _BASES
    if _BASES is None:
        _BASES = _ctx_bases()
    n = 1 << log2
    cap = int(12 * n * n + 256)     # > provable worst-case CABAC output
    scratch = ctypes.create_string_buffer(cap)
    low = ctypes.c_uint32(enc.low)
    rng = ctypes.c_int(enc.range)
    bl = ctypes.c_int(enc.bits_left)
    nb = ctypes.c_int(enc.num_buffered)
    bb = ctypes.c_int(enc.buffered_byte)
    ctx = (ctypes.c_ubyte * len(enc.ctx)).from_buffer(enc.ctx)
    c = np.ascontiguousarray(coeffs, np.int32)
    ctx_snapshot = bytes(enc.ctx)
    ret = _lib.ks_write_residual(
        ctx, ctypes.byref(low), ctypes.byref(rng), ctypes.byref(bl),
        ctypes.byref(nb), ctypes.byref(bb), scratch, ctypes.c_long(cap),
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        log2, c_idx, scan_idx, write_ts_zero, _BASES, sbh)
    if ret == -2:                   # scratch overflow: restore + Python path
        enc.ctx[:] = ctx_snapshot
        raise OverflowError("native residual writer scratch overflow")
    assert ret >= 0, "native write_residual on all-zero block"
    enc.low = low.value
    enc.range = rng.value
    enc.bits_left = bl.value
    enc.num_buffered = nb.value
    enc.buffered_byte = bb.value
    if ret:
        enc.out += scratch.raw[:ret]


# ------------------------------------------------------- whole-slice writer

# context-base order shared with cabac.c's CB_* enum
_SLICE_CTX_NAMES = (
    "transform_skip", "last_x", "last_y", "sig_cg", "sig_flag", "one_flag",
    "abs_flag", "sao_merge", "sao_type", "split_cu", "skip", "merge_flag",
    "merge_idx", "part_size", "pred_mode", "intra_pred", "chroma_pred",
    "inter_dir", "mvd", "ref_idx", "mvp_idx", "dqp", "qt_cbf_luma",
    "qt_cbf_chroma", "qt_root_cbf", "trans_subdiv")

_SLICE_BASES = None


def _u8(a):
    return np.ascontiguousarray(a).astype(np.uint8, copy=False) \
        if a.dtype != np.uint8 else np.ascontiguousarray(a)


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def write_slice_native(fs, syn, sps, pps, hdr, sao_params, threads=1):
    """Native whole-slice entropy coder (mirror of map_writer.py).

    threads > 1 with tiles uses the pthread tile pool
    (ks_write_slice_tiles_mt) — tiles restart contexts, so workers are
    independent and the output is byte-identical to the serial writer.
    Returns (slice_data_bytes, entry_sizes list) or None when the native
    path cannot code this configuration (caller falls back to Python)."""
    global _SLICE_BASES
    if not HAVE_NATIVE:
        return None
    if getattr(sps, "pcm_enabled", 0):
        return None      # PCM raw-sample interleaving: Python writer
    if syn.part.any():
        return None      # partitioned inter CUs: Python writer
    if getattr(syn, "nxn", None) is not None and syn.nxn.any():
        return None      # intra NxN CUs: Python writer
    if getattr(syn, "tu_split", None) is not None and syn.tu_split.any():
        return None      # slices USING TU-split trees: Python writer
        # (flag-0 for split-capable SPS is written natively)
    from ..hevc.cabac_tables import CTX_OFFSET, NUM_CTX, init_contexts
    if _SLICE_BASES is None:
        _SLICE_BASES = (ctypes.c_int * len(_SLICE_CTX_NAMES))(
            *[CTX_OFFSET[n] for n in _SLICE_CTX_NAMES])
    wctb, hctb = sps.pic_width_in_ctbs, sps.pic_height_in_ctbs
    nctb = wctb * hctb
    params = np.array([
        sps.width, sps.height, fs.pw, fs.ph, sps.log2_ctb, sps.log2_min_cb,
        hdr.slice_type, int(pps.entropy_coding_sync_enabled),
        int(hdr.sao_luma), int(hdr.sao_chroma),
        int(pps.transform_skip_enabled), int(pps.sign_data_hiding_enabled),
        int(pps.cu_qp_delta_enabled), 0,
        int(hdr.num_ref_idx[0]) if hdr.num_ref_idx else 0,
        int(hdr.num_ref_idx[1]) if hdr.num_ref_idx else 0,
        int(hdr.max_num_merge_cand), int(hdr.slice_qp), NUM_CTX,
        int(getattr(sps, "max_transform_hierarchy_depth_intra", 0) > 0),
        int(getattr(sps, "max_transform_hierarchy_depth_inter", 0) > 0
            and hdr.slice_type != 2)],
        np.int32)
    # sao param arrays (all-off grid when sao is disabled for the slice)
    sao_type = np.zeros((nctb, 3), np.uint8)
    sao_off = np.zeros((nctb, 3, 4), np.int8)
    sao_band = np.zeros((nctb, 3), np.uint8)
    sao_eo = np.zeros((nctb, 3), np.uint8)
    if sao_params is not None:
        for ry in range(hctb):
            for rx in range(wctb):
                p = sao_params[ry][rx]
                i = ry * wctb + rx
                sao_type[i] = p.type_idx
                sao_off[i] = p.offsets
                sao_band[i] = p.band_pos
                sao_eo[i] = p.eo_class
    init_ctx = np.frombuffer(
        bytes(init_contexts(hdr.slice_type, hdr.slice_qp,
                            hdr.cabac_init_flag)), np.uint8)
    ts_to_rs = ctb_tile = None
    if pps.tiles_enabled:
        from ..hevc.params import TileGrid
        tg = getattr(pps, "_tile_grid", None)
        if tg is None:
            tg = TileGrid(pps, sps)
            pps._tile_grid = tg
        ts_to_rs = np.ascontiguousarray(tg.ts_to_rs, np.int32)
        ctb_tile = np.ascontiguousarray(tg.tile_of_ctb.reshape(-1), np.int32)
    cap = fs.pw * fs.ph * 3 + (1 << 16)
    out = np.empty(cap, np.uint8)
    n_sub = max(hctb, 1)
    if ctb_tile is not None:
        n_sub = max(n_sub, pps.num_tile_columns * pps.num_tile_rows)
    entry_sizes = np.zeros(n_sub, np.int32)
    n_entries = ctypes.c_int32(0)
    work = np.zeros(2 * NUM_CTX + fs.h4 * fs.w4, np.uint8)
    mvd0 = np.ascontiguousarray(syn.mvd0, np.int16)
    mvd1 = np.ascontiguousarray(syn.mvd1, np.int16)
    cy = np.ascontiguousarray(syn.cy, np.int16)
    ccb = np.ascontiguousarray(syn.ccb, np.int16)
    ccr = np.ascontiguousarray(syn.ccr, np.int16)
    u8 = ctypes.c_uint8
    # keep every converted array alive for the duration of the call
    maps = [_u8(fs.cu_depth), _u8(fs.skip), _u8(fs.pred_mode),
            _u8(fs.intra_mode), _u8(syn.chroma_mode), _u8(fs.cbf_luma),
            _u8(syn.cbf_cb), _u8(syn.cbf_cr), _u8(syn.merge_flag),
            _u8(syn.merge_idx), _u8(syn.inter_dir), _u8(syn.ref0),
            _u8(syn.ref1), _u8(syn.mvp0), _u8(syn.mvp1), _u8(fs.qp)]
    args = [
        _ptr(params, ctypes.c_int32), _SLICE_BASES, _ptr(init_ctx, u8),
        *[_ptr(m, u8) for m in maps],
        _ptr(mvd0, ctypes.c_int16), _ptr(mvd1, ctypes.c_int16),
        _ptr(cy, ctypes.c_int16), _ptr(ccb, ctypes.c_int16),
        _ptr(ccr, ctypes.c_int16),
        _ptr(sao_type, u8), _ptr(sao_off, ctypes.c_int8),
        _ptr(sao_band, u8), _ptr(sao_eo, u8),
        _ptr(ts_to_rs, ctypes.c_int32) if ts_to_rs is not None
        else ctypes.POINTER(ctypes.c_int32)(),
        _ptr(ctb_tile, ctypes.c_int32) if ctb_tile is not None
        else ctypes.POINTER(ctypes.c_int32)(),
        _ptr(out, u8), ctypes.c_long(cap),
        _ptr(entry_sizes, ctypes.c_int32), ctypes.byref(n_entries),
        _ptr(work, u8)]
    if (threads > 1 and ts_to_rs is not None
            and not pps.entropy_coding_sync_enabled):
        _lib.ks_write_slice_tiles_mt.restype = ctypes.c_long
        ret = _lib.ks_write_slice_tiles_mt(*args, ctypes.c_int(threads))
        if ret == -3:        # config not coverable by the MT path
            ret = _lib.ks_write_slice(*args)
    elif (threads > 1 and pps.entropy_coding_sync_enabled
            and ts_to_rs is None and hctb > 1):
        # WPP rows coded concurrently under the wavefront skew —
        # byte-identical to the serial writer (same ctx snapshot point)
        _lib.ks_write_slice_wpp_mt.restype = ctypes.c_long
        ret = _lib.ks_write_slice_wpp_mt(*args, ctypes.c_int(threads))
        if ret == -3:
            ret = _lib.ks_write_slice(*args)
    else:
        ret = _lib.ks_write_slice(*args)
    del maps
    if ret < 0:
        return None
    return bytes(out[:ret].tobytes()), \
        [int(v) for v in entry_sizes[:n_entries.value]]
