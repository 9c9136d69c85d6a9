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
                [cc, "-O3", "-fPIC", "-shared", _src, "-o", _so],
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
            HAVE_NATIVE = True
    except OSError:
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
                   scan_idx: int, write_ts_zero: int) -> None:
    """Native residual_coding write, advancing the CabacEnc in place."""
    global _BASES
    if _BASES is None:
        _BASES = _ctx_bases()
    n = 1 << log2
    cap = int(4 * n * n + 64)
    scratch = ctypes.create_string_buffer(cap)
    low = ctypes.c_uint32(enc.low)
    rng = ctypes.c_int(enc.range)
    bl = ctypes.c_int(enc.bits_left)
    nb = ctypes.c_int(enc.num_buffered)
    bb = ctypes.c_int(enc.buffered_byte)
    ctx = (ctypes.c_ubyte * len(enc.ctx)).from_buffer(enc.ctx)
    c = np.ascontiguousarray(coeffs, np.int32)
    ret = _lib.ks_write_residual(
        ctx, ctypes.byref(low), ctypes.byref(rng), ctypes.byref(bl),
        ctypes.byref(nb), ctypes.byref(bb), scratch, cap,
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        log2, c_idx, scan_idx, write_ts_zero, _BASES)
    assert ret >= 0, "native write_residual on all-zero block"
    enc.low = low.value
    enc.range = rng.value
    enc.bits_left = bl.value
    enc.num_buffered = nb.value
    enc.buffered_byte = bb.value
    if ret:
        enc.out += scratch.raw[:ret]
