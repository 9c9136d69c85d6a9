"""CABAC constants: LPS range table, state transitions, context init values,
and the context-memory layout shared by the decoder and encoder engines.

These are the normative tables of ITU-T H.265 section 9.3 (Table 9-46/9-47
and the initValue tables 9-5..9-32). The reference embeds the same data in
CComCabacEngine / InitpState (SURVEY.md 2.2 "CABAC engine").

Context representation: one byte per context, (pStateIdx << 1) | valMPS —
the standard packed form, which makes WPP context save/restore a bytearray
copy and lets the C++ engine share the exact layout.
"""

from __future__ import annotations

# Table 9-46: rangeTabLps[pStateIdx][qRangeIdx]
RANGE_TAB_LPS = [
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9], [2, 2, 2, 2],
]

# Table 9-47: transIdxLps / transIdxMps
TRANS_IDX_LPS = [
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
]
TRANS_IDX_MPS = [min(i + 1, 62) for i in range(63)] + [63]

# Packed-state transition tables: state byte = (pStateIdx << 1) | valMPS
NEXT_STATE_MPS = [0] * 128
NEXT_STATE_LPS = [0] * 128
for _s in range(64):
    for _mps in range(2):
        _b = (_s << 1) | _mps
        NEXT_STATE_MPS[_b] = (TRANS_IDX_MPS[_s] << 1) | _mps
        _nm = 1 - _mps if _s == 0 else _mps
        NEXT_STATE_LPS[_b] = (TRANS_IDX_LPS[_s] << 1) | _nm

# Encoder renormalization shift for the LPS subinterval (HM-style), indexed
# by lps >> 3 (valid for lps >= 6, i.e. every state except the terminate one).
RENORM_TABLE = [6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]

CNU = 154  # "context not used" filler


def _clip3(lo, hi, v):
    return lo if v < lo else hi if v > hi else v


def init_state(init_value: int, qp: int) -> int:
    """Spec 9.3.2.2: packed context state from an 8-bit initValue and SliceQPY."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = _clip3(1, 126, ((slope * _clip3(0, 51, qp)) >> 4) + offset)
    if pre <= 63:
        return ((63 - pre) << 1) | 0
    return ((pre - 64) << 1) | 1


# ---------------------------------------------------------------------------
# Context init values. Rows are initType 0 (I), 1 (P), 2 (B).
# initType selection (spec 9.3.2.2): I slice -> 0;
# P slice -> cabac_init_flag ? 2 : 1; B slice -> cabac_init_flag ? 1 : 2.
# ---------------------------------------------------------------------------

INIT_VALUES: dict[str, list[list[int]]] = {
    "sao_merge": [[153], [153], [153]],
    "sao_type": [[200], [185], [160]],
    "split_cu": [[139, 141, 157], [107, 139, 126], [107, 139, 126]],
    "tq_bypass": [[154], [154], [154]],
    "skip": [[CNU, CNU, CNU], [197, 185, 201], [197, 185, 201]],
    "merge_flag": [[CNU], [110], [154]],
    "merge_idx": [[CNU], [122], [137]],
    "part_size": [[184, CNU, CNU, CNU], [154, 139, 154, 154], [154, 139, 154, 154]],
    "pred_mode": [[CNU], [149], [134]],
    "intra_pred": [[184], [154], [183]],
    "chroma_pred": [[63, 139], [152, 139], [152, 139]],
    "inter_dir": [[CNU] * 5, [CNU] * 5, [95, 79, 63, 31, 31]],
    "mvd": [[CNU, CNU], [140, 198], [169, 198]],
    "ref_idx": [[CNU, CNU], [153, 153], [153, 153]],
    "mvp_idx": [[CNU], [168], [168]],
    "dqp": [[154, 154, 154], [154, 154, 154], [154, 154, 154]],
    "qt_cbf_luma": [[111, 141], [153, 111], [153, 111]],
    "qt_cbf_chroma": [[94, 138, 182, 154, 154],
                      [149, 107, 167, 154, 154],
                      [149, 92, 167, 154, 154]],
    "qt_root_cbf": [[CNU], [79], [79]],
    "trans_subdiv": [[153, 138, 138], [124, 138, 94], [224, 167, 122]],
    "transform_skip": [[139, 139], [139, 139], [139, 139]],
    "sig_cg": [[91, 171, 134, 141], [121, 140, 61, 154], [121, 140, 61, 154]],
    "sig_flag": [
        # 27 luma + 15 chroma
        [111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141, 179, 153,
         125, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 140,
         139, 182, 182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139, 111],
        [155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183, 140, 136, 153,
         154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
         153, 123, 123, 107, 121, 107, 121, 167, 151, 183, 140, 151, 183, 140],
        [170, 154, 139, 153, 139, 123, 123, 63, 124, 166, 183, 140, 136, 153,
         154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
         153, 138, 138, 122, 121, 122, 121, 167, 151, 183, 140, 151, 183, 140],
    ],
    "last_x": [
        # 15 luma + 3 chroma (same values used for last_y)
        [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
         79, 108, 123, 63],
        [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94,
         108, 123, 108],
        [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111, 79,
         108, 123, 93],
    ],
    "one_flag": [
        # 16 luma + 8 chroma
        [140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92, 139, 107,
         122, 152, 140, 179, 166, 182, 140, 227, 122, 197],
        [154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 137, 169, 194, 166, 167, 154, 167, 137, 182],
        [154, 196, 167, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 122, 169, 208, 166, 167, 154, 152, 167, 182],
    ],
    "abs_flag": [
        # 4 luma + 2 chroma
        [138, 153, 136, 167, 152, 152],
        [107, 167, 91, 122, 107, 167],
        [107, 167, 91, 107, 107, 167],
    ],
}

# last_y shares last_x values
_ORDER = list(INIT_VALUES.keys())
_ORDER.insert(_ORDER.index("last_x") + 1, "last_y")

CTX_OFFSET: dict[str, int] = {}
_off = 0
for _name in _ORDER:
    CTX_OFFSET[_name] = _off
    _src = "last_x" if _name == "last_y" else _name
    _off += len(INIT_VALUES[_src][0])
NUM_CTX = _off  # total context count


def init_contexts(slice_type: int, qp: int, cabac_init_flag: int = 0) -> bytearray:
    """Build the full packed context memory for a slice.

    slice_type: 0=B, 1=P, 2=I (stream order). Returns bytearray[NUM_CTX].
    """
    if slice_type == 2:
        init_type = 0
    elif slice_type == 1:
        init_type = 2 if cabac_init_flag else 1
    else:
        init_type = 1 if cabac_init_flag else 2
    ctx = bytearray(NUM_CTX)
    for name in _ORDER:
        src = "last_x" if name == "last_y" else name
        base = CTX_OFFSET[name]
        for i, iv in enumerate(INIT_VALUES[src][init_type]):
            ctx[base + i] = init_state(iv, qp)
    return ctx


# ---------------------------------------------------------------------------
# Scan orders (spec 6.5.3/6.5.4): 0 = up-right diagonal, 1 = horizontal,
# 2 = vertical. Returned as list of (x, y).
# ---------------------------------------------------------------------------

def _diag_scan(size: int) -> list[tuple[int, int]]:
    out = []
    x = y = 0
    while len(out) < size * size:
        while y >= 0:
            if x < size and y < size:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
    return out


def _hor_scan(size: int) -> list[tuple[int, int]]:
    return [(x, y) for y in range(size) for x in range(size)]


def _ver_scan(size: int) -> list[tuple[int, int]]:
    return [(x, y) for x in range(size) for y in range(size)]


SCAN_4x4 = [_diag_scan(4), _hor_scan(4), _ver_scan(4)]
# sub-block scans for TBs of size 4..32 (size in sub-blocks: 1,2,4,8)
SCAN_SB = {n: [_diag_scan(n), _hor_scan(n), _ver_scan(n)] for n in (1, 2, 4, 8)}


def scan_order(log2_size: int, scan_idx: int):
    """(sub-block scan, within-sub-block scan) for a TB."""
    n_sb = 1 << (log2_size - 2)
    return SCAN_SB[n_sb][scan_idx], SCAN_4x4[scan_idx]


# sig_coeff_flag ctxIdxMap for 4x4 TBs (spec 9.3.4.2.5)
SIG_CTX_MAP_4x4 = [0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8]


def sig_ctx_inc(log2: int, c_idx: int, scan_idx: int, xs: int, ys: int,
                xp: int, yp: int, prev_csbf: int) -> int:
    """sig_coeff_flag context increment (spec 9.3.4.2.5) — shared by the
    CABAC parser (decode) and syntax writer (encode)."""
    if log2 == 2:
        ctx = SIG_CTX_MAP_4x4[(yp << 2) + xp]
    elif xs == 0 and ys == 0 and xp == 0 and yp == 0:
        ctx = 0  # TB DC: flat context, no size offset
    else:
        if prev_csbf == 0:
            s = xp + yp
            ctx = 2 if s == 0 else (1 if s < 3 else 0)
        elif prev_csbf == 1:
            ctx = 2 if yp == 0 else (1 if yp == 1 else 0)
        elif prev_csbf == 2:
            ctx = 2 if xp == 0 else (1 if xp == 1 else 0)
        else:
            ctx = 2
        if c_idx == 0:
            if xs != 0 or ys != 0:
                ctx += 3
            ctx += (9 if scan_idx == 0 else 15) if log2 == 3 else 21
        else:
            ctx += 9 if log2 == 3 else 12
    if c_idx > 0:
        ctx += 27
    return ctx
