"""Device deblock kernel vs the host oracle (decode/filters.py)."""

import numpy as np
import pytest

from ks265codec_tpu.decode.filters import deblock_frame
from ks265codec_tpu.decode.slice_dec import MODE_INTRA, FrameState
from ks265codec_tpu.hevc.params import SPS


def _random_intra_state(rng, width, height, qp):
    sps = SPS()
    sps.width = (width + 15) // 16 * 16
    sps.height = (height + 15) // 16 * 16
    sps.log2_ctb, sps.log2_min_cb = 6, 3
    fs = FrameState(sps)
    fs.y[:] = rng.randint(0, 256, fs.y.shape)
    fs.cb[:] = rng.randint(0, 256, fs.cb.shape)
    fs.cr[:] = rng.randint(0, 256, fs.cr.shape)
    # random CU-size map on the 8-cell grid (quadtree-consistent: assign
    # 32/16/8 per aligned 32-block)
    h8, w8 = fs.h4 // 2, fs.w4 // 2
    log2m = np.full((h8, w8), 3, np.uint8)
    for y0 in range(0, h8, 4):
        for x0 in range(0, w8, 4):
            c = rng.randint(0, 3)
            if c == 0:
                log2m[y0:y0 + 4, x0:x0 + 4] = 5
            elif c == 1:
                for yy in range(0, 4, 2):
                    for xx in range(0, 4, 2):
                        log2m[y0 + yy:y0 + yy + 2,
                              x0 + xx:x0 + xx + 2] = \
                            4 if rng.randint(2) else 3
    # edge maps like the intra encoder writes them (TU = CU)
    size8 = (1 << log2m.astype(np.int32)) >> 3
    x8 = np.arange(w8)[None, :]
    y8 = np.arange(h8)[:, None]
    left = (x8 & (size8 - 1)) == 0
    top = (y8 & (size8 - 1)) == 0
    fs.cu_edge_v[:, ::2] = np.repeat(left, 2, 0)
    fs.cu_edge_h[::2, :] = np.repeat(top, 2, 1)
    fs.tu_edge_v[:, ::2] = np.repeat(left, 2, 0)
    fs.tu_edge_h[::2, :] = np.repeat(top, 2, 1)
    fs.pred_mode[:] = MODE_INTRA
    fs.qp[:] = qp
    return fs, log2m


@pytest.mark.parametrize("dims,qp,offs", [
    ((192, 128), 32, (0, 0, 0, 0)),
    ((176, 144), 24, (1, -1, 2, -2)),   # non-aligned + nonzero offsets
    ((64, 64), 45, (0, 0, -3, 3)),
])
def test_device_deblock_matches_oracle(dims, qp, offs):
    from ks265codec_tpu.ops.deblock import (deblock_frame_device,
                                            intra_bs_maps)
    rng = np.random.RandomState(11)
    w, h = dims
    boff, toff, cbo, cro = offs
    fs, log2m = _random_intra_state(rng, w, h, qp)
    y0, cb0, cr0 = fs.y.copy(), fs.cb.copy(), fs.cr.copy()

    deblock_frame(fs, boff, toff, False, cbo, cro)

    bs_v, bs_h = intra_bs_maps(log2m)
    qp4 = np.full((fs.h4, fs.w4), qp, np.uint8)
    dy, dcb, dcr = deblock_frame_device(
        y0.astype(np.int32), cb0.astype(np.int32), cr0.astype(np.int32),
        bs_v, bs_h, qp4, boff, toff, cbo, cro, fs.sps.width,
        fs.sps.height)
    assert (np.asarray(dy) == fs.y).all(), \
        np.argwhere(np.asarray(dy) != fs.y)[:5]
    assert (np.asarray(dcb) == fs.cb).all()
    assert (np.asarray(dcr) == fs.cr).all()


def test_intra_bs_maps_matches_compute_bs():
    from ks265codec_tpu.decode.filters import compute_bs
    from ks265codec_tpu.ops.deblock import intra_bs_maps
    rng = np.random.RandomState(7)
    fs, log2m = _random_intra_state(rng, 192, 128, 30)
    bs_v, bs_h = intra_bs_maps(log2m)
    assert (bs_v == compute_bs(fs, True)).all()
    assert (bs_h == compute_bs(fs, False)).all()
