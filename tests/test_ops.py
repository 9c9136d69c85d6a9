"""Property tests: JAX/XLA batched ops vs the scalar NumPy oracles
(decode/recon.py) — bit-exact integer semantics on every size class
(SURVEY.md 7.3 hard part #4)."""

import numpy as np
import pytest

from ks265codec_tpu.decode.recon import (dequant, forward_transform,
                                         intra_filter_refs, intra_predict,
                                         inverse_transform)
from ks265codec_tpu.ops import cost as jcost
from ks265codec_tpu.ops import intra as jintra
from ks265codec_tpu.ops import transforms as jt

rng = np.random.RandomState(3)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("is_dst", [False, True])
def test_inverse_transform_batch(log2, is_dst):
    if is_dst and log2 != 2:
        return
    n = 1 << log2
    coeffs = rng.randint(-3000, 3000, (16, n, n)).astype(np.int32)
    got = np.asarray(jt.inverse_transform(coeffs, log2, is_dst))
    for i in range(16):
        want = inverse_transform(coeffs[i], log2, is_dst)
        np.testing.assert_array_equal(got[i], want)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_forward_transform_batch(log2):
    n = 1 << log2
    resi = rng.randint(-255, 256, (16, n, n)).astype(np.int32)
    got = np.asarray(jt.forward_transform(resi, log2, False))
    for i in range(16):
        want = forward_transform(resi[i], log2, False)
        np.testing.assert_array_equal(got[i], want)


@pytest.mark.parametrize("log2", [2, 4])
@pytest.mark.parametrize("qp", [0, 22, 37, 51])
def test_dequant_batch(log2, qp):
    n = 1 << log2
    lv = rng.randint(-200, 200, (8, n, n)).astype(np.int32)
    got = np.asarray(jt.dequantize(lv, qp, log2))
    for i in range(8):
        want = dequant(lv[i], qp, log2)
        np.testing.assert_array_equal(got[i], want)


def test_quant_dequant_roundtrip():
    """fwd -> quant -> dequant -> inv approximates the residual (sanity)."""
    n, log2, qp = 8, 3, 22
    resi = rng.randint(-40, 40, (4, n, n)).astype(np.int32)
    c = jt.forward_transform(resi, log2)
    q = jt.quantize(c, qp, log2)
    d = jt.dequantize(q, qp, log2)
    r = np.asarray(jt.inverse_transform(d, log2))
    err = np.abs(r - resi).mean()
    assert err < 12, f"roundtrip error too large: {err}"


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_intra_all_modes_vs_oracle(n):
    """predict_all_modes == scalar intra_predict for every mode, including
    the reference-filter selection."""
    N = 5
    refs_u = np.zeros((N, 4 * n + 1), np.int32)
    refs_f = np.zeros((N, 4 * n + 1), np.int32)
    lefts, corners, tops = [], [], []
    for b in range(N):
        left = rng.randint(0, 256, 2 * n).astype(np.int32)
        corner = int(rng.randint(0, 256))
        top = rng.randint(0, 256, 2 * n).astype(np.int32)
        lefts.append(left); corners.append(corner); tops.append(top)
        refs_u[b] = np.concatenate([left, [corner], top])
        fl, fc, ft = intra_filter_refs(left, corner, top, n, 18, False)
        # mode arg 18 forces the 3-tap path for n>=8; n==4 returns unfiltered
        refs_f[b] = np.concatenate([fl, [fc], ft])
    got = np.asarray(jintra.predict_all_modes(refs_u, refs_f, n, True))
    assert got.shape == (N, 35, n, n)
    for b in range(N):
        for mode in range(35):
            if jintra.use_filtered_refs(mode, n):
                fl, fc, ft = intra_filter_refs(
                    lefts[b], corners[b], tops[b], n, mode, False)
            else:
                fl, fc, ft = lefts[b], corners[b], tops[b]
            want = intra_predict(mode, fl, fc, ft, n, 8, True)
            np.testing.assert_array_equal(
                got[b, mode], want, err_msg=f"mode {mode} size {n} blk {b}")


def test_intra_chroma_modes():
    n = 8
    N = 3
    refs = rng.randint(0, 256, (N, 4 * n + 1)).astype(np.int32)
    got = np.asarray(jintra.predict_all_modes(refs, refs, n, False))
    for b in range(N):
        left = refs[b, :2 * n]
        corner = int(refs[b, 2 * n])
        top = refs[b, 2 * n + 1:]
        for mode in (0, 1, 10, 26, 34):
            want = intra_predict(mode, left, corner, top, n, 8, False)
            np.testing.assert_array_equal(got[b, mode], want,
                                          err_msg=f"chroma mode {mode}")


def test_sad_satd_shapes():
    a = rng.randint(0, 256, (10, 16, 16)).astype(np.int32)
    b = rng.randint(0, 256, (10, 16, 16)).astype(np.int32)
    s = np.asarray(jcost.sad(a, b))
    np.testing.assert_array_equal(s, np.abs(a - b).sum(axis=(1, 2)))
    t8 = np.asarray(jcost.satd(a, b, 8))
    t4 = np.asarray(jcost.satd(a, b, 4))
    assert t8.shape == (10,) and t4.shape == (10,)
    assert (t8 > 0).all() and (t4 > 0).all()
    # SATD of identical blocks is 0
    assert (np.asarray(jcost.satd(a, a)) == 0).all()


def test_sao_stats_decision_matches_host_oracle():
    """Device-stats SAO decision == all-host loop, exactly (integer sums)."""
    import numpy as np
    from ks265codec_tpu.decode.slice_dec import FrameState
    from ks265codec_tpu.encode.sao import (_decide_from_stats,
                                           decide_sao_host)
    from ks265codec_tpu.hevc.params import SPS
    from ks265codec_tpu.ops.saostats import sao_frame_stats

    rng = np.random.RandomState(5)
    sps = SPS()
    sps.width, sps.height = 140, 72          # non-CTU-aligned
    sps.log2_ctb, sps.log2_min_cb = 6, 3
    for tier in (1, 4):
        fs = FrameState(sps)
        fs.y[:] = rng.randint(0, 256, fs.y.shape)
        fs.cb[:] = rng.randint(0, 256, fs.cb.shape)
        fs.cr[:] = rng.randint(0, 256, fs.cr.shape)
        src_y = np.clip(fs.y + rng.randint(-9, 10, fs.y.shape), 0, 255)
        src_cb = np.clip(fs.cb + rng.randint(-9, 10, fs.cb.shape), 0, 255)
        src_cr = np.clip(fs.cr + rng.randint(-9, 10, fs.cr.shape), 0, 255)
        stats = sao_frame_stats(fs, src_y, src_cb, src_cr)
        got = _decide_from_stats(fs, stats, 30, tier)
        import copy
        got = copy.deepcopy(got)
        want = decide_sao_host(fs, src_y, src_cb, src_cr, 30, tier)
        for ry in range(sps.pic_height_in_ctbs):
            for rx in range(sps.pic_width_in_ctbs):
                g, w = got[ry][rx], want[ry][rx]
                assert (g.type_idx, g.offsets, g.band_pos, g.eo_class) == \
                    (w.type_idx, w.offsets, w.band_pos, w.eo_class), \
                    (tier, ry, rx)
