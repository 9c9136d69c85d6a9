"""Device inter engine: MC bit-exactness, vectorized merge/AMVP vs the
MotionDeriver oracle, and end-to-end conformance of engine-coded P/B
streams (our decoder + the reference appdecoder)."""

import numpy as np
import pytest

from ks265codec_tpu.decode.inter import (MotionDeriver, combine_bi,
                                         combine_uni, interp_chroma,
                                         interp_luma)
from ks265codec_tpu.encode.config import EncoderConfig
from ks265codec_tpu.encode.encoder import encode_sequence
from ks265codec_tpu.encode.merge_vec import (RefCtx, amvp_vec,
                                             field_from_fs,
                                             merge_lists_vec, zscan_vals)
from ks265codec_tpu.ops.mc import mc_planes
from ks265codec_tpu.utils.yuv import YUVFrame


def synth(W, H, N, seed=11, newobj=False):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(N):
        y = (120 + 55 * np.sin((xx + 5 * t) / 29.0)
             + 35 * np.cos((yy - 3 * t) / 23.0))
        y[(yy - H // 2) ** 2 + (xx - W // 3 - 7 * t) ** 2
          < (H // 5) ** 2] = 215
        if newobj and t >= N // 2:
            # uncovered content: forces intra CUs inside inter frames
            rng2 = np.random.RandomState(100 + t)
            y[: H // 3, : W // 3] = rng2.randint(0, 255,
                                                 (H // 3, W // 3))
        y = np.clip(y + rng.randn(H, W) * 2.5, 0, 255).astype(np.uint8)
        u = np.clip(128 + 27 * np.sin((xx[::2, ::2] + 3 * t) / 37.0),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 27 * np.cos((yy[::2, ::2] - 2 * t) / 41.0),
                    0, 255).astype(np.uint8)
        out.append(YUVFrame(y, u, v))
    return out


# ------------------------------------------------------------------- MC

def test_mc_bit_exact_vs_oracle():
    rng = np.random.RandomState(3)
    ph, pw = 64, 128
    pic_w, pic_h = 120, 56
    R = 3
    refs_y = rng.randint(0, 256, (R, ph, pw)).astype(np.int32)
    refs_cb = rng.randint(0, 256, (R, ph // 2, pw // 2)).astype(np.int32)
    refs_cr = rng.randint(0, 256, (R, ph // 2, pw // 2)).astype(np.int32)
    h8, w8 = ph // 8, pw // 8
    slot0 = rng.randint(-1, R, (h8, w8)).astype(np.int32)
    slot1 = rng.randint(-1, R, (h8, w8)).astype(np.int32)
    slot0[(slot0 < 0) & (slot1 < 0)] = 0
    mv0 = rng.randint(-40, 40, (h8, w8, 2)).astype(np.int32)
    mv1 = rng.randint(-40, 40, (h8, w8, 2)).astype(np.int32)
    py, pcb, pcr = mc_planes(refs_y, refs_cb, refs_cr, slot0, mv0,
                             slot1, mv1, pic_w=pic_w, pic_h=pic_h)
    for r in range(h8):
        for c in range(w8):
            x0, y0 = c * 8, r * 8
            preds, cpreds = [], []
            for sl, mv in ((slot0, mv0), (slot1, mv1)):
                s = sl[r, c]
                if s < 0:
                    continue
                preds.append(interp_luma(refs_y[s], x0, y0, 8, 8,
                                         mv[r, c, 0], mv[r, c, 1],
                                         pic_w, pic_h))
                cpreds.append(interp_chroma(refs_cb[s], x0 // 2, y0 // 2,
                                            4, 4, mv[r, c, 0], mv[r, c, 1],
                                            pic_w // 2, pic_h // 2))
            if len(preds) == 2:
                ey = combine_bi(preds[0], preds[1])
                ecb = combine_bi(cpreds[0], cpreds[1])
            else:
                ey = combine_uni(preds[0])
                ecb = combine_uni(cpreds[0])
            assert np.array_equal(py[y0:y0 + 8, x0:x0 + 8].astype(int), ey)
            assert np.array_equal(
                pcb[y0 // 2:y0 // 2 + 4, x0 // 2:x0 // 2 + 4].astype(int),
                ecb)


# ------------------------------------------- merge/AMVP property test

class _FS:
    def __init__(self, h4, w4, rng, nref0, nref1):
        self.h4, self.w4 = h4, w4
        self.pred_mode = (rng.rand(h4, w4) < 0.2).astype(np.int8)
        self.ref_idx = np.full((2, h4, w4), -1, np.int8)
        self.mv = np.zeros((2, h4, w4, 2), np.int32)
        self.ref_poc = np.zeros((2, h4, w4), np.int32)
        self.ref_lt = np.zeros((2, h4, w4), bool)
        self.mi_parsed = np.zeros((h4, w4), bool)
        self.slice_id = np.zeros((h4, w4), np.int32)
        for l, nref in ((0, nref0), (1, nref1)):
            if nref == 0:
                continue
            ri = rng.randint(-1, nref, (h4 // 2, w4 // 2))
            mv = rng.randint(-32, 32, (h4 // 2, w4 // 2, 2))
            self.ref_idx[l] = np.repeat(np.repeat(ri, 2, 0), 2, 1)
            self.mv[l] = np.repeat(np.repeat(mv, 2, 0), 2, 1)
        off = (self.ref_idx[0] < 0) & (self.ref_idx[1] < 0)
        self.ref_idx[0][off & (self.pred_mode == 0)] = 0
        self.mv[0][self.ref_idx[0] < 0] = 0
        self.mv[1][self.ref_idx[1] < 0] = 0


class _RP:
    def __init__(self, fs, poc, lt=False):
        self.fs, self.poc, self.is_long_term = fs, poc, lt


def test_merge_amvp_vec_matches_motion_deriver():
    class O:
        pass

    rng = np.random.RandomState(5)
    W = H = 128
    h4 = w4 = H // 4
    sps = O()
    sps.width, sps.height, sps.log2_ctb = W, H, 6
    pps = O()
    pps.log2_parallel_merge_level = 2
    for trial in range(4):
        is_b = trial % 2 == 1
        nref0, nref1 = (2, 2) if is_b else (3, 0)
        refs0 = [_RP(_FS(h4, w4, rng, 2, 2 if is_b else 0), 7 - i)
                 for i in range(nref0)]
        refs1 = [_RP(_FS(h4, w4, rng, 2, 2), 9 + i) for i in range(nref1)]
        for refs in (refs0, refs1):
            for rp in refs:
                for ll in range(2):
                    m = rp.fs.ref_idx[ll] >= 0
                    rp.fs.ref_poc[ll][m] = rp.poc - rng.randint(1, 4)
        hdr = O()
        hdr.slice_type = 0 if is_b else 1
        hdr.max_num_merge_cand = 5
        hdr.poc = 8
        hdr.temporal_mvp_enabled = trial >= 2
        hdr.collocated_from_l0 = 1
        hdr.collocated_ref_idx = 0
        fs = _FS(h4, w4, rng, nref0, nref1)
        for l, refs in ((0, refs0), (1, refs1)):
            for i, rp in enumerate(refs):
                fs.ref_poc[l][fs.ref_idx[l] == i] = rp.poc
        ref_lists = [refs0, refs1]
        zv = zscan_vals(h4, w4, 6)
        region4 = np.zeros((h4, w4), np.int64)
        col = refs0[0] if hdr.temporal_mvp_enabled else None
        ctx = RefCtx(ref_lists, hdr, sps, col)
        field = field_from_fs(fs)
        md = MotionDeriver(fs, sps, pps, hdr, ref_lists, 0)
        for n in (8, 16, 32):
            xs = rng.randint(0, W // n, 20) * n
            ys = rng.randint(0, H // n, 20) * n
            lists = merge_lists_vec(field, ctx, xs, ys, n, zv, region4,
                                    W, H)
            for b in range(len(xs)):
                x0, y0 = int(xs[b]), int(ys[b])
                fs.mi_parsed[:] = zv < zv[y0 >> 2, x0 >> 2]
                cands = md.merge_candidates(x0, y0, n, x0, y0, n, n, 0, 0)
                ref = np.array([[c.ref_idx[0], c.ref_idx[1],
                                 c.mv[0][0], c.mv[0][1],
                                 c.mv[1][0], c.mv[1][1]] for c in cands],
                               np.int32)
                assert np.array_equal(ref, lists[b]), (trial, n, x0, y0)
                for lst in range(2 if is_b else 1):
                    if not ref_lists[lst]:
                        continue
                    ridx = rng.randint(0, len(ref_lists[lst]))
                    a = md.amvp_candidates(x0, y0, n, x0, y0, n, n, 0,
                                           lst, ridx)
                    av = amvp_vec(field, ctx, xs[b:b + 1], ys[b:b + 1], n,
                                  lst, np.array([ridx]), zv, region4,
                                  W, H)[0]
                    assert np.array_equal(np.array(a, np.int32), av), \
                        (trial, n, lst, ridx, x0, y0)


# ------------------------------------------------- end-to-end streams

def _roundtrip(cfg, frames, tmp_path):
    import subprocess

    from conftest import _ref_bin, have_reference

    import ks265codec_tpu.encode.inter_engine as eng
    from ks265codec_tpu.decode.decoder import HevcDecoder
    ran = [0]
    orig = eng.run_engine

    def spy(enc):
        ran[0] += 1
        return orig(enc)

    eng.run_engine = spy
    try:
        bs, recons = encode_sequence(frames, cfg)
    finally:
        eng.run_engine = orig
    assert ran[0] > 0, "device inter engine was not used"
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(recons)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert d.tobytes() == r.tobytes(), f"own decode differs at {i}"
    if have_reference():
        bsf = tmp_path / "eng.265"
        bsf.write_bytes(bs)
        outf = tmp_path / "eng_dec.yuv"
        r = subprocess.run([str(_ref_bin("appdecoder")), "-b", str(bsf),
                            "-o", str(outf), "-threads", "1"],
                           capture_output=True, text=True)
        assert r.returncode == 0, f"appdecoder failed: {r.stdout}"
        want = b"".join(rc.tobytes() for rc in recons)
        assert outf.read_bytes() == want, "reference decode differs"


@pytest.mark.parametrize("preset,latency,iper", [
    ("veryfast", "zerolatency", 0),
    ("fast", "offline", 32),
])
def test_engine_streams_decode_under_appdecoder(tmp_path, preset,
                                                latency, iper):
    W, H = 128, 96
    frames = synth(W, H, 8)
    cfg = EncoderConfig(width=W, height=H, preset=preset, latency=latency,
                        qp=30, rc=0, intra_period=iper, frame_rate=25)
    _roundtrip(cfg, frames, tmp_path)


def test_engine_intra_in_inter(tmp_path):
    """Uncovered content forces intra CUs inside P/B frames: exercises
    the seeded intra wavefront inside the inter coding dispatch."""
    W, H = 128, 96
    frames = synth(W, H, 6, newobj=True)
    cfg = EncoderConfig(width=W, height=H, preset="fast",
                        latency="zerolatency", qp=28, rc=0,
                        intra_period=0, frame_rate=25)
    _roundtrip(cfg, frames, tmp_path)
