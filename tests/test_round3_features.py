"""Round-3 feature tests: vectorized SAO decision vs the scalar oracle,
sparse coefficient packing, cvbr/cvq rate-control modes, VUI dump, and the
multi-sequence CLI batch."""

import numpy as np
import pytest

from ks265codec_tpu.decode.slice_dec import SaoCtuParam
from ks265codec_tpu.encode import sao as S
from ks265codec_tpu.encode.config import (RC_CVBR, RC_CVQ, EncoderConfig)
from ks265codec_tpu.encode.encoder import encode_sequence
from ks265codec_tpu.utils.yuv import YUVFrame


class _FS:
    def __init__(self, ncty, nctx):
        class SP:
            pass

        self.sps = SP()
        self.sps.pic_height_in_ctbs = ncty
        self.sps.pic_width_in_ctbs = nctx
        self.sao = [[SaoCtuParam() for _ in range(nctx)]
                    for _ in range(ncty)]


def test_sao_decide_vectorized_matches_scalar_oracle():
    rng = np.random.RandomState(7)
    for trial in range(6):
        ncty, nctx = 3, 4
        stats = []
        for _ in range(3):
            eo_cnt = rng.randint(0, 2000, (4, 5, ncty, nctx)).astype(
                np.int32)
            eo_err = rng.randint(-6000, 6000,
                                 (4, 5, ncty, nctx)).astype(np.int32)
            bo_cnt = rng.randint(0, 3000, (32, ncty, nctx)).astype(np.int32)
            bo_err = rng.randint(-9000, 9000,
                                 (32, ncty, nctx)).astype(np.int32)
            eo_cnt[rng.rand(*eo_cnt.shape) < 0.3] = 0
            bo_cnt[rng.rand(*bo_cnt.shape) < 0.3] = 0
            stats.append((eo_cnt, eo_err, bo_cnt, bo_err))
        qp = int(rng.randint(20, 45))
        tier = (1, 3, 4)[trial % 3]
        f1, f2 = _FS(ncty, nctx), _FS(ncty, nctx)
        S._decide_from_stats(f1, stats, qp, tier)
        S._decide_from_stats_ref(f2, stats, qp, tier)
        for ry in range(ncty):
            for rx in range(nctx):
                a, b = f1.sao[ry][rx], f2.sao[ry][rx]
                for c in range(3):
                    assert a.type_idx[c] == b.type_idx[c]
                    assert a.band_pos[c] == b.band_pos[c]
                    assert a.eo_class[c] == b.eo_class[c]
                    assert list(a.offsets[c])[:4] == list(b.offsets[c])[:4]


def test_sparse_coeff_pack_roundtrip():
    import jax.numpy as jnp

    from ks265codec_tpu.ops.wavefront import (pack_coeffs_sparse,
                                              unpack_coeffs_sparse)
    rng = np.random.RandomState(3)
    M, cap = 4096, 1024
    flat = np.zeros(M, np.int16)
    nz = rng.choice(M, 700, replace=False)
    vals = rng.randint(-200, 200, 700).astype(np.int16)
    vals[vals == 0] = 7         # keep exactly the chosen positions nonzero
    flat[nz] = vals
    parts, _ = pack_coeffs_sparse(jnp.asarray(flat), cap)
    row = np.asarray(jnp.concatenate(parts))
    off = [0]

    def take(dtype, shape):
        n = int(np.prod(shape))
        a = np.frombuffer(row, dtype, n, off[0]).reshape(shape)
        off[0] += n * np.dtype(dtype).itemsize
        return a

    out = unpack_coeffs_sparse(take, M, cap)
    assert np.array_equal(out, flat)


def _clip(n=6, W=96, H=64):
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(n):
        y = np.clip(120 + 50 * np.sin((xx + 4 * t) / 17.0)
                    + rng.randn(H, W) * 2, 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 136, np.uint8)
        out.append(YUVFrame(y, u, v))
    return out


@pytest.mark.parametrize("rc", [RC_CVBR, RC_CVQ])
def test_cvbr_cvq_roundtrip(rc):
    frames = _clip()
    cfg = EncoderConfig(width=96, height=64, preset="veryfast",
                        latency="zerolatency", rc=rc, bitrate_kbps=200,
                        crf=30.0, intra_period=0, frame_rate=25)
    bs, recons = encode_sequence(frames, cfg)
    from ks265codec_tpu.decode.decoder import HevcDecoder
    dec = HevcDecoder().decode_all(bs)
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert d.tobytes() == r.tobytes()


def test_vui_dump():
    frames = _clip(1)
    cfg = EncoderConfig(width=96, height=64, preset="ultrafast", qp=30,
                        intra_period=1, frame_rate=25)
    bs, _ = encode_sequence(frames, cfg)
    from ks265codec_tpu.decode.decoder import HevcDecoder
    dec = HevcDecoder()
    dec.decode_all(bs)
    s = dec.dump_vui_parameters()
    assert "VUI" in s and "timing" in s and "25" in s


def test_cli_seqlist(tmp_path):
    from ks265codec_tpu.cli.app_encoder import main
    from ks265codec_tpu.utils.yuv import write_yuv
    raw = tmp_path / "in.yuv"
    write_yuv(str(raw), _clip(2))
    lst = tmp_path / "seqs.txt"
    lst.write_text("-qp 30\n-qp 36\n")
    out = tmp_path / "out.265"
    rc = main(["-i", str(raw), "-b", str(out), "-wdt", "96", "-hgt", "64",
               "-frms", "2", "-preset", "ultrafast", "-iper", "1",
               "-seqlist", str(lst)])
    assert rc == 0
    assert out.exists()