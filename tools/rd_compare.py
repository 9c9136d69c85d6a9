"""RD harness: ours vs the reference appencoder at matched QPs.

Encodes the same synthetic clip with both encoders across a QP sweep and
reports bits + PSNR (overall and split by frame type), tracking the
compression-efficiency gap (VERDICT round 1: 2.45-2.70x bits at lower PSNR;
target <= 1.3x at equal PSNR).

Usage: python tools/rd_compare.py [--w 320] [--h 192] [--frames 10]
       [--qps 27,32,37] [--preset medium] [--latency offline] [--iper 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import stat
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("KS265_RD_TPU") != "1":
    import jax
    jax.config.update("jax_platforms", "cpu")   # env var is ignored here

REF = Path("/root/reference/ubuntu_x64")
WORK = Path("/tmp/ks265_rd")


def synth(W, H, N, seed=11):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(N):
        y = (120 + 55 * np.sin((xx + 5 * t) / 29.0)
             + 35 * np.cos((yy - 3 * t) / 23.0))
        y[(yy - H // 2) ** 2 + (xx - W // 3 - 7 * t) ** 2 < (H // 5) ** 2] = 215
        y[(yy - H // 3 + 2 * t) ** 2 + (xx - 2 * W // 3) ** 2 < (H // 7) ** 2] = 60
        y = np.clip(y + rng.randn(H, W) * 2.5, 0, 255).astype(np.uint8)
        u = np.clip(128 + 27 * np.sin((xx[::2, ::2] + 3 * t) / 37.0),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 27 * np.cos((yy[::2, ::2] - 2 * t) / 41.0),
                    0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def psnr_frames(frames, recons):
    se = n = 0.0
    for (y, u, v), r in zip(frames, recons):
        for a, b in ((y, r[0]), (u, r[1]), (v, r[2])):
            se += np.sum((a.astype(np.float64) - b.astype(np.float64)) ** 2)
            n += a.size
    mse = se / n
    return 99.99 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def run_reference(frames, W, H, qp, preset, latency, iper):
    WORK.mkdir(parents=True, exist_ok=True)
    for b in ("appencoder", "appdecoder"):
        dst = WORK / b
        if not dst.exists():
            shutil.copy(REF / b, dst)
            dst.chmod(dst.stat().st_mode | stat.S_IXUSR)
    raw = WORK / "in.yuv"
    with open(raw, "wb") as f:
        for (y, u, v) in frames:
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    # key every varying knob into the filename — a bare ref_q{qp} name
    # let interleaved runs with different preset/iper reuse stale streams
    bs = WORK / f"ref_q{qp}_{preset}_{latency}_i{iper}.265"
    t0 = time.time()
    subprocess.run(
        [str(WORK / "appencoder"), "-i", str(raw), "-wdt", str(W), "-hgt",
         str(H), "-frms", str(len(frames)), "-fr", "30", "-b", str(bs),
         "-threads", "1", "-preset", preset, "-latency", latency,
         "-rc", "0", "-qp", str(qp), "-iper", str(iper)],
        check=True, capture_output=True, cwd=str(WORK))
    dt = time.time() - t0
    dec = bs.with_suffix(".dec.yuv")   # unique per config: concurrent
    #                                    runs share WORK
    subprocess.run([str(WORK / "appdecoder"), "-b", str(bs), "-o", str(dec),
                    "-threads", "1"], check=True, capture_output=True,
                   cwd=str(WORK))
    data = dec.read_bytes()
    fsz = W * H * 3 // 2
    recons = []
    for i in range(len(frames)):
        off = i * fsz
        recons.append((
            np.frombuffer(data, np.uint8, W * H, off).reshape(H, W),
            np.frombuffer(data, np.uint8, W * H // 4, off + W * H).reshape(H // 2, W // 2),
            np.frombuffer(data, np.uint8, W * H // 4, off + W * H * 5 // 4).reshape(H // 2, W // 2)))
    return bs.stat().st_size * 8, psnr_frames(frames, recons), dt


def run_ours(frames, W, H, qp, preset, latency, iper, opts=None):
    from ks265codec_tpu.encode.config import EncoderConfig
    from ks265codec_tpu.encode.encoder import HevcEncoder
    from ks265codec_tpu.utils.yuv import YUVFrame
    yuv = [YUVFrame(y, u, v, poc=i) for i, (y, u, v) in enumerate(frames)]
    cfg = EncoderConfig(width=W, height=H, preset=preset, latency=latency,
                        qp=qp, intra_period=iper, **(opts or {}))
    enc = HevcEncoder(cfg)
    t0 = time.time()
    bs = b""
    efs = []
    for f in yuv:
        for ef in enc.encode_frame(f):
            bs += ef.data
            efs.append(ef)
    for ef in enc.flush():
        bs += ef.data
        efs.append(ef)
    dt = time.time() - t0
    efs.sort(key=lambda e: e.display_idx)
    recons = [(e.recon.y, e.recon.u, e.recon.v) for e in efs]
    by_type = {}
    for e in efs:
        b, c = by_type.get(e.slice_type, (0, 0))
        by_type[e.slice_type] = (b + e.bits, c + 1)
    return len(bs) * 8, psnr_frames(frames, recons), dt, by_type


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--h", type=int, default=192)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--qps", default="27,32,37")
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--latency", default="offline")
    ap.add_argument("--iper", type=int, default=32)
    ap.add_argument("--ours-opts", default="",
                    help="extra EncoderConfig fields for OUR side only, "
                         "k=v comma list (int/float/str coerced)")
    args = ap.parse_args()
    opts = {}
    for kv in filter(None, args.ours_opts.split(",")):
        k, v = kv.split("=", 1)
        try:
            opts[k] = int(v)
        except ValueError:
            try:
                opts[k] = float(v)
            except ValueError:
                opts[k] = v
    frames = synth(args.w, args.h, args.frames)
    rows = []
    for qp in [int(q) for q in args.qps.split(",")]:
        rb, rp, rt = run_reference(frames, args.w, args.h, qp, args.preset,
                                   args.latency, args.iper)
        ob, op, ot, by_type = run_ours(frames, args.w, args.h, qp,
                                       args.preset, args.latency, args.iper,
                                       opts)
        row = dict(qp=qp, ref_bits=rb, ref_psnr=round(rp, 3),
                   ours_bits=ob, ours_psnr=round(op, 3),
                   bits_ratio=round(ob / rb, 3),
                   dpsnr=round(op - rp, 3),
                   by_type={k: (v[0], v[1]) for k, v in by_type.items()},
                   ref_fps=round(len(frames) / rt, 2),
                   ours_fps=round(len(frames) / ot, 2))
        rows.append(row)
        print(json.dumps(row))
    avg = np.mean([r["bits_ratio"] for r in rows])
    print(json.dumps({"summary_bits_ratio": round(float(avg), 3)}))


if __name__ == "__main__":
    main()
