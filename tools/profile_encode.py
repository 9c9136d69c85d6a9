"""Stage-level profile of the encoder (tracing/profiling aux subsystem,
SURVEY.md 5.1): wraps the hot pipeline stages with wall timers and prints
a per-stage table after an encode run. No product-code changes — the
stages are monkeypatched here.

Usage: python tools/profile_encode.py [--w 1280] [--h 720] [--frames 16]
       [--preset ultrafast] [--iper 1] [--tiles 8x6] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def wrap(obj, name, key):
    fn = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        TIMES[key] += time.perf_counter() - t0
        COUNTS[key] += 1
        return out

    setattr(obj, name, timed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--preset", default="ultrafast")
    ap.add_argument("--latency", default="offline")
    ap.add_argument("--iper", type=int, default=1)
    ap.add_argument("--tiles", default="8x6")
    ap.add_argument("--qp", type=int, default=27)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ks265codec_tpu.encode import encoder as enc_mod
    from ks265codec_tpu.encode import intra_frame, lookahead
    from ks265codec_tpu.ops import wavefront
    from ks265codec_tpu.encode.config import EncoderConfig
    from ks265codec_tpu.encode.encoder import HevcEncoder
    from ks265codec_tpu.utils.yuv import YUVFrame

    wrap(wavefront.WavefrontIntraCoder, "code_frames", "wf.code_frames")
    wrap(wavefront.WavefrontIntraCoder, "pack", "wf.pack")
    wrap(wavefront.WavefrontIntraCoder, "build_schedule", "wf.build_sched")
    wrap(lookahead.Lookahead, "ensure", "la.ensure")
    wrap(intra_frame, "decide_frame", "decide_frame")
    try:
        from ks265codec_tpu.ops import decide as jdecide
        wrap(jdecide, "decide_frames", "decide_frames")
    except ImportError:
        pass
    wrap(enc_mod.HevcEncoder, "_encode_picture", "encode_picture(total)")
    from ks265codec_tpu import native
    if native.HAVE_NATIVE:
        wrap(native, "write_slice_native", "native.write_slice")

    rng = np.random.RandomState(9)
    H, W = args.h, args.w
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(args.frames):
        y = 128 + 60 * np.sin((xx + 3 * t) / 37.0) + 40 * np.cos(
            (yy - 2 * t) / 29.0)
        y[(yy - 300) ** 2 + (xx - 400 - 20 * t) ** 2 < 90 ** 2] = 210
        y = np.clip(y + rng.randn(H, W) * 3, 0, 255).astype(np.uint8)
        u = np.clip(128 + 30 * np.sin((xx[::2, ::2] + t) / 41.0),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 30 * np.cos((yy[::2, ::2] - t) / 43.0),
                    0, 255).astype(np.uint8)
        frames.append(YUVFrame(y, u, v, poc=t))

    def run():
        enc = HevcEncoder(EncoderConfig(
            width=W, height=H, preset=args.preset, latency=args.latency,
            qp=args.qp, intra_period=args.iper, tiles=args.tiles))
        nb = 0
        for f in frames:
            nb += sum(e.bits for e in enc.encode_frame(f))
        nb += sum(e.bits for e in enc.flush())
        return nb

    run()                               # warm-up (compiles)
    TIMES.clear()
    COUNTS.clear()
    t0 = time.perf_counter()
    run()
    total = time.perf_counter() - t0
    fps = args.frames / total
    print(f"\n== {args.frames}f {W}x{H} {args.preset}/{args.latency} "
          f"iper={args.iper} tiles={args.tiles}: {total:.2f}s "
          f"({fps:.2f} fps) ==")
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        print(f"  {k:<24} {TIMES[k]:8.2f}s  x{COUNTS[k]:<4} "
              f"{100 * TIMES[k] / total:5.1f}%")


if __name__ == "__main__":
    main()
