"""Standalone conformance-compare harness (CompareToHM analog,
SURVEY.md 2.5: CompareToHM::CompareRecYuvToHmOneComponet compiled into
both reference apps).

Compares two raw I420 YUV files frame-by-frame, component-by-component,
printing the first mismatch position per frame and a pass/fail summary.
Typical uses:
  - our encoder recon vs a reference-decoder (HM/appdecoder) decode of
    our stream:   python tools/compare_to_hm.py rec.yuv hmdec.yuv -wdt W -hgt H
  - our decoder output vs appdecoder output on the same stream.
Exit code 0 on bit-exact match, 1 otherwise.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("hm")
    ap.add_argument("-wdt", type=int, required=True)
    ap.add_argument("-hgt", type=int, required=True)
    ap.add_argument("-frms", type=int, default=0,
                    help="max frames (0 = all)")
    a = ap.parse_args(argv)
    w, h = a.wdt, a.hgt
    fsz = w * h * 3 // 2
    comps = (("Y", w * h, h, w), ("U", w * h // 4, h // 2, w // 2),
             ("V", w * h // 4, h // 2, w // 2))
    bad = 0
    n = 0
    with open(a.ours, "rb") as fo, open(a.hm, "rb") as fh:
        while True:
            bo = fo.read(fsz)
            bh = fh.read(fsz)
            if len(bo) < fsz or len(bh) < fsz:
                if len(bo) != len(bh):
                    print(f"length mismatch at frame {n}: "
                          f"{len(bo)} vs {len(bh)} bytes")
                    bad += 1
                break
            off = 0
            for name, sz, ch, cw in comps:
                po = np.frombuffer(bo, np.uint8, sz, off).reshape(ch, cw)
                ph = np.frombuffer(bh, np.uint8, sz, off).reshape(ch, cw)
                if not np.array_equal(po, ph):
                    d = po.astype(int) - ph.astype(int)
                    ys, xs = np.nonzero(d)
                    print(f"frame {n} {name}: {len(ys)} mismatching "
                          f"samples, first at ({ys[0]},{xs[0]}) "
                          f"(ours {po[ys[0], xs[0]]} vs {ph[ys[0], xs[0]]})"
                          f", maxdiff {np.abs(d).max()}")
                    bad += 1
                off += sz
            n += 1
            if a.frms and n >= a.frms:
                break
    if bad:
        print(f"H265EncodeTest: {bad} component mismatches over "
              f"{n} frames -- FAILED")
        return 1
    print(f"compared {n} frames: bit-exact -- H265 compare passed!!!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
