"""Stream anatomy: decode an HEVC stream with the framework decoder and
report syntax statistics — CU-size / luma-mode / chroma-mode histograms,
nonzero-coefficient counts per plane, level sums. Compares streams side by
side to localize RD gaps against the reference encoder.

Usage: python tools/stream_stats.py a.265 [b.265]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("KS265_RD_TPU") != "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def analyze(data: bytes) -> dict:
    import ks265codec_tpu.decode.slice_dec as SD
    from ks265codec_tpu.decode.decoder import HevcDecoder

    st = dict(cu=Counter(), lmode=Counter(), cmode=Counter(),
              nz=Counter(), inter=Counter(), frames=0)
    orig_res = SD.SliceDecoder._residual

    def wrap_res(self, x0, y0, log2, c_idx, intra_mode):
        r = orig_res(self, x0, y0, log2, c_idx, intra_mode)
        plane = ("y", "cb", "cr")[c_idx]
        try:
            coeffs = r[0] if isinstance(r, tuple) else r
            a = np.abs(np.asarray(coeffs))
            st["nz"][plane] += int((a > 0).sum())
            st["nz"][plane + "_sum"] += int(a.sum())
        except Exception:
            pass
        return r

    orig_cu = SD.SliceDecoder._parse_cu

    def wrap_cu(self, x0, y0, log2, depth):
        r = orig_cu(self, x0, y0, log2, depth)
        x4, y4 = x0 >> 2, y0 >> 2
        if self.fs.pred_mode[y4, x4] == 1:
            st["cu"][1 << log2] += 1
            lm = int(self.fs.intra_mode[y4, x4])
            st["lmode"][lm] += 1
            cm = int(self._cu_chroma_mode)
            st["cmode"]["dm" if cm == lm else cm] += 1
        else:
            st["cu"][-(1 << log2)] += 1
            if self.fs.skip[y4, x4]:
                st["inter"]["skip"] += 1
            else:
                st["inter"]["coded"] += 1
        return r

    orig_mvd = SD.SliceDecoder._parse_mvd

    def wrap_mvd(self):
        r = orig_mvd(self)
        st["inter"]["n_mvd"] += 1
        st["inter"]["mvd_sum"] += abs(r[0]) + abs(r[1])
        return r

    SD.SliceDecoder._residual = wrap_res
    SD.SliceDecoder._parse_cu = wrap_cu
    SD.SliceDecoder._parse_mvd = wrap_mvd
    try:
        d = HevcDecoder()
        out = d.decode_all(data)
        st["frames"] = len(out)
    finally:
        SD.SliceDecoder._residual = orig_res
        SD.SliceDecoder._parse_cu = orig_cu
        SD.SliceDecoder._parse_mvd = orig_mvd
    st["bits"] = len(data) * 8
    return st


def report(st, label):
    print(f"== {label}: {st['bits']} bits, {st['frames']} frames")
    total = sum(st["cu"].values()) or 1
    print("  CU sizes:", {k: f"{100*v/total:.0f}%"
                          for k, v in sorted(st["cu"].items())})
    print("  top luma modes:", st["lmode"].most_common(8))
    print("  chroma modes:", dict(st["cmode"]))
    print("  coeffs:", {k: v for k, v in sorted(st["nz"].items())})
    if st["inter"]:
        print("  inter:", dict(st["inter"]))


if __name__ == "__main__":
    report(analyze(open(sys.argv[1], "rb").read()), sys.argv[1])
    if len(sys.argv) > 2:
        report(analyze(open(sys.argv[2], "rb").read()), sys.argv[2])
