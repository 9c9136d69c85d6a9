"""YUV 4:2:0 planar I/O and frame padding.

Mirrors the capabilities of the reference's ComYUV utilities
(SURVEY.md 2.2: initYUV/CopyYUV/readYUVFromFile/dumpYUV2File/expandPicture),
re-designed for TPU: frames are stored as NumPy/JAX arrays padded to the CTU
grid so every Pallas kernel sees static, tile-aligned shapes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class YUVFrame:
    """One 8-bit 4:2:0 frame. Planes are unpadded (width x height exact)."""

    y: np.ndarray  # (H, W) uint8
    u: np.ndarray  # (H/2, W/2) uint8
    v: np.ndarray  # (H/2, W/2) uint8
    poc: int = 0
    pts: int = 0

    @property
    def width(self) -> int:
        return self.y.shape[1]

    @property
    def height(self) -> int:
        return self.y.shape[0]

    def tobytes(self) -> bytes:
        return self.y.tobytes() + self.u.tobytes() + self.v.tobytes()


class LazyYUV:
    """YUVFrame-shaped view whose planes materialize on first access.

    Backs EncodedFrame.recon on the batched device path: the final
    reconstruction stays on the TPU (the ~2 MB/frame fetch through the
    device tunnel dominated the encode budget) and is pulled only when a
    consumer actually reads the pixels (tests, -o recon dump, PSNR)."""

    def __init__(self, fetch, poc: int = 0, pts: int = 0):
        self._fetch = fetch
        self._p = None
        self.poc = poc
        self.pts = pts

    def _mat(self):
        if self._p is None:
            self._p = self._fetch()
            self._fetch = None
        return self._p

    @property
    def y(self):
        return self._mat()[0]

    @property
    def u(self):
        return self._mat()[1]

    @property
    def v(self):
        return self._mat()[2]

    @property
    def width(self):
        return self.y.shape[1]

    @property
    def height(self):
        return self.y.shape[0]

    def tobytes(self) -> bytes:
        y, u, v = self._mat()
        return y.tobytes() + u.tobytes() + v.tobytes()


def frame_size_bytes(width: int, height: int) -> int:
    return width * height * 3 // 2


def read_yuv(path: str, width: int, height: int, num_frames: int | None = None,
             start: int = 0) -> list[YUVFrame]:
    """Read 8-bit I420 frames from a raw file."""
    fsz = frame_size_bytes(width, height)
    total = os.path.getsize(path) // fsz
    if num_frames is None:
        num_frames = total - start
    num_frames = min(num_frames, total - start)
    frames = []
    cw, ch = width // 2, height // 2
    with open(path, "rb") as f:
        f.seek(start * fsz)
        for i in range(num_frames):
            buf = f.read(fsz)
            if len(buf) < fsz:
                break
            y = np.frombuffer(buf, np.uint8, width * height, 0).reshape(height, width)
            u = np.frombuffer(buf, np.uint8, cw * ch, width * height).reshape(ch, cw)
            v = np.frombuffer(buf, np.uint8, cw * ch, width * height + cw * ch).reshape(ch, cw)
            frames.append(YUVFrame(y.copy(), u.copy(), v.copy(), poc=start + i))
    return frames


def write_yuv(path: str, frames: list[YUVFrame], append: bool = False) -> None:
    mode = "ab" if append else "wb"
    with open(path, mode) as f:
        for fr in frames:
            f.write(fr.tobytes())


def pad_to_multiple(plane: np.ndarray, mult_h: int, mult_w: int,
                    mode: str = "edge") -> np.ndarray:
    """Pad a plane on the bottom/right to multiples of (mult_h, mult_w).

    Edge replication matches HEVC's conformance-window semantics: the encoder
    codes the padded size and the decoder crops (reference: expandPicture_c).
    """
    h, w = plane.shape
    ph = (mult_h - h % mult_h) % mult_h
    pw = (mult_w - w % mult_w) % mult_w
    if ph == 0 and pw == 0:
        return plane
    return np.pad(plane, ((0, ph), (0, pw)), mode=mode)


def expand_picture(plane: np.ndarray, margin: int) -> np.ndarray:
    """Edge-extend a plane by `margin` on all sides (for unrestricted MC).

    TPU design note: on device we instead clamp gather indices inside the MC
    kernel, so this host-side expansion is only used by the NumPy reference
    model.
    """
    return np.pad(plane, margin, mode="edge")
