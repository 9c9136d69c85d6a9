"""Device-resident decoded-picture buffer for the encoder.

Reference pictures are produced ON the device (the coding dispatches
output the final deblocked+SAO'd planes) and consumed ON the device (MC
gathers of the next frames' ME/decide/coding passes). Round-3 re-uploaded
every reference from host numpy each frame (~75 ms per ref per frame over
the device tunnel) and fetched every reconstruction back (~220 ms) — this
class keeps the planes where they live and uploads only when a reference
was produced by a host-path (fallback) frame.

Reference analog: CComRefManagerBase's picture pool (SURVEY.md 2.2), with
storage moved into HBM.
"""

from __future__ import annotations

from functools import partial

import numpy as np


class DeviceDPB:
    """FrameState.serial -> (y, cb, cr) uint8 padded device planes.

    Keyed by the monotonic per-FrameState serial, not id(): CPython ids
    are reused after gc, so a stale entry could silently alias a new
    frame if a caller ever delayed trim()."""

    def __init__(self):
        self.entries: dict[int, tuple] = {}

    def put(self, fs, planes) -> None:
        self.entries[fs.serial] = tuple(planes)

    def get_or_upload(self, fs):
        """Device planes for a reference picture; uploads (once) when the
        frame was reconstructed host-side."""
        key = fs.serial
        planes = self.entries.get(key)
        if planes is None:
            import jax.numpy as jnp
            if hasattr(fs, "ensure_planes"):
                fs.ensure_planes()
            planes = tuple(jnp.asarray(np.asarray(p, np.uint8))
                           for p in (fs.y, fs.cb, fs.cr))
            self.entries[key] = planes
        return planes

    def trim(self, live_fs_ids) -> None:
        """Drop device planes for pictures no longer in the DPB."""
        for k in list(self.entries):
            if k not in live_fs_ids:
                del self.entries[k]


@partial(__import__("jax").jit)
def _stack3(ys, cbs, crs):
    import jax.numpy as jnp
    return jnp.stack(ys), jnp.stack(cbs), jnp.stack(crs)


def stack_refs(dpb: DeviceDPB, ref_pics):
    """(refs_y, refs_cb, refs_cr) device stacks over unique ref pictures
    in ONE dispatch (compiled per ref count)."""
    planes = [dpb.get_or_upload(rp.fs) for rp in ref_pics]
    return _stack3([p[0] for p in planes], [p[1] for p in planes],
                   [p[2] for p in planes])
