"""GOP sharding: encode disjoint closed GOPs on separate devices.

A closed GOP (IDR .. IDR-1, -iper semantics of qy265enc.h:82) references
nothing outside itself, so GOPs are embarrassingly parallel — the
reference exploits frame parallelism inside one process (CEncTaskManageFpp);
on a TPU pod the same idea lifts to GOP granularity across chips and to
hosts across DCN. Each shard runs a full encoder whose device dispatches
(ME, decide, coding — the inter engine) land on its assigned device via
jax.default_device; the host muxes per-GOP NALs back in DTS order (the
CEncOutputBsFpp analog — trivial here because GOP-major order IS decode
order).

Rate control: fixed-QP and CRF are GOP-stationary (bit-identical to the
serial encode, asserted by tests/test_multichip.py). ABR/CBR run but are
approximate at GOP grain: each shard's controller independently targets
the global bits/sec over its own GOP window (correct on average for
equal-duration GOPs) — cross-GOP bit redistribution and VBV buffer
continuity across joins are NOT enforced, so CBR+VBV output may violate
the buffer model at GOP boundaries; a warning is logged. The full
CEncRcAbrSync-style stale-state exchange is future work.
"""

from __future__ import annotations

from dataclasses import replace


def encode_gops_sharded(frames, cfg, devices=None):
    """Encode `frames` (display order YUVFrame list) with closed GOPs of
    cfg.intra_period frames sharded round-robin over `devices`.

    Returns (annexb bytes, list of EncodedFrame in coding order)."""
    import jax

    from ..encode.config import RC_CBR, RC_ABR
    from ..encode.encoder import HevcEncoder

    devices = list(devices if devices is not None else jax.devices())
    iper = int(cfg.intra_period)
    if iper <= 0:
        raise ValueError("GOP sharding requires closed GOPs (-iper N > 0)")
    if cfg.rc in (RC_CBR, RC_ABR):
        from ..utils.log import log
        log(2, "GOP sharding with rc=%d: per-shard controllers are "
            "independent — VBV continuity across GOP joins is not "
            "enforced" % cfg.rc)
    chunks = [frames[i:i + iper] for i in range(0, len(frames), iper)]

    def encode_shard(gi, chunk):
        dev = devices[gi % len(devices)]
        # fresh config per shard: HevcEncoder/resolve_preset mutate it
        shard_cfg = replace(cfg)
        with jax.default_device(dev):
            enc = HevcEncoder(shard_cfg)
            efs = []
            for f in chunk:
                efs.extend(enc.encode_frame(f))
            efs.extend(enc.flush())
        base = gi * iper
        for ef in efs:
            ef.display_idx += base      # global display indices
            ef.pts += base
            ef.dts += base      # coded-picture offset: every prior shard
            #                     coded exactly iper pictures, so the
            #                     global dts clock advances by gi*iper
        return efs

    # shards run CONCURRENTLY on host threads (the CEncTaskManageFpp
    # analog at GOP grain): each thread's device dispatches land on its
    # assigned device and overlap the other shards' host work (entropy
    # coding, map assembly); jax dispatch is thread-safe and the host
    # CABAC writer releases no shared state. Thread count is capped by
    # the device count — more threads would only contend on dispatch.
    outs: list = [None] * len(chunks)
    nthreads = min(len(devices), len(chunks))
    if nthreads <= 1:
        for gi, chunk in enumerate(chunks):
            outs[gi] = encode_shard(gi, chunk)
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            futs = {ex.submit(encode_shard, gi, chunk): gi
                    for gi, chunk in enumerate(chunks)}
            for fut, gi in futs.items():
                outs[gi] = fut.result()
    coded = [ef for efs in outs for ef in efs]
    return b"".join(ef.data for ef in coded), coded
