"""Multi-device / multi-host parallelism (SURVEY.md 5.7/5.8).

Two production axes:
- frame-axis data parallelism inside an all-intra FPP batch
  (ops/wavefront.fused_rows_sharded: shard_map over the frame mesh);
- GOP sharding for inter sequences (parallel/gop_shard.py): closed GOPs
  are independent by construction (IDR boundaries), the codec-domain
  analog of the reference's FPP at a coarser grain — and the natural
  multi-host axis (each host takes disjoint GOPs; only NAL bytes cross
  DCN, in the DTS-ordered muxer).
"""

from .gop_shard import encode_gops_sharded  # noqa: F401
