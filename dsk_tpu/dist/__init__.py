"""Distributed (multi-chip / multi-host) counting.

The TPU-native replacement for the reference's "disk as interconnect"
(SURVEY.md section 2.4): a device mesh, shard_map + all_to_all k-mer
routing to owner chips over ICI, psum histogram merges.
"""

from dsk_tpu.dist.engine import DistCountEngine  # noqa: F401
