"""Distributed (multi-chip / multi-host) counting.

The TPU-native replacement for the reference's "disk as interconnect"
(SURVEY.md section 2.4): a device mesh, shard_map + all_to_all k-mer
routing to owner chips over ICI, psum histogram merges.

DistCountEngine is re-exported lazily: importing dsk_tpu.dist.multihost
must not pull in modules that touch the XLA backend (creating any jnp
value initializes it), because jax.distributed.initialize() has to run
first in multi-process programs.
"""


def __getattr__(name):
    if name == "DistCountEngine":
        from dsk_tpu.dist.engine import DistCountEngine

        return DistCountEngine
    raise AttributeError(name)
