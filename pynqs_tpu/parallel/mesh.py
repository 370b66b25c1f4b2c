"""Device-mesh / sharding helpers.

TPU-native replacement for the reference's torch.distributed layer
(utils/distributed/comm.py): instead of explicit gloo/nccl collectives
with pad-to-max buffers and a rank-0 merge funnel, all parallelism is
SPMD — one jitted program over a `jax.sharding.Mesh`, with samples
sharded along the data axis (`"dp"`) and parameters replicated.  XLA
inserts psum/all-gather over ICI where the program reduces across the
batch; there is no hand-written communication.

The reference's collective wrappers map as:
  all_reduce_tensor (mean)  -> a global mean inside jit (auto psum)
  gather/scatter sample      -> resharding with NamedSharding(P("dp"))
  merge_rank_sample          -> sort + segment_sum inside jit (ops.lut)
  SyncFunction (autograd all-gather) -> not needed; jit differentiates
  destroy_all_rank           -> jax.experimental raising from a checkify
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (sample/chain) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Device-put a batch-leading array (or pytree) sharded over dp."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)
