"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's NCCL process-group world
(reference: tools/train_net.py:187-195, utils/comm.py): one SPMD program
over a ``jax.sharding.Mesh``.  Data parallelism = batch sharded over the
'data' axis, parameters replicated; GSPMD inserts the gradient
all-reduce over ICI (the DistributedDataParallel equivalent,
train_net.py:65-71, for free).  Multi-host: ``jax.distributed.initialize``
once per host, then the same code runs unchanged.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] = (-1,),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = list(shape)
    n = len(devices)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // max(known, 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Places every array in the (pytree) batch with its leading axis
    sharded over the data axis."""
    sh = data_sharded(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def process_allgather(tree):
    """Host-level gather of per-process arrays (the pickle all_gather
    replacement, utils/comm.py:48-88) — used to collect eval predictions
    across hosts."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
