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


def _resolve_shape(shape: Sequence[int], n_devices: int):
    """Resolves a single -1 wildcard against the device count (the
    numpy-reshape convention), with a named error when the spec does
    not divide the device count (instead of an opaque reshape failure
    downstream)."""
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1]))
    if -1 in shape:
        if known <= 0 or n_devices % known != 0:
            raise ValueError(
                f"mesh shape {tuple(shape)} does not divide "
                f"{n_devices} devices (fixed axes product {known})"
            )
        shape[shape.index(-1)] = n_devices // known
    elif known != n_devices:
        raise ValueError(
            f"mesh shape {tuple(shape)} wants {known} devices "
            f"but {n_devices} are available"
        )
    return shape


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] = (-1,),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = _resolve_shape(shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def data_axis_size(
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] = (-1,),
    axis: str = "data",
    n_devices: Optional[int] = None,
) -> int:
    """Size the ``axis`` dimension of ``make_mesh(axes, shape)`` would
    have, without building the mesh (usable before device init).  1 if
    the axis is absent."""
    if axis not in axes:
        return 1
    n = n_devices if n_devices is not None else jax.device_count()
    shape = _resolve_shape(shape, n)
    return int(shape[list(axes).index(axis)])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def local_eval_mesh() -> Optional[Mesh]:
    """Process-local, data-only mesh for eval sharding.

    Eval feeds host-local numpy batches, so the sharding must stay
    within this process's addressable devices; the multi-HOST split is
    the per-process dataset shard + gather (engine/inference.py).  A
    global training mesh must not be reused there — placing host-local
    arrays with a cross-process sharding fails.  Returns None with a
    single local device (plain jit is the same program)."""
    devs = jax.local_devices()
    if len(devs) <= 1:
        return None
    return Mesh(np.asarray(devs), ("data",))


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


def gather_objects(obj, allgather=None, n_processes: Optional[int] = None):
    """Gathers an arbitrary picklable python object from every process
    and returns the list [obj_from_process_0, ..., obj_from_process_n-1]
    on all processes.

    The reference pickles to a ByteTensor, pads to the max size, and
    NCCL-all_gathers (utils/comm.py:48-88).  Same design over JAX's
    host-level allgather: COCO prediction dicts (RLE strings included)
    are not an array pytree, so they serialize to a padded uint8 buffer.

    ``allgather``/``n_processes`` are injectable for testing; defaults
    use jax.experimental.multihost_utils over all processes."""
    import pickle

    if n_processes is None:
        n_processes = jax.process_count()
    if n_processes == 1:
        return [obj]
    if allgather is None:
        from jax.experimental import multihost_utils

        allgather = multihost_utils.process_allgather

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    lengths = np.asarray(
        allgather(np.asarray([data.size], np.int64))
    ).reshape(n_processes)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(allgather(padded)).reshape(n_processes, max_len)
    return [
        pickle.loads(gathered[i, : int(lengths[i])].tobytes())
        for i in range(n_processes)
    ]
