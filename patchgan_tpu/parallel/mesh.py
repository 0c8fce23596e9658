"""Device mesh + sharding helpers for data-parallel training.

The reference is strictly single-device (SURVEY.md §2: no DDP/FSDP/
collectives anywhere); this layer is the TPU-native scaling design built
from scratch: a 1-D ``data`` mesh over the ICI-connected slice, batches
sharded on their leading axis, parameters and optimizer state replicated.
The jitted train step is compiled against these shardings, and XLA
inserts the psum gradient all-reduce over ICI automatically (gradients of
replicated parameters w.r.t. a sharded batch reduce across the mesh).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def default_mesh(devices=None):
    """1-D data-parallel mesh over all local devices (or the given list)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    """Shard the leading (batch) axis across the data axis of the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Place a host batch onto the mesh, sharded along its leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
