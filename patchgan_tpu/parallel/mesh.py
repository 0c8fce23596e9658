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


def place_batch(batch, mesh):
    """Place an (x, y) NHWC batch for ANY of this package's meshes.

    Single decision tree shared by the DataLoader and the Trainer:
    spatial meshes shard N over 'data' and H over 'spatial'; other
    multi-device meshes shard N over 'data'; anything that fails the
    divisibility guards (or a 1-device mesh) falls back to a plain
    device_put and lets GSPMD reshard inside jit.
    """
    if mesh is not None and mesh.devices.size > 1:
        from .spatial import SPATIAL_AXIS, shard_batch_spatial
        if SPATIAL_AXIS in mesh.axis_names:
            dp = mesh.shape[DATA_AXIS]
            sp = mesh.shape[SPATIAL_AXIS]
            if batch[0].shape[0] % dp == 0 and \
                    batch[0].shape[1] % sp == 0:
                return shard_batch_spatial(batch, mesh)
            return jax.device_put(batch)
        if batch[0].shape[0] % mesh.devices.size == 0:
            return shard_batch(batch, mesh)
    return jax.device_put(batch)
