"""Spatial (image-height) parallelism for training -- the conv-net
analog of sequence/context parallelism.

The reference handles large inputs only by CPU-side tile-and-stitch at
inference (/root/reference/patchgan/infer.py:14-68) and always resizes
training images down to size x size (io.py:25). This module removes
that training-side limit the TPU-native way: a 2-D ``(data, spatial)``
mesh where batches shard over ``data`` AND the image HEIGHT dimension
shards over ``spatial``. Parameters stay replicated. Under ``jit``,
GSPMD propagates the height sharding through the whole G+D step --
strided convs get halo exchanges on their sharded dimension, instance
-norm spatial means and the loss reductions become ICI collectives --
with no change to the model or train-step code.

Worth it when ONE sample's activations exceed a chip's HBM (very large
images) or when the global batch is smaller than the mesh; for the
flagship 256px/batch-16 config pure DP is faster and remains the
default. The inference-side analog (height-sharded whole-image forward)
lives in inference/engine.py ``mode='spatial'``.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

SPATIAL_AXIS = 'spatial'


def spatial_mesh(dp, sp, devices=None):
    """(dp x sp) mesh with axes ('data', 'spatial').

    Building a mesh with sp > 1 switches jax to the legacy GSPMD
    partitioner: the Shardy partitioner (jax 0.9.0 default) silently
    miscompiles conv BACKWARD passes when an intermediate spatial dim
    is over-sharded (observed: H=2 over a 4-way axis -> O(1) relative
    weight-gradient error while the forward stays exact). Standing
    reproducer: benchmarks/repro_shardy_spatial.py -- when it prints
    SUCCESS on a newer toolchain, drop this fallback. Override with
    PATCHGAN_ALLOW_SHARDY_SPATIAL=1 (at your own risk).
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) < dp * sp:
        raise ValueError(f"need {dp * sp} devices, have {len(devices)}")
    import os
    if sp > 1 and jax.config.jax_use_shardy_partitioner and \
            os.environ.get('PATCHGAN_ALLOW_SHARDY_SPATIAL') != '1':
        import warnings
        warnings.warn(
            'spatial_mesh: switching this PROCESS to the legacy GSPMD '
            'partitioner (Shardy silently miscompiles spatially-sharded '
            'conv gradients; benchmarks/repro_shardy_spatial.py). All '
            'subsequent jax compilations use GSPMD -- restore with '
            "jax.config.update('jax_use_shardy_partitioner', True) or "
            'opt out via PATCHGAN_ALLOW_SHARDY_SPATIAL=1.',
            stacklevel=2)
        jax.config.update('jax_use_shardy_partitioner', False)
    grid = np.asarray(devices[:dp * sp]).reshape(dp, sp)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def spatial_batch_sharding(mesh):
    """NHWC batches: N over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def shard_batch_spatial(batch, mesh):
    sharding = spatial_batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_spatial(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
