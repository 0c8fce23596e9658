"""Multi-host (DCN x ICI) mesh readiness.

The reference is single-device (SURVEY.md §2: no distributed code of any
kind); mesh.py adds single-slice data parallelism over ICI. This module
is the next rung: a 2-D ``(dcn, data)`` mesh whose OUTER axis maps onto
the slow between-slice DCN links and whose INNER axis maps onto ICI, so
that when gradients of replicated parameters are psummed XLA reduces
within each slice first (ICI) and only the per-slice partials cross DCN.
Batches shard over BOTH axes (flattened pure-DP), so each chip still
sees global_batch / n_chips samples.

On a real multi-slice deployment ``jax.experimental.mesh_utils.
create_hybrid_device_mesh`` assigns devices so the outer axis really is
the slice boundary; on a single process (tests, the driver's virtual-CPU
dry run) the flat device list is reshaped directly -- same program,
same shardings, no collective semantics change.

Per-host input sharding: each host decodes only the slice of every
global batch that its addressable devices own, and the global
``jax.Array`` is assembled with ``jax.make_array_from_process_local_data``
-- no host ever materialises the full global batch (the reference's
DataLoader has no notion of this; /root/reference/patchgan/train.py:77-83
is single-process).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

DCN_AXIS = 'dcn'


def dcn_mesh(n_slices, ici_per_slice=None, devices=None):
    """(n_slices x ici_per_slice) mesh with axes ('dcn', 'data').

    Use when a deployment spans multiple ICI slices (e.g. several v5e
    pods joined over DCN). For a single slice, prefer mesh.default_mesh.
    """
    if devices is None:
        devices = jax.devices()
    if ici_per_slice is None:
        if len(devices) % n_slices:
            raise ValueError(
                f"{len(devices)} devices do not divide into "
                f"{n_slices} slices")
        ici_per_slice = len(devices) // n_slices
    n = n_slices * ici_per_slice
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if jax.process_count() > 1:
        # real multi-host: let jax place the slow axis on DCN
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_hybrid_device_mesh(
            (1, ici_per_slice), (n_slices, 1), devices=devices[:n])
    else:
        grid = np.asarray(devices[:n]).reshape(n_slices, ici_per_slice)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS))


def dcn_batch_sharding(mesh):
    """Shard the leading (batch) axis over dcn x data jointly."""
    return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))


def batch_sharding_for(mesh):
    """Leading-axis batch sharding for ANY of this package's meshes:
    shards over the batch-bearing axes ('dcn' and/or 'data') and leaves
    other axes (e.g. 'model' in the hybrid DP x TP mesh) replicated."""
    axes = tuple(a for a in mesh.axis_names if a in (DCN_AXIS, DATA_AXIS))
    if not axes:
        raise ValueError(
            f"mesh axes {mesh.axis_names} have no batch axis "
            f"('{DCN_AXIS}'/'{DATA_AXIS}')")
    return NamedSharding(mesh, P(axes))


def dcn_replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch_dcn(batch, mesh):
    sharding = dcn_batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_dcn(tree, mesh):
    sharding = dcn_replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def process_local_range(global_batch_size, process_index=None,
                        process_count=None):
    """Contiguous [start, stop) slice of a global batch owned by this
    host. Deterministic and identical on every host given the same
    inputs, so hosts agree on the partition without communicating."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if global_batch_size % process_count:
        raise ValueError(
            f"global batch {global_batch_size} must divide across "
            f"{process_count} hosts")
    per = global_batch_size // process_count
    return process_index * per, (process_index + 1) * per


def global_batch_from_local(local_batch, sharding):
    """Assemble a global jax.Array from this host's shard of a batch.

    ``local_batch`` is the numpy slice produced by process_local_range;
    jax validates that it matches exactly the shards this process's
    addressable devices own under ``sharding``.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
