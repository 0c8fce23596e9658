"""Hybrid data x model parallelism for the GAN train step.

The reference is single-device (SURVEY.md §2: no TP/PP anywhere and no
attention to sequence-shard), so pure data-parallelism is the required
scaling mode (mesh.py). This module adds the natural TENSOR-parallel
extension for conv nets on top of it: a 2-D ``(data, model)`` mesh where
every conv kernel is sharded over its OUTPUT-channel axis and batches are
sharded over ``data``. Under ``jit``, GSPMD propagates the shardings
through the network (each layer computes its output-channel shard; the
next layer's input-channel contraction inserts the reduce/all-gather
over ICI) and psums gradients over ``data`` -- no manual collectives.

Worth it when activations/optimizer state for one replica exceed a
chip's HBM (very large nf or very large images); for the flagship
256px/nf=64 config pure DP is faster and remains the default.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def hybrid_mesh(dp, mp, devices=None):
    """(dp x mp) mesh over the device slice."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * mp, \
        f"need {dp * mp} devices, have {len(devices)}"
    grid = np.asarray(devices[:dp * mp]).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _param_spec(path, leaf):
    """Shard conv kernels (kh, kw, I, O) and biases (O,) over the model
    axis; everything else replicated."""
    if leaf.ndim == 4:
        # output channel must divide the model axis; GSPMD requires
        # divisibility, so replicate tiny kernels (e.g. the 1-channel
        # discriminator head)
        return P(None, None, None, MODEL_AXIS)
    if leaf.ndim == 1:
        return P(MODEL_AXIS)
    return P()


def model_parallel_shardings(params, mesh):
    """NamedShardings for a param tree: conv kernels split over output
    channels (falling back to replication when the axis doesn't divide
    the mesh)."""
    mp = mesh.shape[MODEL_AXIS]

    def shard(path, leaf):
        spec = _param_spec(path, leaf)
        # replicate anything whose sharded axis doesn't divide mp
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and leaf.shape[dim] % mp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard, params)


def _put(sharding, leaf):
    return jax.device_put(leaf, sharding)


def hybrid_state_shardings(state, mesh):
    """NamedSharding tree shaped like the TrainState: params and
    optimizer moments per model_parallel_shardings, scalars replicated.
    Works on abstract states (eval_shape ShapeDtypeStructs) too, which
    the AOT pre-flight validator (cli/aot.py) relies on."""
    g_sh = model_parallel_shardings(state.g_params, mesh)
    d_sh = model_parallel_shardings(state.d_params, mesh)
    repl = NamedSharding(mesh, P())

    def opt_sh(opt_state, shardings, params):
        # optimizer moments mirror param shapes inside optax structures:
        # shard any leaf whose shape matches a param leaf, replicate the
        # rest (counts, hyperparams)
        by_shape = {}
        for p, s in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(shardings)):
            by_shape.setdefault(p.shape, s)
        return jax.tree_util.tree_map(
            lambda leaf: by_shape.get(getattr(leaf, 'shape', None), repl),
            opt_state)

    return state._replace(
        g_params=g_sh,
        d_params=d_sh,
        g_opt_state=opt_sh(state.g_opt_state, g_sh, state.g_params),
        d_opt_state=opt_sh(state.d_opt_state, d_sh, state.d_params),
        step=repl,
        rng=repl,
    )


def place_hybrid_state(state, mesh):
    """Place a TrainState on the hybrid mesh: params and optimizer
    moments sharded per model_parallel_shardings, scalars replicated."""
    shardings = hybrid_state_shardings(state, mesh)
    return jax.tree_util.tree_map(
        lambda leaf, s: _put(s, leaf), state, shardings)


def hybrid_batch_sharding(mesh):
    return NamedSharding(mesh, P(DATA_AXIS))
