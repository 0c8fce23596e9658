"""Orbax-backed exact-resume checkpoints (async, sharding-aware).

Optional alternative to the flax-msgpack training-state file: the full
TrainState (both param trees, both Adam states, step counter, rng) is
written by an orbax AsyncCheckpointer, so the epoch loop continues while
bytes hit disk, and restore re-places arrays according to the current
mesh sharding. The torch-interop ``.npz`` files remain the canonical
per-net weight format either way (utils/checkpoint.py); this store only
replaces the exact-resume side channel.

Layout stays epoch-numbered beside the reference-style files
(/root/reference/patchgan/trainer.py:281-287):
``training_state_ep_{epoch:03d}.orbax/``.
"""

import os

_checkpointer = None


def _ckptr():
    global _checkpointer
    if _checkpointer is None:
        import orbax.checkpoint as ocp
        _checkpointer = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _checkpointer


def orbax_path(savefolder, epoch):
    return os.path.abspath(
        os.path.join(savefolder, f'training_state_ep_{epoch:03d}.orbax'))


def save_async(path, state):
    """Start an async save of the TrainState; returns immediately."""
    import orbax.checkpoint as ocp
    _ckptr().save(path, args=ocp.args.StandardSave(state), force=True)


def wait():
    """Block until any in-flight async save has committed."""
    if _checkpointer is not None:
        _checkpointer.wait_until_finished()


def restore(path, template_state):
    """Restore a TrainState saved by save_async. ``template_state`` is a
    live state of identical structure (provides dtypes/shapes/shardings).
    """
    import jax
    import orbax.checkpoint as ocp
    wait()
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        if hasattr(a, 'shape') else a, template_state)
    return _ckptr().restore(path, args=ocp.args.StandardRestore(abstract))
