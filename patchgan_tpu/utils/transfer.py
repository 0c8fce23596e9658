"""Torch-checkpoint <-> JAX-param-tree transfer.

Implements the reference's transfer-learning contract
(/root/reference/patchgan/transfer.py:8-22): iterate the incoming torch
state_dict, copy every tensor whose mapped name exists and whose shape
matches, count the copies, and raise ``InvalidCheckpointError`` if zero
weights were copied. On top of that it handles the layout change between
torch (NCHW activations, OIHW conv / IOHW conv-transpose kernels) and our
TPU-native layouts (NHWC, HWIO, with conv-transpose kernels stored
pre-flipped — see ops/conv.py).

Torch key formats mapped (they ARE the checkpoint format, reference
unet.py:22-28,56-65 and disc.py:19-47):
  UNet:   encoder.{i}.model.DownConv{i}.weight
          decoder.{i}.model.UpConv{i}.weight
  Disc:   model.{seq_idx}.weight / model.{seq_idx}.bias
"""

import numpy as np


class InvalidCheckpointError(Exception):
    pass


def _to_numpy(v):
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def conv_kernel_to_jax(w):
    """torch Conv2d weight (O, I, kH, kW) -> HWIO (kH, kW, I, O)."""
    return np.transpose(_to_numpy(w), (2, 3, 1, 0))


def conv_kernel_to_torch(w):
    """HWIO (kH, kW, I, O) -> torch Conv2d weight (O, I, kH, kW)."""
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def convT_kernel_to_jax(w):
    """torch ConvTranspose2d weight (I, O, kH, kW) -> our pre-flipped HWIO
    (kH, kW, I, O). The spatial flip makes lhs-dilated convolution with
    this kernel numerically identical to torch's transposed conv."""
    w = _to_numpy(w)
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def convT_kernel_to_torch(w):
    """Inverse of convT_kernel_to_jax."""
    w = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return w[:, :, ::-1, ::-1]


# ---------------------------------------------------------------------------
# Key maps: torch state_dict key -> (path tuple into our param tree,
#                                    to_jax transform, to_torch transform)
# ---------------------------------------------------------------------------

def unet_key_map(n_levels=7):
    """Key map for the U-Net generator (reference unet.py:84-110:
    7 encoder DownConv blocks, 7 decoder UpConv blocks)."""
    keymap = {}
    for i in range(n_levels):
        keymap[f'encoder.{i}.model.DownConv{i}.weight'] = (
            (f'enc{i}', 'kernel'), conv_kernel_to_jax, conv_kernel_to_torch)
    for i in range(n_levels):
        keymap[f'decoder.{i}.model.UpConv{i}.weight'] = (
            (f'dec{i}', 'kernel'), convT_kernel_to_jax, convT_kernel_to_torch)
    return keymap


def disc_key_map(n_layers=3, norm=False):
    """Key map for the discriminator. Sequential indices follow the layer
    list built in reference disc.py:19-47 (conv, act, optional norm)."""
    keymap = {}

    def add(idx, name, has_bias):
        keymap[f'model.{idx}.weight'] = (
            (f'{name}_kernel',), conv_kernel_to_jax, conv_kernel_to_torch)
        if has_bias:
            keymap[f'model.{idx}.bias'] = (
                (f'{name}_bias',), _to_numpy, np.asarray)

    idx = 0
    add(idx, 'conv0', True)
    idx += 2  # conv + leakyrelu
    for n in range(1, n_layers):
        add(idx, f'conv{n}', False)
        idx += 2  # conv + tanh
        if norm:
            idx += 1
    add(idx, f'conv{n_layers}', False)
    idx += 2
    if norm:
        idx += 1
    add(idx, 'conv_out', True)
    return keymap


# ---------------------------------------------------------------------------
# Transfer load / export
# ---------------------------------------------------------------------------

def _get_path(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def load_transfer_data(params, state_dict, keymap, verbose=True):
    """Shape-matched partial copy of a torch state_dict into a param tree.

    Returns (new_params, n_copied). Mirrors the semantics of the
    reference Transferable.load_transfer_data (transfer.py:11-22): a
    weight is copied iff its mapped name exists in the target tree and
    the transformed shape matches; raises InvalidCheckpointError when
    nothing could be copied.
    """
    import jax

    new_params = jax.tree_util.tree_map(np.asarray, params)
    count = 0
    for key, value in state_dict.items():
        if key not in keymap:
            continue
        path, to_jax, _ = keymap[key]
        target = _get_path(new_params, path)
        if target is None:
            continue
        converted = to_jax(value)
        if converted.shape == tuple(np.shape(target)):
            _set_path(new_params, path,
                      converted.astype(np.asarray(target).dtype))
            count += 1
    if count == 0:
        raise InvalidCheckpointError("Could not load transfer weights")
    if verbose:
        print(f"Loaded {count} weights out of {len(state_dict)}")
    return new_params, count


def export_state_dict(params, keymap):
    """Export a param tree to a torch-layout state_dict (numpy values).

    The resulting dict round-trips through load_transfer_data and is
    loadable by the PyTorch reference itself (after torch.from_numpy),
    preserving checkpoint interop in both directions.
    """
    out = {}
    for key, (path, _, to_torch) in keymap.items():
        value = _get_path(params, path)
        if value is not None:
            out[key] = to_torch(np.asarray(value))
    return out


class Transferable:
    """API-compatibility shim: the reference exposes transfer loading as a
    model mixin (transfer.py:4-22). Our models are immutable Flax modules,
    so the equivalent entry points are the functions above; this class
    hosts them under the familiar name."""

    load_transfer_data = staticmethod(load_transfer_data)
    export_state_dict = staticmethod(export_state_dict)
