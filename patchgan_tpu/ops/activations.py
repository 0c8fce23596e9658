"""Activation vocabulary shared by the generator and discriminator.

The reference resolves activation strings inside each block
(/root/reference/patchgan/unet.py:12-17,42-51). Here they are a single
table over NHWC tensors; 'softmax' acts over the channel axis (last in
NHWC, matching torch's nn.Softmax(dim=1) on NCHW).
"""

import jax
import jax.numpy as jnp


def apply_activation(x, name):
    if name is None or name == 'linear':
        return x
    if name == 'tanh':
        return jnp.tanh(x)
    if name == 'relu':
        return jax.nn.relu(x)
    if name == 'leakyrelu':
        return jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == 'softmax':
        return jax.nn.softmax(x, axis=-1)
    if name == 'sigmoid':
        return jax.nn.sigmoid(x)
    raise ValueError(f"Unknown activation: {name!r}")
