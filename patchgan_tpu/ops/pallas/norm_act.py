"""Fused InstanceNorm + activation Pallas TPU kernel, with custom VJP.

Every conv in the generator (and optionally the discriminator) is
followed by an affine-free instance norm and an elementwise activation
(reference unet.py:22-28). Unfused, XLA executes that epilogue as a
reduction pass plus a normalise/activate pass -- at least two HBM reads
and one write of the activation tensor, plus a saved normalised copy for
the backward. This kernel does the whole epilogue in ONE read and one
write per tensor (stats in fp32 in VMEM), keeps only the kernel INPUT as
the autodiff residual, and the backward kernel recomputes the cheap
VMEM-resident statistics instead of materialising them in HBM.

Math (per sample n, channel c, spatial reductions over H*W):
  fwd: xhat = (x - mean) * rsqrt(var + eps);  y = act(xhat)
  bwd: gm = g * act'(xhat)
       dx = rstd * (gm - mean(gm) - xhat * mean(gm * xhat))

Grid: one program per (sample, channel-block). Channel blocks keep the
fp32 working set bounded in VMEM regardless of layer shape; spatial dims
stay whole inside a block because they are the reduction axes.

On non-TPU backends the kernel runs in interpreter mode when forced via
PATCHGAN_PALLAS=interpret (used by tests); otherwise ops/norm.py falls
back to the XLA implementation.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUPPORTED_ACTIVATIONS = (None, 'tanh', 'relu', 'leakyrelu')

# cap on fp32 elements materialised per program (~4 MB of VMEM)
_MAX_BLOCK_ELEMS = 1 << 20


def _act(xhat, name):
    if name is None:
        return xhat
    if name == 'tanh':
        return jnp.tanh(xhat)
    if name == 'relu':
        return jnp.maximum(xhat, 0.0)
    if name == 'leakyrelu':
        return jnp.where(xhat >= 0, xhat, 0.2 * xhat)
    raise ValueError(name)


def _act_grad(xhat, name):
    if name is None:
        return jnp.ones_like(xhat)
    if name == 'tanh':
        t = jnp.tanh(xhat)
        return 1.0 - t * t
    if name == 'relu':
        return (xhat > 0).astype(xhat.dtype)
    if name == 'leakyrelu':
        return jnp.where(xhat >= 0, 1.0, 0.2).astype(xhat.dtype)
    raise ValueError(name)


def _channel_block(h, w, c):
    """Largest divisor of c keeping the block under the VMEM working-set
    cap (spatial dims are never split: they are the reduction axes)."""
    limit = max(1, _MAX_BLOCK_ELEMS // (h * w))
    cb = 1
    for d in range(1, c + 1):
        if c % d == 0 and d <= limit:
            cb = d
    return cb


def _interpret():
    if os.environ.get('PATCHGAN_PALLAS') == 'interpret':
        return True
    return jax.default_backend() != 'tpu'


def pallas_supported(x, activation=None):
    """Gate for the fused kernel: PATCHGAN_PALLAS=interpret forces the
    interpreter (tests), =off disables, =on enables on TPU. Default is
    currently OFF pending on-hardware validation of the Mosaic build
    (the XLA path is the numerically-identical fallback)."""
    if activation not in SUPPORTED_ACTIVATIONS:
        return False
    if x.ndim != 4:
        return False
    mode = os.environ.get('PATCHGAN_PALLAS', 'off')
    if mode == 'interpret':
        return True
    if mode != 'on':
        return False
    return jax.default_backend() == 'tpu'


def _stats(x, eps):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(x * x, axis=(1, 2), keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def _fwd_kernel(x_ref, y_ref, *, eps, activation):
    x = x_ref[...].astype(jnp.float32)  # (1, H, W, Cb)
    mean, rstd = _stats(x, eps)
    xhat = (x - mean) * rstd
    y_ref[...] = _act(xhat, activation).astype(y_ref.dtype)


def _bwd_kernel(g_ref, x_ref, dx_ref, *, eps, activation):
    g = g_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    mean, rstd = _stats(x, eps)
    xhat = (x - mean) * rstd
    gm = g * _act_grad(xhat, activation)
    m1 = jnp.mean(gm, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(gm * xhat, axis=(1, 2), keepdims=True)
    dx_ref[...] = (rstd * (gm - m1 - xhat * m2)).astype(dx_ref.dtype)


def _grid_and_block(x):
    n, h, w, c = x.shape
    cb = _channel_block(h, w, c)
    block = pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
    return (n, c // cb), block


def _forward(x, eps, activation):
    grid, block = _grid_and_block(x)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, activation=activation),
        grid=grid,
        in_specs=[block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x)


def _backward(g, x, eps, activation):
    grid, block = _grid_and_block(x)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, activation=activation),
        grid=grid,
        in_specs=[block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        interpret=_interpret(),
    )(g, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_act_pallas(x, eps=1e-5, activation=None):
    return _forward(x, eps, activation)


def _vjp_fwd(x, eps, activation):
    return _forward(x, eps, activation), x


def _vjp_bwd(eps, activation, x, g):
    return (_backward(g, x, eps, activation),)


instance_norm_act_pallas.defvjp(_vjp_fwd, _vjp_bwd)
