"""Instance normalisation (affine-free), NHWC, fp32 statistics.

Matches torch ``nn.InstanceNorm2d(C)`` defaults used throughout the
reference (/root/reference/patchgan/unet.py:77, disc.py:8): affine=False,
track_running_stats=False, eps=1e-5, biased variance. Statistics are
always computed in float32 -- per-instance spatial reductions are
precision-critical in bf16 (SURVEY.md "Hard parts").

``instance_norm`` optionally fuses the following activation; on TPU this
dispatches to a Pallas kernel (one HBM read + one write for the whole
norm+act epilogue) with this XLA implementation as the reference/fallback
path. Set ``use_pallas=False`` to force the XLA path.
"""

import functools
import os

import jax
import jax.numpy as jnp

from .activations import apply_activation

# PATCHGAN_BF16_NORM=on normalises in the COMPUTE dtype (statistics
# stay fp32; only the elementwise (x-mean)*rstd and the activation run
# in bf16). Motivation: the round-2 trace shows ~3 ms/step of explicit
# bf16<->f32 convert ops (benchmarks/profile_step.py); measured
# end-to-end on v5e the variant is throughput-neutral (see
# BENCHMARKS.md), so the fp32-normalise path stays the default for its
# tighter numerics.
_BF16_NORMALIZE = os.environ.get('PATCHGAN_BF16_NORM', 'off') == 'on'


def _instance_norm_xla(x, eps, activation):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
    if _BF16_NORMALIZE and x.dtype != jnp.float32:
        rstd = jax.lax.rsqrt(var + eps)
        y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
        return apply_activation(y, activation)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = apply_activation(y, activation)
    return y.astype(x.dtype)


# PATCHGAN_NORM_VJP=custom swaps in a hand-written backward whose ONLY
# residual is the bf16 input x (read per trace so harnesses can A/B in
# one process). Motivation (round-4 HLO audit, BENCHMARKS.md): JAX's
# default autodiff of the norm saves the centred activation (xf - m) in
# FLOAT32 -- a full-resolution f32 residual per norm site, 2x the bytes
# of the bf16 input -- plus per-site stat tensors whose inter-fusion
# copies cost ~24 us each on v5e. The custom backward recomputes
# mean/rstd/xhat from x (spatial reduces fuse into the backward's
# existing read of x), so nothing but x crosses the fwd->bwd boundary.
_CUSTOM_VJP_ACTS = (None, 'linear', 'relu', 'leakyrelu', 'tanh',
                    'sigmoid')


def _norm_vjp_mode():
    return os.environ.get('PATCHGAN_NORM_VJP', 'off')


def _stats(xf, eps):
    m = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) \
        - jnp.square(m)
    return m, jax.lax.rsqrt(var + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _norm_act_cvjp(x, eps, activation):
    return _instance_norm_xla(x, eps, activation)


def _norm_act_cvjp_fwd(x, eps, activation):
    return _instance_norm_xla(x, eps, activation), x


def _norm_act_cvjp_bwd(eps, activation, x, dy):
    xf = x.astype(jnp.float32)
    m, r = _stats(xf, eps)
    xhat = (xf - m) * r
    dyf = dy.astype(jnp.float32)
    # d(activation)/d(xhat), recomputed from xhat
    if activation in (None, 'linear'):
        dxh = dyf
    elif activation == 'relu':
        dxh = jnp.where(xhat > 0, dyf, 0.0)
    elif activation == 'leakyrelu':
        dxh = jnp.where(xhat > 0, dyf, 0.2 * dyf)
    elif activation == 'tanh':
        t = jnp.tanh(xhat)
        dxh = dyf * (1.0 - jnp.square(t))
    else:  # sigmoid (gated by _CUSTOM_VJP_ACTS)
        s = jax.nn.sigmoid(xhat)
        dxh = dyf * s * (1.0 - s)
    # exact instance-norm backward, eps included via r:
    # dx = r * (dxh - mean(dxh) - xhat * mean(dxh * xhat))
    mdxh = jnp.mean(dxh, axis=(1, 2), keepdims=True)
    mdot = jnp.mean(dxh * xhat, axis=(1, 2), keepdims=True)
    dx = r * (dxh - mdxh - xhat * mdot)
    return (dx.astype(x.dtype),)


_norm_act_cvjp.defvjp(_norm_act_cvjp_fwd, _norm_act_cvjp_bwd)


def instance_norm(x, eps=1e-5, activation=None, use_pallas=True):
    """Normalise each (sample, channel) plane over its spatial extent.

    x: (N, H, W, C) NHWC tensor. Returns same shape/dtype.
    """
    if use_pallas:
        try:
            from .pallas.norm_act import (instance_norm_act_pallas,
                                          pallas_supported)
            if pallas_supported(x, activation):
                return instance_norm_act_pallas(x, eps=eps,
                                                activation=activation)
        except ImportError:  # pragma: no cover - pallas unavailable
            pass
    # the custom backward recomputes xhat in f32; under
    # PATCHGAN_BF16_NORM=on the forward computed a bf16-rounded xhat,
    # so activation-derivative masks near rounding boundaries would
    # disagree with the loss actually computed — fall back to autodiff
    # rather than ship inconsistent gradients
    if (_norm_vjp_mode() == 'custom' and activation in _CUSTOM_VJP_ACTS
            and not _BF16_NORMALIZE):
        return _norm_act_cvjp(x, eps, activation)
    return _instance_norm_xla(x, eps, activation)
