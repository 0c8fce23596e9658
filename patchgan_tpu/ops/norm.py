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
    return _instance_norm_xla(x, eps, activation)
