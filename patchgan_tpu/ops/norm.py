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

import jax
import jax.numpy as jnp

from .activations import apply_activation


def _instance_norm_xla(x, eps, activation):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
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
