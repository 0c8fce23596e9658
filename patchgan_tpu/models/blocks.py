"""Encoder / decoder building blocks (Flax, NHWC).

TPU-native equivalents of the reference's DownSampleBlock / UpSampleBlock
(/root/reference/patchgan/unet.py:8-72): conv(k=4, s=2, p=1, bias=False)
-> InstanceNorm (affine-free) -> activation -> optional Dropout(0.2).
The norm+activation pair is a single fused op (ops.instance_norm), and the
decoder's skip concatenation is folded into the transposed conv itself
(ops.conv_transpose2d(x2=skip)) instead of materialising torch.cat
(unet.py:127).

Conv kernels use xavier-uniform init, matching the reference's
weights_init which re-initialises every Conv weight with
xavier_uniform_ (/root/reference/patchgan/trainer.py:338-339).
"""

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import apply_activation
from ..ops.conv import conv2d, conv_transpose2d
from ..ops.norm import instance_norm

KERNEL_SIZE = 4
DROPOUT_RATE = 0.2
NORM_EPS = 1e-5

xavier_uniform = nn.initializers.xavier_uniform()


class DownBlock(nn.Module):
    """Strided conv -> instance norm -> activation -> optional dropout."""
    features: int
    activation: str
    use_dropout: bool = False
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        kernel = self.param(
            'kernel', xavier_uniform,
            (KERNEL_SIZE, KERNEL_SIZE, x.shape[-1], self.features))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if self.use_norm:
            # experimental single-pass conv+IN+act Pallas kernel
            # (PATCHGAN_FUSED_CONV=on; see ops/pallas/conv_norm_act.py)
            from ..ops.pallas.conv_norm_act import (fused_conv_norm_act,
                                                    fused_conv_supported)
            if fused_conv_supported(x, kernel, self.activation):
                x = fused_conv_norm_act(x, kernel, NORM_EPS,
                                        self.activation)
            else:
                x = conv2d(x, kernel)
                x = instance_norm(x, eps=NORM_EPS,
                                  activation=self.activation,
                                  use_pallas=self.use_pallas)
        else:
            x = conv2d(x, kernel)
            x = apply_activation(x, self.activation)
        if self.use_dropout:
            x = nn.Dropout(rate=DROPOUT_RATE, deterministic=not train)(x)
        return x


class UpBlock(nn.Module):
    """Transposed conv (with fused skip concat) -> optional instance norm
    -> activation -> optional dropout.

    ``skip`` is logically concatenated with ``x`` on the channel axis
    before the transposed conv (reference unet.py:127); here the conv is
    split over the two inputs instead, which is numerically identical.
    """
    features: int
    activation: str
    use_norm: bool = True
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    fp32_act: bool = False  # final output head: activation in fp32

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        kernel = self.param(
            'kernel', xavier_uniform,
            (KERNEL_SIZE, KERNEL_SIZE, in_ch, self.features))
        x = x.astype(self.dtype)
        skip = skip.astype(self.dtype) if skip is not None else None
        x = conv_transpose2d(x, kernel.astype(self.dtype), x2=skip)
        if self.use_norm:
            x = instance_norm(x, eps=NORM_EPS, activation=self.activation,
                              use_pallas=self.use_pallas)
        else:
            # the output head's sigmoid/softmax runs in fp32: bf16
            # saturates to exact 0/1 at |logit| ~ 9, which kills BCE
            # gradients and probability resolution
            if self.fp32_act:
                x = x.astype(jnp.float32)
            x = apply_activation(x, self.activation)
        if self.use_dropout:
            x = nn.Dropout(rate=DROPOUT_RATE, deterministic=not train)(x)
        return x
