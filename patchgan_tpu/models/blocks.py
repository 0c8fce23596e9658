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
import jax
import jax.numpy as jnp

from ..ops.activations import apply_activation
from ..ops.conv import conv2d, conv_transpose2d
from ..ops.norm import instance_norm

KERNEL_SIZE = 4
DROPOUT_RATE = 0.2
NORM_EPS = 1e-5

xavier_uniform = nn.initializers.xavier_uniform()


class DownBlock(nn.Module):
    """Strided conv -> instance norm -> activation -> optional dropout.

    ``s2d_in=True``: the input arrives in space-to-depth form
    ``[N, H/2, W/2, 4C]`` and the stride-2 conv runs as the equivalent
    stride-1 conv over the s2d grid (ops/s2d.py) -- numerically exact,
    same ``(4, 4, C, features)`` parameter, same output. Used for the
    UNet's first encoder level so the full-resolution few-channel input
    tensor never exists inside the train step.
    """
    features: int
    activation: str
    use_dropout: bool = False
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    remat: bool = False
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1] // 4 if self.s2d_in else x.shape[-1]
        kernel = self.param(
            'kernel', xavier_uniform,
            (KERNEL_SIZE, KERNEL_SIZE, in_ch, self.features))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)

        def core(x, kernel):
            if self.s2d_in:
                from ..ops.s2d import conv2d_s2d
                out = conv2d_s2d(x, kernel)
                if self.use_norm:
                    return instance_norm(out, eps=NORM_EPS,
                                         activation=self.activation,
                                         use_pallas=self.use_pallas)
                return apply_activation(out, self.activation)
            if self.use_norm:
                # single-pass conv+IN+act Pallas kernel, shape-gated by
                # the measured dispatch table (PATCHGAN_FUSED_CONV=auto,
                # the default; 'on' forces it everywhere supported, 'off'
                # disables; see ops/pallas/conv_norm_act.py)
                from ..ops.pallas.conv_norm_act import (fused_conv_norm_act,
                                                        fused_conv_supported)
                if fused_conv_supported(x, kernel, self.activation,
                                        train=train):
                    return fused_conv_norm_act(x, kernel, NORM_EPS,
                                               self.activation)
                out = conv2d(x, kernel)
                return instance_norm(out, eps=NORM_EPS,
                                     activation=self.activation,
                                     use_pallas=self.use_pallas)
            return apply_activation(conv2d(x, kernel), self.activation)

        if self.remat:
            # save only the block input (alive anyway as a skip) and
            # recompute conv+norm+act in the backward pass: trades extra
            # MXU flops for HBM residual traffic on the bandwidth-bound
            # train step. Dropout stays outside the checkpoint so its rng
            # plumbing never crosses the remat boundary.
            core = jax.checkpoint(core)
        x = core(x, kernel)
        if self.use_dropout:
            x = nn.Dropout(rate=DROPOUT_RATE, deterministic=not train)(x)
        return x


class UpBlock(nn.Module):
    """Transposed conv (with fused skip concat) -> optional instance norm
    -> activation -> optional dropout.

    ``skip`` is logically concatenated with ``x`` on the channel axis
    before the transposed conv (reference unet.py:127); here the conv is
    split over the two inputs instead, which is numerically identical.

    ``s2d_out=True``: the transposed conv PRODUCES its output in
    space-to-depth form ``[N, H, W, 4*features]`` (ops/s2d.py) -- same
    parameter, exact numerics per original pixel, softmax applied per
    parity block. Used for the UNet's final level so the
    full-resolution few-channel output tensor never exists inside the
    train step. Requires ``use_norm=False`` (it is the output head).
    """
    features: int
    activation: str
    use_norm: bool = True
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    fp32_act: bool = False  # final output head: activation in fp32
    remat: bool = False
    s2d_out: bool = False

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        kernel = self.param(
            'kernel', xavier_uniform,
            (KERNEL_SIZE, KERNEL_SIZE, in_ch, self.features))
        x = x.astype(self.dtype)
        skip = skip.astype(self.dtype) if skip is not None else None

        def core(x, skip, kernel):
            if self.s2d_out:
                assert not self.use_norm, \
                    's2d_out is an output-head option (use_norm=False)'
                from ..ops.s2d import (apply_activation_s2d,
                                       conv_transpose2d_s2d)
                out = conv_transpose2d_s2d(x, kernel, x2=skip)
                if self.fp32_act:
                    out = out.astype(jnp.float32)
                return apply_activation_s2d(out, self.activation)
            if self.use_norm:
                # single-pass convT+IN+act Pallas kernel, shape-gated by
                # its measured dispatch table (PATCHGAN_FUSED_CONVT=auto
                # default; see ops/pallas/convt_norm_act.py)
                from ..ops.pallas.convt_norm_act import (
                    fused_convt_norm_act, fused_convt_supported)
                if fused_convt_supported(x, kernel, self.activation,
                                         skip=skip, train=train):
                    # positional call: custom_vjp functions reject
                    # keyword arguments
                    return fused_convt_norm_act(x, kernel, NORM_EPS,
                                                self.activation, skip)
            out = conv_transpose2d(x, kernel, x2=skip)
            if self.use_norm:
                return instance_norm(out, eps=NORM_EPS,
                                     activation=self.activation,
                                     use_pallas=self.use_pallas)
            # the output head's sigmoid/softmax runs in fp32: bf16
            # saturates to exact 0/1 at |logit| ~ 9, which kills BCE
            # gradients and probability resolution
            if self.fp32_act:
                out = out.astype(jnp.float32)
            return apply_activation(out, self.activation)

        if self.remat:
            # both inputs (previous decoder level + encoder skip) are
            # already live residuals, so checkpointing here stores
            # nothing new and drops the convT/norm intermediates
            core = jax.checkpoint(core)
        x = core(x, skip, kernel.astype(self.dtype))
        if self.use_dropout:
            x = nn.Dropout(rate=DROPOUT_RATE, deterministic=not train)(x)
        return x
