"""Patch-wise (pix2pix-style) discriminator, TPU-native rebuild of the
reference critic (/root/reference/patchgan/disc.py:5-51).

Architecture parity:
- operates on the channel concatenation of the input image and mask;
  here the concat is fused into the first conv (ops.conv2d(x2=...)),
  replacing the reference's torch.cat (trainer.py:65,96,98).
- layer 0: Conv(k=4, s=2, p=1, bias=True) + LeakyReLU(0.2) (disc.py:19-20).
- layers 1..n_layers-1: Conv(k=4, s=2, p=1, bias=False) + **Tanh**, then
  optional InstanceNorm AFTER the activation (disc.py:26-32) -- the
  reference deliberately uses Tanh, not LeakyReLU, and norms after the
  activation; both quirks are preserved for numerics parity.
- one stride-1 Conv(bias=False) + Tanh (+ optional norm) (disc.py:36-42).
- final stride-1 Conv -> 1 channel (bias=True) + Sigmoid (disc.py:45-46).
- filter ladder ndf * min(2^n, 8) (disc.py:25,35).

Conv weights use xavier-uniform init (trainer.py:338-339); biases keep
torch's Conv2d default uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) since the
reference's weights_init leaves biases untouched.
"""

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import apply_activation
from ..ops.conv import conv2d
from ..ops.norm import instance_norm
from .blocks import KERNEL_SIZE, NORM_EPS, xavier_uniform


def torch_conv_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Discriminator(nn.Module):
    input_nc: int            # total channels: image channels + mask channels
    ndf: int = 64
    n_layers: int = 3
    norm: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = True
    s2d: bool = False  # inputs arrive in space-to-depth form
    #   [N, H/2, W/2, 4C]; conv0 runs as the exact stride-1 equivalent
    #   (ops/s2d.py) with the same parameter, so the full-resolution
    #   image/mask tensors never exist inside the train step. Layers
    #   past conv0 are untouched (their inputs are normal-form).

    @nn.compact
    def __call__(self, x, y=None, train=False):
        """x: (N, H, W, Ci) image; y: optional (N, H, W, Cm) mask that is
        logically channel-concatenated with x (fused into the first conv).
        If y is None, x must already carry input_nc channels.

        y may also be a TUPLE of masks sharing one image (the train
        step's real/fake pair, reference trainer.py:96-99): the critic
        then returns one output per mask, and conv0's image-part
        contribution is a single shared value -- the forward is
        bit-identical to separate calls (XLA CSEs those anyway), but in
        the backward the image-part weight gradient contracts the SUM
        of the pair's cotangents, one wgrad conv instead of two
        (autodiff cannot merge them across separate applies; measured
        in BENCHMARKS.md "paired discriminator").
        """
        del train  # the discriminator has no dropout
        k = KERNEL_SIZE
        x = x.astype(self.dtype)
        paired = isinstance(y, (tuple, list))
        ys = tuple(y) if paired else (y,)
        ys = tuple(m.astype(self.dtype) if m is not None else None
                   for m in ys)

        # flax forbids re-declaring a param name, so the paired path's
        # repeated ladder shares declarations through this memo
        cache = {}

        def get_param(name, init, shape):
            if name not in cache:
                cache[name] = self.param(name, init, shape)
            return cache[name]

        def conv(h, features, stride, use_bias, name, h2=None, s2d=False):
            in_ch = h.shape[-1] + (h2.shape[-1] if h2 is not None else 0)
            if s2d:
                in_ch //= 4
            kernel = get_param(f'{name}_kernel', xavier_uniform,
                               (k, k, in_ch, features))
            bias = None
            if use_bias:
                bias = get_param(f'{name}_bias',
                                 torch_conv_bias_init(in_ch * k * k),
                                 (features,))
                bias = bias.astype(self.dtype)
            if s2d:
                from ..ops.s2d import conv2d_s2d
                return conv2d_s2d(h, kernel.astype(self.dtype), bias=bias,
                                  x2=h2)
            return conv2d(h, kernel.astype(self.dtype), stride=stride,
                          padding=1, bias=bias, x2=h2)

        if not paired:
            hs = [conv(x, self.ndf, stride=2, use_bias=True, name='conv0',
                       h2=ys[0], s2d=self.s2d)]
        else:
            # the ops-level x2s form: conv0's image-part conv is a
            # single shared value, the channel-split-by-linearity
            # convention stays inside ops/conv.py / ops/s2d.py
            assert all(m.shape == ys[0].shape for m in ys), \
                "paired masks must share one shape"
            in_ch = x.shape[-1] + ys[0].shape[-1]
            if self.s2d:
                in_ch //= 4
            kernel = get_param('conv0_kernel', xavier_uniform,
                               (k, k, in_ch, self.ndf))
            bias = get_param('conv0_bias',
                             torch_conv_bias_init(in_ch * k * k),
                             (self.ndf,)).astype(self.dtype)
            kd = kernel.astype(self.dtype)
            if self.s2d:
                from ..ops.s2d import conv2d_s2d
                hs = list(conv2d_s2d(x, kd, bias=bias, x2s=ys))
            else:
                hs = list(conv2d(x, kd, stride=2, padding=1, bias=bias,
                                 x2s=ys))

        def tail(h):
            h = apply_activation(h, 'leakyrelu')
            nf_mult = 1
            for n in range(1, self.n_layers):
                nf_mult = min(2 ** n, 8)
                h = conv(h, self.ndf * nf_mult, stride=2, use_bias=False,
                         name=f'conv{n}')
                h = apply_activation(h, 'tanh')
                if self.norm:
                    h = instance_norm(h, eps=NORM_EPS,
                                      use_pallas=self.use_pallas)

            nf_mult = min(2 ** self.n_layers, 8)
            h = conv(h, self.ndf * nf_mult, stride=1, use_bias=False,
                     name=f'conv{self.n_layers}')
            h = apply_activation(h, 'tanh')
            if self.norm:
                h = instance_norm(h, eps=NORM_EPS,
                                  use_pallas=self.use_pallas)

            h = conv(h, 1, stride=1, use_bias=True, name='conv_out')
            # fp32 sigmoid head: bf16 saturates to exact 0/1 at
            # |logit| ~ 9, which would zero the BCE gradients (see
            # models/blocks.py)
            return apply_activation(h.astype(jnp.float32), 'sigmoid')

        outs = tuple(tail(h) for h in hs)
        return outs if paired else outs[0]
