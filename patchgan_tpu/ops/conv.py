"""TPU-native conv / transposed-conv primitives (NHWC / HWIO layouts).

These reproduce the exact output geometry of the reference's
``nn.Conv2d(k=4, s=2, p=1)`` and ``nn.ConvTranspose2d(k=4, s=2, p=1)``
layers (/root/reference/patchgan/unet.py:19,53, disc.py:19-46) but in the
TPU-friendly NHWC activation / HWIO kernel layouts so XLA can tile them
straight onto the MXU. In bf16 the MXU accumulates in fp32 natively, so
convs run wholly in the compute dtype.

Transposed convolution is expressed as a regular convolution over an
lhs-dilated input (stride-1 conv, lhs_dilation=s, padding k-1-p) with the
kernel stored **pre-flipped** in HWIO layout. A torch ConvTranspose2d
weight of shape (C_in, C_out, kH, kW) maps to our layout via
``flip(w, (2, 3)).transpose(2, 3, 0, 1)`` (see utils/transfer.py); with
that mapping the two ops are numerically identical, which golden tests
against torch verify.

Both ops also take an optional second input that is (logically)
channel-concatenated with the first. ``conv(cat([a, b], C), w)`` is
computed as ``conv(a, w[:, :, :Ca]) + conv(b, w[:, :, Ca:])``, which is
exact (convolution is linear in input channels) and avoids ever
materialising the concatenated tensor in HBM -- this fuses the reference's
skip-connection ``torch.cat`` (unet.py:127) and discriminator input
``torch.cat`` (trainer.py:65,96,98) into the convs themselves.
"""

import os

import jax.numpy as jnp
from jax import lax

# kernel-segregated transposed conv (see conv_transpose2d); override via
# PATCHGAN_SEGREGATED_CONVT=on|off. Default OFF: measured on TPU v5e,
# XLA's conv emitter already skips the dilation zeros, so the segregated
# form is neutral for training (0.99x) and loses at inference (0.70x --
# the quadrant stack/interleave costs more than the saved MACs).
_SEGREGATED_DEFAULT = os.environ.get('PATCHGAN_SEGREGATED_CONVT',
                                     'off') == 'on'

# transpose-free tap-dot weight gradients (ops/wgrad.py): replaces the
# conv-wgrad-as-conv lowering (which transposes every activation to the
# {3,0,2,1} layout, 76% of the round-2 step timeline) with per-tap
# dot_generals in native NHWC layout. PATCHGAN_DOT_WGRAD=on|off, read
# per trace so benchmark harnesses can A/B variants in one process.


def _dot_wgrad_default():
    return os.environ.get('PATCHGAN_DOT_WGRAD', 'off') == 'on'


_DIMS = ('NHWC', 'HWIO', 'NHWC')


def conv2d(x, w, stride=2, padding=1, bias=None, x2=None,
           x2s=None, dot_wgrad=None):
    """2-D convolution, NHWC input, HWIO kernel.

    Matches torch Conv2d(kernel, stride, padding) geometry. If ``x2`` is
    given, behaves as conv(concat([x, x2], axis=-1), w).
    ``x2s`` (a tuple of second inputs sharing one shape) returns a TUPLE
    of outputs that share the x-part conv as a single hoisted value:
    each element equals ``conv2d(x, w, x2=m)`` bit-exactly, but the
    backward contracts the x-part weight gradient ONCE over the summed
    cotangents (the paired-discriminator form, models/disc.py).
    ``dot_wgrad`` (default: PATCHGAN_DOT_WGRAD env) swaps in the
    transpose-free tap-dot weight gradient (ops/wgrad.py).
    """
    pad = [(padding, padding), (padding, padding)]
    strides = (stride, stride)
    if dot_wgrad is None:
        dot_wgrad = _dot_wgrad_default()

    def one(inp, ker):
        if dot_wgrad:
            from .wgrad import conv2d_dw
            return conv2d_dw(inp, ker, stride, padding)
        return lax.conv_general_dilated(
            inp, ker.astype(inp.dtype), window_strides=strides,
            padding=pad, dimension_numbers=_DIMS)

    if x2s is not None:
        assert x2 is None, "conv2d: pass x2 OR x2s, not both"
        c1 = x.shape[-1]
        shared = one(x, w[:, :, :c1, :])
        outs = tuple(shared + one(m.astype(x.dtype), w[:, :, c1:, :])
                     for m in x2s)
        if bias is not None:
            outs = tuple(o + bias.astype(o.dtype) for o in outs)
        return outs
    if x2 is None:
        out = one(x, w)
    else:
        c1 = x.shape[-1]
        out = one(x, w[:, :, :c1, :]) + one(x2.astype(x.dtype),
                                            w[:, :, c1:, :])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose2d(x, w, stride=2, padding=1, bias=None, x2=None,
                     segregated=None, dot_wgrad=None):
    """2-D transposed convolution, NHWC input, pre-flipped HWIO kernel.

    Matches torch ConvTranspose2d(k, stride, padding) geometry:
    H_out = (H-1)*stride - 2*padding + k. Two lowerings:

    - lhs-dilated: a stride-1 conv with lhs_dilation=stride and padding
      k-1-padding (the textbook formulation; XLA may multiply by the
      inserted zeros);
    - kernel-segregated (cf. PAPERS.md, arXiv:2209.03704): for k=4, s=2,
      p=1 each output-pixel parity class (di, dj) in {0,1}^2 depends on
      a disjoint 2x2 sub-kernel, so the op becomes four stride-1 2x2
      convolutions interleaved into the output -- 4x fewer MACs IF the
      backend multiplies through the dilation zeros (XLA TPU does not,
      so this lowering is off by default; see _SEGREGATED_DEFAULT).

    ``segregated=None`` follows the environment default. If ``x2`` is given, behaves as
    conv_transpose(concat([x, x2], axis=-1), w).
    """
    k = w.shape[0]
    if segregated is None:
        segregated = _SEGREGATED_DEFAULT
    if dot_wgrad is None:
        dot_wgrad = _dot_wgrad_default()
    if segregated and k == 4 and stride == 2 and padding == 1:
        out = _conv_transpose_segregated(x, w, x2)
    else:
        p = k - 1 - padding
        pad = [(p, p), (p, p)]

        def one(inp, ker):
            if dot_wgrad:
                from .wgrad import conv_transpose2d_dw
                return conv_transpose2d_dw(inp, ker, stride, padding)
            return lax.conv_general_dilated(
                inp, ker.astype(inp.dtype), window_strides=(1, 1),
                padding=pad, lhs_dilation=(stride, stride),
                dimension_numbers=_DIMS)

        if x2 is None:
            out = one(x, w)
        else:
            c1 = x.shape[-1]
            out = one(x, w[:, :, :c1, :]) + one(x2.astype(x.dtype),
                                                w[:, :, c1:, :])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv_transpose_segregated(x, w, x2=None):
    """Kernel-segregated transposed conv for k=4, s=2, p=1.

    Derivation (per spatial dim, pre-flipped kernel wf, H -> 2H):
      out[2t]   = x[t-1]*wf[0] + x[t]*wf[2]   (pad x left by 1)
      out[2t+1] = x[t]*wf[1]   + x[t+1]*wf[3] (pad x right by 1)
    i.e. each parity selects the stride-2 sub-kernel wf[di::2] and a
    one-sided padding; in 2D the four (di, dj) classes each run a 2x2
    stride-1 convolution, interleaved back via reshape.
    """
    n, h, wd, _ = x.shape
    c_out = w.shape[-1]

    def quadrant(di, dj):
        pad = [(1, 0) if di == 0 else (0, 1),
               (1, 0) if dj == 0 else (0, 1)]
        sub = w[di::2, dj::2]  # (2, 2, C_in, C_out)

        def one(inp, ker):
            return lax.conv_general_dilated(
                inp, ker.astype(inp.dtype), window_strides=(1, 1),
                padding=pad, dimension_numbers=_DIMS)

        if x2 is None:
            return one(x, sub)
        c1 = x.shape[-1]
        return one(x, sub[:, :, :c1, :]) + one(x2.astype(x.dtype),
                                               sub[:, :, c1:, :])

    # (N, H, W, C) quadrants -> (N, H, 2, W, 2, C) -> (N, 2H, 2W, C)
    rows = [jnp.stack([quadrant(di, 0), quadrant(di, 1)], axis=3)
            for di in (0, 1)]
    out = jnp.stack(rows, axis=2)  # (N, H, 2, W, 2, C)
    return out.reshape(n, 2 * h, 2 * wd, c_out)
