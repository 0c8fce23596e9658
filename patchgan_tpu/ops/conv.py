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

from jax import lax

_DIMS = ('NHWC', 'HWIO', 'NHWC')


def conv2d(x, w, stride=2, padding=1, bias=None, x2=None):
    """2-D convolution, NHWC input, HWIO kernel.

    Matches torch Conv2d(kernel, stride, padding) geometry. If ``x2`` is
    given, behaves as conv(concat([x, x2], axis=-1), w).
    """
    pad = [(padding, padding), (padding, padding)]
    strides = (stride, stride)

    def one(inp, ker):
        return lax.conv_general_dilated(
            inp, ker.astype(inp.dtype), window_strides=strides,
            padding=pad, dimension_numbers=_DIMS)

    if x2 is None:
        out = one(x, w)
    else:
        c1 = x.shape[-1]
        out = one(x, w[:, :, :c1, :]) + one(x2.astype(x.dtype),
                                            w[:, :, c1:, :])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose2d(x, w, stride=2, padding=1, bias=None, x2=None):
    """2-D transposed convolution, NHWC input, pre-flipped HWIO kernel.

    Matches torch ConvTranspose2d(k, stride, padding) geometry:
    H_out = (H-1)*stride - 2*padding + k. Implemented as a stride-1 conv
    with lhs_dilation=stride and padding k-1-padding, which XLA lowers to
    an MXU-friendly fused kernel. If ``x2`` is given, behaves as
    conv_transpose(concat([x, x2], axis=-1), w).
    """
    k = w.shape[0]
    p = k - 1 - padding
    pad = [(p, p), (p, p)]

    def one(inp, ker):
        return lax.conv_general_dilated(
            inp, ker.astype(inp.dtype), window_strides=(1, 1), padding=pad,
            lhs_dilation=(stride, stride), dimension_numbers=_DIMS)

    if x2 is None:
        out = one(x, w)
    else:
        c1 = x.shape[-1]
        out = one(x, w[:, :, :c1, :]) + one(x2.astype(x.dtype),
                                            w[:, :, c1:, :])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
