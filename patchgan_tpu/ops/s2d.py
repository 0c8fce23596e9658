"""Space-to-depth formulation of the stride-2 boundary convolutions.

Why this exists (TPU-specific): the trace attribution (BENCHMARKS.md
round-3) shows the full-resolution few-channel tensors — the generator's
``[N, 256, 256, 1]`` output and the discriminator's image/mask input —
are pathological for TPU lane tiling: XLA lays a 1-channel tensor out
N-minor (``{0,3,2,1:T(2,128)}``) and spends ~mses/step copying between
that and the C-minor layouts its producers/consumers want. The fix is to
never materialise full-resolution tensors inside the train step:

- the input image/mask enter as their space-to-depth form
  ``[N, H/2, W/2, 4C]`` (channel order ``(dy, dx, c)``), converted once
  at the jit boundary;
- every stride-2 *boundary* conv (generator enc0, discriminator conv0)
  becomes a stride-1 3x3 convolution over the s2d grid with a
  rearranged-and-zero-padded kernel — numerically identical, and with a
  4x-richer channel dimension for the MXU;
- the generator's final transposed conv *produces* the s2d form
  directly: its four output-parity classes (each a 2x2 stride-1 conv,
  cf. ops/conv.py::_conv_transpose_segregated) land in four channel
  blocks instead of being interleaved back to full resolution;
- losses are computed on the s2d tensors. Elementwise losses with
  per-(sample, class) reductions are invariant under the in-sample
  pixel permutation once the s2d block axis is folded back into a
  spatial axis (``fold_blocks``, a free reshape-view).

Everything here consumes the ORIGINAL ``[4, 4, Cin, Cout]`` parameters,
so checkpoints, the torch transfer layer, and optimizer state are
unchanged — the s2d path is a train-step-internal rewrite, not a model
change.

Kernel-rearrangement derivations (1-D, stride 2, k=4, p=1):

Down conv: ``out[t] = sum_k x[2t + k - 1] w[k]``. The original input
index ``2t+k-1`` lands on s2d row ``t + r - 1`` (r in 0..2) and parity
``dy``, with ``k = 2r + dy - 1``. So the s2d conv is 3x3/stride-1/pad-1
with ``K[r, s, (dy, dx, cin), cout] = w[2r+dy-1, 2s+dx-1, cin, cout]``
(zero where the index leaves 0..3). Built below by zero-padding w to
6x6 and taking a strided reshape — no gathers.

Up (transposed) conv with pre-flipped kernel wf (ops/conv.py):
``out[2t + d] = x[t-1+r] wf[2r - d]`` summed where ``0 <= 2r-d <= 3``,
so the s2d-output conv is 3x3/stride-1/pad-1 with
``K[r, s, cin, (dy, dx, cout)] = wf[2r-dy, 2s-dx, cin, cout]`` (zero
outside 0..3).
"""

import jax.numpy as jnp
from jax import lax

from .activations import apply_activation

_DIMS = ('NHWC', 'HWIO', 'NHWC')


def space_to_depth(x):
    """[N, 2H, 2W, C] -> [N, H, W, 4C], channel order (dy, dx, c)."""
    n, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(n, h, 2, w, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, 4 * c)


def depth_to_space(x):
    """[N, H, W, 4C] -> [N, 2H, 2W, C] (inverse of space_to_depth)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def fold_blocks(x):
    """[N, H, W, 4C] s2d tensor -> [N, H, 4W, C] view.

    Folds the 2x2 parity blocks into the W axis so per-(sample, class)
    loss reductions see exactly the original per-class pixel multiset.
    A pure reshape of adjacent axes — XLA lowers it to a bitcast.
    """
    n, h, w, c4 = x.shape
    return x.reshape(n, h, w * 4, c4 // 4)


def apply_activation_s2d(x, name):
    """Activation on an s2d tensor, equal per original pixel.

    Elementwise activations pass through; 'softmax' (defined over the
    channel axis of the ORIGINAL tensor) runs per (dy, dx) parity block
    so each original pixel is normalised over its own C classes.
    """
    if name == 'softmax':
        n, h, w, c4 = x.shape
        x = x.reshape(n, h, w, 4, c4 // 4)
        return apply_activation(x, name).reshape(n, h, w, c4)
    return apply_activation(x, name)


def down_kernel_s2d(w):
    """[4, 4, Cin, Cout] k4/s2/p1 kernel -> [3, 3, 4Cin, Cout] for the
    equivalent stride-1 conv on the s2d input."""
    cin, cout = w.shape[2], w.shape[3]
    # K[r, dy] = w[2r + dy - 1]  ->  pad to 6 and read wp[2r + dy]
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    k = wp.reshape(3, 2, 3, 2, cin, cout)          # [r, dy, s, dx, ...]
    k = k.transpose(0, 2, 1, 3, 4, 5)              # [r, s, dy, dx, ...]
    return k.reshape(3, 3, 4 * cin, cout)


def up_kernel_s2d(wf):
    """[4, 4, Cin, Cout] pre-flipped convT kernel -> [3, 3, Cin, 4Cout]
    for the stride-1 conv that PRODUCES the s2d output form."""
    cin, cout = wf.shape[2], wf.shape[3]
    # K[r, dy] = wf[2r - dy]  ->  pad to 6 and read wp[2r + (1 - dy)];
    # flipping the parity axis turns (1 - dy) back into dy-indexed order
    wp = jnp.pad(wf, ((1, 1), (1, 1), (0, 0), (0, 0)))
    k = wp.reshape(3, 2, 3, 2, cin, cout)          # [r, 1-dy, s, 1-dx]
    k = k[:, ::-1, :, ::-1]                        # [r, dy, s, dx, ...]
    k = k.transpose(0, 2, 4, 1, 3, 5)              # [r, s, cin, dy, dx]
    return k.reshape(3, 3, cin, 4 * cout)


def _conv3(x, k):
    # thin-channel boundary convs (enc0 / disc conv0 / dec6 head): XLA's
    # per-tap conv emitter runs these at 3-12% MXU (BENCHMARKS.md #16).
    # Two escapes, dispatched here:
    # - opt-in Pallas im2col kernel (ops/pallas/thin_conv.py; neutral at
    #   full-step level on the current toolchain, BENCHMARKS.md #18);
    # - pure-XLA tap-dot forms (ops/tapdot.py) that keep layout/fusion
    #   control inside XLA (BENCHMARKS.md "tap-dot thin convs").
    from .pallas.thin_conv import thin_conv3x3, thin_conv_supported
    if thin_conv_supported(x, k):
        return thin_conv3x3(x, k)
    from .tapdot import tapdot_conv3, tapdot_form
    if tapdot_form(x, k) is not None:
        return tapdot_conv3(x, k)
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=_DIMS)


def conv2d_s2d(x, w, bias=None, x2=None, x2s=None):
    """conv2d(orig, w, stride=2, padding=1) on an s2d input.

    ``x`` (and optional ``x2``) are s2d tensors [N, H, W, 4C]; ``w`` is
    the ORIGINAL [4, 4, Cin(+Cin2), Cout] kernel. Exactly equal to
    ``conv2d(depth_to_space(x), w, x2=depth_to_space(x2))``.
    ``x2s`` mirrors conv2d's tuple form: one output per mask, the
    x-part conv shared as a single hoisted value (the paired-
    discriminator backward, models/disc.py).
    """
    c1 = x.shape[-1] // 4
    if x2s is not None:
        assert x2 is None, "conv2d_s2d: pass x2 OR x2s, not both"
        shared = _conv3(x, down_kernel_s2d(w[:, :, :c1, :]))
        wm = down_kernel_s2d(w[:, :, c1:, :])
        outs = tuple(shared + _conv3(m.astype(x.dtype), wm) for m in x2s)
        if bias is not None:
            outs = tuple(o + bias.astype(o.dtype) for o in outs)
        return outs
    if x2 is None:
        out = _conv3(x, down_kernel_s2d(w))
    else:
        out = _conv3(x, down_kernel_s2d(w[:, :, :c1, :])) + \
            _conv3(x2.astype(x.dtype), down_kernel_s2d(w[:, :, c1:, :]))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose2d_s2d(x, w, bias=None, x2=None):
    """conv_transpose2d(x, w, stride=2, padding=1) with the output left
    in s2d form: [N, H, W, Cin] -> [N, H, W, 4Cout].

    Exactly equal to ``space_to_depth(conv_transpose2d(x, w, x2=x2))``.
    """
    if x2 is None:
        out = _conv3(x, up_kernel_s2d(w))
    else:
        c1 = x.shape[-1]
        out = _conv3(x, up_kernel_s2d(w[:, :, :c1, :])) + \
            _conv3(x2.astype(x.dtype), up_kernel_s2d(w[:, :, c1:, :]))
    if bias is not None:
        # s2d output channels are (dy, dx, c): the per-c bias repeats
        # across the four parity blocks.
        out = out + jnp.tile(bias, 4).astype(out.dtype)
    return out
