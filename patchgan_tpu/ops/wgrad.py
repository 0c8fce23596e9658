"""Transpose-free conv weight gradients via per-tap ``dot_general``.

Why this exists: the round-2 op-level trace (BENCHMARKS.md "Op-level
trace attribution") showed 76% of the train step's exclusive device
timeline in named copy/transpose/convert ops — dominated by activations
being transposed between the forward conv layout {3,2,1,0} (row-major
NHWC) and the filter-gradient conv layout {3,0,2,1}: XLA lowers the
conv wgrad as another convolution that contracts over N, and the TPU
conv emitter materialises the layout it wants for that.

The same contraction can be written WITHOUT any activation transpose.
For a stride-s correlation out = conv(x, w) (NHWC / HWIO),

    dw[kh,kw,ci,co] = sum_{n,h,w} xp[n, s*h+kh, s*w+kw, ci]
                                  * dy[n,h,w,co]

i.e. for each of the k*k kernel taps, a matmul contracting the
(N, H_out, W_out) axes of a strided slice of the padded input against
the cotangent. Both operands keep their native row-major NHWC layout:
the contraction covers exactly the MAJOR dims and the free dims (Ci /
Co) are the minor (lane) dims — the MXU's native "TN" orientation, so
XLA lowers each tap as a plain reduction matmul with no materialised
transpose. ``preferred_element_type=float32`` keeps bf16 accumulation
exact (the MXU accumulates fp32 natively).

The input gradient is the standard transposed convolution (a batch-dim
conv like the forward pass; it does not trigger the wgrad transposes).

Enabled with PATCHGAN_DOT_WGRAD=on (measured A/B on v5e in
BENCHMARKS.md round-3); reference has no analog (single cuDNN backend,
/root/reference/patchgan/unet.py:19).

TINY-DIM GATE: on TPU v5e (libtpu current as of round 3) the
strided-slice + dot_general tap pattern at tiny cotangent grids
returns a silently WRONG dw at a 2x2 grid (relerr ~6, batch 16) and
can hard-crash the TPU worker process outright at 16x4x4x512->512
(repro: benchmarks/repro_tapdot_tiny.py). It is bit-exact at an 8x8
grid and above. The tap-dot path therefore engages only when the
sliced tap grid is >= _MIN_TAP_GRID per side; smaller layers keep the
standard conv-lowered weight gradient, whose transposes are negligible
at those sizes (a 16x8x8x512 bf16 activation is 1 MiB — the round-2
trace's transpose cost lives in the 32px-256px layers).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ('NHWC', 'HWIO', 'NHWC')

# smallest per-side tap grid the TPU executes correctly (see module
# docstring; failures observed at 2 and 4, exact at 8)
_MIN_TAP_GRID = 8


def _tap_dot_wgrad(lhs, dy, k, stride, padding, out_dtype):
    """dw[kh,kw,ci,co] for a stride-``stride`` correlation of ``lhs``
    (N,H,W,Ci) whose output cotangent is ``dy`` (N,Ho,Wo,Co)."""
    n, _, _, ci = lhs.shape
    _, ho, wo, co = dy.shape
    xp = jnp.pad(lhs, ((0, 0), (padding, padding), (padding, padding),
                       (0, 0)))
    taps = []
    for kh in range(k):
        for kw in range(k):
            xt = lax.slice(
                xp, (0, kh, kw, 0),
                (n, kh + stride * (ho - 1) + 1,
                 kw + stride * (wo - 1) + 1, ci),
                (1, stride, stride, 1))
            taps.append(lax.dot_general(
                xt, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(k, k, ci, co)
    return dw.astype(out_dtype)


def conv2d_dw(x, w, stride, padding):
    """Strided correlation whose backward computes dw with tap-dots
    instead of a transposing conv — when the tap grid is large enough
    for the TPU to execute it correctly (module docstring); tiny
    layers keep the plain lowering (autodiff conv wgrad)."""
    k = w.shape[0]
    ho = (x.shape[1] + 2 * padding - k) // stride + 1
    wo = (x.shape[2] + 2 * padding - k) // stride + 1
    if min(ho, wo) < _MIN_TAP_GRID:
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(stride, stride),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=_DIMS)
    return _conv2d_dw(x, w, stride, padding)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv2d_dw(x, w, stride, padding):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DIMS)


def _conv2d_dw_fwd(x, w, stride, padding):
    return _conv2d_dw(x, w, stride, padding), (x, w)


def _conv2d_dw_bwd(stride, padding, res, dy):
    x, w = res
    k = w.shape[0]
    # dx: transposed conv of dy with the spatially-flipped, IO-swapped
    # kernel — a batch-dim conv, no wgrad-style transposes. When the
    # input extent does not land exactly on the last window
    # ((H + 2p - k) % s != 0, e.g. odd H with k=4 s=2 p=1), the extra
    # uncovered rows/cols get zero gradient: pad the high side by the
    # remainder so dx recovers x's full shape.
    wd = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    p = k - 1 - padding
    adj_h = (x.shape[1] + 2 * padding - k) % stride
    adj_w = (x.shape[2] + 2 * padding - k) % stride
    dx = lax.conv_general_dilated(
        dy, wd.astype(dy.dtype), window_strides=(1, 1),
        padding=[(p, p + adj_h), (p, p + adj_w)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS)
    dw = _tap_dot_wgrad(x, dy, k, stride, padding, w.dtype)
    return dx.astype(x.dtype), dw


_conv2d_dw.defvjp(_conv2d_dw_fwd, _conv2d_dw_bwd)


def conv_transpose2d_dw(x, w, stride, padding):
    """Transposed conv (pre-flipped HWIO kernel, ops/conv.py layout
    convention) with the tap-dot weight gradient. The convT tap grid
    is the INPUT's spatial extent (dw contracts x against strided
    slices of the padded cotangent), so the tiny-dim gate keys on
    x.shape — the deep 2x2/4x4 UpBlocks keep the plain lowering."""
    k = w.shape[0]
    if min(x.shape[1], x.shape[2]) < _MIN_TAP_GRID:
        p = k - 1 - padding
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=[(p, p), (p, p)], lhs_dilation=(stride, stride),
            dimension_numbers=_DIMS)
    return _conv_transpose2d_dw(x, w, stride, padding)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_transpose2d_dw(x, w, stride, padding):
    k = w.shape[0]
    p = k - 1 - padding
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(p, p), (p, p)], lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS)


def _convt2d_dw_fwd(x, w, stride, padding):
    return _conv_transpose2d_dw(x, w, stride, padding), (x, w)


def _convt2d_dw_bwd(stride, padding, res, dy):
    x, w = res
    k = w.shape[0]
    # dx: a plain stride-s correlation of dy with the flipped/IO-swapped
    # kernel (the convT's transpose is the strided conv)
    wd = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dx = lax.conv_general_dilated(
        dy, wd.astype(dy.dtype), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DIMS)
    # dw: same tap structure with the roles swapped — dy is the large
    # (padded, stride-sliced) operand, x the small one; the tap index
    # runs over the UNFLIPPED torch kernel, so flip the result back
    # into our pre-flipped storage layout:
    #   dw_stored[kh,kw] = dw_taps[k-1-kh, k-1-kw]
    dwt = _tap_dot_wgrad(dy, x, k, stride, padding, jnp.float32)
    # dwt[a,b,co,ci] contracts x as the "cotangent": transpose ci/co
    dw = jnp.flip(dwt, (0, 1)).swapaxes(2, 3)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_conv_transpose2d_dw.defvjp(_convt2d_dw_fwd, _convt2d_dw_bwd)
