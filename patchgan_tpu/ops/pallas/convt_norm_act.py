"""Fused transposed-conv(k=4,s=2,p=1) + InstanceNorm + activation
forward kernel -- the decoder-side counterpart of conv_norm_act.py,
built on the same parity-plane machinery (cf. kernel-segregated
transposed convolution, PAPERS.md / arXiv:2209.03704).

Math: with the pre-flipped HWIO kernel wf (ops/conv.py layout), each
output parity class (di, dj) in {0,1}^2 of a k=4 s=2 p=1 transposed
conv depends on a disjoint 2x2 sub-kernel wf[di::2, dj::2] applied as a
stride-1 conv -- so per sample the kernel computes four quadrant
buffers as 16 shifted (H*W, Cin) x (Cin, Cout) MXU matmuls over a
once-padded input view (all taps are STATIC slices: quadrant (di, dj)
term (a, b) reads xp[a+di : a+di+H, b+dj : b+dj+W]), accumulates in
fp32, computes instance-norm statistics across ALL four quadrants (=
the full 2Hx2W output spatial extent), and writes the four normalised,
activated planes.

Mosaic cannot lower strided interleaved stores, so the quadrants leave
the kernel as four separate (N, H, W, Cout) planes and XLA performs the
final (N, H, 2, W, 2, C) -> (N, 2H, 2W, C) interleave -- the transposed
conv's output never round-trips HBM un-normalised, which is where the
unfused path pays (conv write + 2 norm reads + norm write).

The decoder's skip concatenation is staged as ONE fused XLA
pad+concat write feeding the kernel (cheaper than two separate padded
refs at these shapes, and still one HBM pass over the inputs).

UpBlock semantics only (norm BEFORE activation, reference unet.py:
48-62); the no-norm decoder head keeps the XLA path. InstanceNorm is
per-channel, so the grid tiles (sample, Cout-block) and each program
owns its channels end-to-end -- this also keeps the 16.8 MB bf16
weights of the 1024->512 decoder blocks out of VMEM (each program
loads only its (4, 4, Cin, CB) slice).

Backward: XLA recompute via custom_vjp (same pattern as
conv_norm_act.py) -- measured as profitable remat at deep shapes.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norm_act import _act

# VMEM working-set cap for the gate (bytes; the accounting in
# _cout_block already doubles grid-varying blocks for Mosaic's
# pipelined prefetch, so 12M of 16M scoped VMEM is a real margin)
_MAX_VMEM = 12 * 1024 * 1024

# Measured dispatch table (benchmarks/fused_conv_table.py --convt on
# v5e, differential scan timing, bf16, batch 16):
# (H_in, W_in, Cin_total, Cout) -> regimes where fused beats XLA >5%.
_AUTO_TABLE = {}


def _interpret():
    if os.environ.get('PATCHGAN_FUSED_CONVT') == 'interpret':
        return True
    return jax.default_backend() != 'tpu'


def _cout_block(h, w, cin, cout, itemsize):
    """Largest Cout block (whole, or a 128-multiple divisor) whose
    working set fits the VMEM cap; 0 if none does.

    Every block whose index map varies across the grid is
    DOUBLE-BUFFERED by Mosaic (pipelined prefetch of the next grid
    step), so the padded input (varies over samples), the weight slice
    (varies over Cout blocks -- measured: the un-doubled accounting
    compiled 100 KiB over the 16 MiB scoped-VMEM limit at the 1024->512
    decoder shape), and the four quadrant outputs all count twice; only
    the in-kernel fp32 accumulators are single scratch."""

    def vmem(cb):
        return (2 * (h + 2) * (w + 2) * max(cin, 128) * itemsize  # xp
                + 2 * 16 * cin * cb * itemsize                    # weights
                + 2 * 4 * h * w * cb * itemsize                   # outputs
                + 4 * h * w * cb * 4)                             # fp32 acc

    if vmem(cout) <= _MAX_VMEM:
        return cout
    best = 0
    d = 128
    while d < cout:
        if cout % d == 0 and vmem(d) <= _MAX_VMEM:
            best = d
        d += 128
    return best


def fused_convt_supported(x, w, activation, skip=None, train=False):
    mode = os.environ.get('PATCHGAN_FUSED_CONVT', 'auto')
    if mode not in ('on', 'interpret', 'auto'):
        return False
    if activation not in (None, 'tanh', 'relu', 'leakyrelu'):
        return False
    n, h, wd, cx = x.shape
    cin = cx + (skip.shape[-1] if skip is not None else 0)
    kh, kw, wcin, cout = w.shape
    if (kh, kw) != (4, 4) or wcin != cin:
        return False
    if skip is not None and skip.shape[:3] != x.shape[:3]:
        return False
    if cin < 16 or cout < 128:
        return False  # catastrophic lane padding
    if mode == 'auto':
        if jax.default_backend() != 'tpu':
            return False
        if ('train' if train else 'infer') not in _AUTO_TABLE.get(
                (h, wd, cin, cout), ()):
            return False
    return _cout_block(h, wd, cin, cout, x.dtype.itemsize) > 0


def _kernel(xp_ref, w_ref, q00_ref, q01_ref, q10_ref, q11_ref, *,
            eps, activation):
    """One program: one sample, one Cout block. xp_ref is the 1-padded
    (possibly channel-concatenated) input (1, H+2, W+2, Cin)."""
    _, hp, wp, cin = xp_ref.shape
    h, w = hp - 2, wp - 2
    cb = w_ref.shape[-1]
    outs = ((q00_ref, q01_ref), (q10_ref, q11_ref))

    quads = []
    for di in (0, 1):
        for dj in (0, 1):
            acc = jnp.zeros((h * w, cb), jnp.float32)
            for a in (0, 1):
                for b in (0, 1):
                    sl = xp_ref[0, a + di:a + di + h, b + dj:b + dj + w, :]
                    lhs = sl.reshape(h * w, cin)
                    # pre-flipped sub-kernel for this parity class
                    rhs = w_ref[2 * a + di, 2 * b + dj]
                    acc = acc + jnp.dot(
                        lhs, rhs, preferred_element_type=jnp.float32)
            quads.append(acc)

    # instance norm across the full output extent: all 4 quadrants
    count = jnp.float32(4 * h * w)
    s1 = sum(jnp.sum(q, axis=0, keepdims=True) for q in quads)
    s2 = sum(jnp.sum(q * q, axis=0, keepdims=True) for q in quads)
    mean = s1 / count
    var = s2 / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    for idx, (di, dj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        ref = outs[di][dj]
        xhat = (quads[idx] - mean) * rstd
        ref[...] = _act(xhat, activation).reshape(
            1, h, w, cb).astype(ref.dtype)


def _forward(x, w, eps, activation, skip):
    n, h, wd, cx = x.shape
    cout = w.shape[-1]
    if skip is not None:
        # one padded, channel-concatenated staging copy (XLA fuses the
        # pad+concat into a single write); the conv itself never reads
        # an un-padded concat from HBM
        xin = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
    else:
        xin = x
    cin = xin.shape[-1]
    xp = jnp.pad(xin, ((0, 0), (1, 1), (1, 1), (0, 0)))

    cb = _cout_block(h, wd, cin, cout, x.dtype.itemsize)
    x_spec = pl.BlockSpec((1, h + 2, wd + 2, cin),
                          lambda i, j: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((4, 4, cin, cb), lambda i, j: (0, 0, 0, j),
                          memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, h, wd, cb), lambda i, j: (i, 0, 0, j),
                          memory_space=pltpu.VMEM)
    q_shape = jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype)
    q00, q01, q10, q11 = pl.pallas_call(
        functools.partial(_kernel, eps=eps, activation=activation),
        grid=(n, cout // cb),
        in_specs=[x_spec, w_spec],
        out_specs=[q_spec] * 4,
        out_shape=[q_shape] * 4,
        interpret=_interpret(),
    )(xp, w)

    # XLA-side interleave: (N, H, 2, W, 2, C) -> (N, 2H, 2W, C)
    rows0 = jnp.stack([q00, q01], axis=3)
    rows1 = jnp.stack([q10, q11], axis=3)
    out = jnp.stack([rows0, rows1], axis=2)
    return out.reshape(n, 2 * h, 2 * wd, cout)


def _xla_reference(x, w, eps, activation, skip):
    from ..conv import conv_transpose2d
    from ..norm import _instance_norm_xla
    out = conv_transpose2d(x, w, x2=skip)
    return _instance_norm_xla(out, eps, activation)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_convt_norm_act(x, w, eps=1e-5, activation=None, skip=None):
    """convT(k4,s2,p1) over concat(x, skip) -> instance norm -> act."""
    return _forward(x, w, eps, activation, skip)


def _vjp_fwd(x, w, eps, activation, skip):
    return _forward(x, w, eps, activation, skip), (x, w, skip)


def _vjp_bwd(eps, activation, residuals, g):
    x, w, skip = residuals
    if skip is None:
        _, vjp = jax.vjp(
            lambda x_, w_: _xla_reference(x_, w_, eps, activation, None),
            x, w)
        dx, dw = vjp(g)
        return dx, dw, None
    _, vjp = jax.vjp(
        lambda x_, w_, s_: _xla_reference(x_, w_, eps, activation, s_),
        x, w, skip)
    return vjp(g)


fused_convt_norm_act.defvjp(_vjp_fwd, _vjp_bwd)
