"""Fused InstanceNorm + activation Pallas TPU kernel, with custom VJP.

Every conv in the generator (and optionally the discriminator) is
followed by an affine-free instance norm and an elementwise activation
(reference unet.py:22-28). Unfused, XLA executes that epilogue as a
reduction pass plus a normalise/activate pass -- at least two HBM reads
and one write of the activation tensor, plus a saved normalised copy for
the backward. This kernel does the whole epilogue in ONE read and one
write per tensor (stats in fp32 in VMEM), keeps only the kernel INPUT as
the autodiff residual, and the backward kernel recomputes the cheap
VMEM-resident statistics instead of materialising them in HBM.

Math (per sample n, channel c, spatial reductions over H*W):
  fwd: xhat = (x - mean) * rsqrt(var + eps);  y = act(xhat)
  bwd: gm = g * act'(xhat)
       dx = rstd * (gm - mean(gm) - xhat * mean(gm * xhat))

Grid: one program per (sample, channel-block). Channel blocks keep the
fp32 working set bounded in VMEM regardless of layer shape; spatial dims
stay whole inside a block because they are the reduction axes.

On non-TPU backends the kernel runs in interpreter mode when forced via
PATCHGAN_PALLAS=interpret (used by tests); otherwise ops/norm.py falls
back to the XLA implementation.

STATUS (measured on TPU v5e, 256px batch-16 bf16 GAN step): the kernel
is numerically exact on hardware (fwd 1e-6, bwd 2e-5 vs XLA) but the
custom-call boundary breaks XLA's own conv-epilogue fusion, costing more
HBM traffic than the fusion saves — train 0.86x, inference 0.68x vs the
XLA path. It therefore stays opt-in (PATCHGAN_PALLAS=on) and the XLA
path is the default performance path; the kernel is kept tested as the
base for a future full conv+IN+act fusion.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUPPORTED_ACTIVATIONS = (None, 'tanh', 'relu', 'leakyrelu')

# cap on fp32 elements materialised per program (~4 MB of VMEM)
_MAX_BLOCK_ELEMS = 1 << 20


def _act(xhat, name):
    if name is None:
        return xhat
    if name == 'tanh':
        return jnp.tanh(xhat)
    if name == 'relu':
        return jnp.maximum(xhat, 0.0)
    if name == 'leakyrelu':
        return jnp.where(xhat >= 0, xhat, 0.2 * xhat)
    raise ValueError(name)


def _act_grad(xhat, name):
    if name is None:
        return jnp.ones_like(xhat)
    if name == 'tanh':
        t = jnp.tanh(xhat)
        return 1.0 - t * t
    if name == 'relu':
        return (xhat > 0).astype(xhat.dtype)
    if name == 'leakyrelu':
        return jnp.where(xhat >= 0, 1.0, 0.2).astype(xhat.dtype)
    raise ValueError(name)


def _channel_block(h, w, c):
    """Channel block size keeping the fp32 working set under the VMEM
    cap. Spatial dims are never split (they are the reduction axes), and
    Mosaic requires a non-whole block on the lane dim to be a multiple
    of 128 — so the block is either all of C or a 128-multiple divisor.
    Returns 0 when no legal blocking fits (caller falls back to XLA)."""
    limit = max(1, _MAX_BLOCK_ELEMS // (h * w))
    if c <= limit:
        return c
    best = 0
    d = 128
    while d <= limit and d <= c:
        if c % d == 0:
            best = d
        d += 128
    return best


def _interpret():
    if os.environ.get('PATCHGAN_PALLAS') == 'interpret':
        return True
    return jax.default_backend() != 'tpu'


def pallas_supported(x, activation=None):
    """Gate for the fused kernel: PATCHGAN_PALLAS=interpret forces the
    interpreter (tests), =off disables, =on enables on TPU. Default is
    currently OFF pending on-hardware validation of the Mosaic build
    (the XLA path is the numerically-identical fallback)."""
    if activation not in SUPPORTED_ACTIVATIONS:
        return False
    if x.ndim != 4:
        return False
    if _channel_block(x.shape[1], x.shape[2], x.shape[3]) == 0:
        return False  # no legal VMEM blocking for this shape
    mode = os.environ.get('PATCHGAN_PALLAS', 'off')
    if mode == 'interpret':
        return True
    if mode != 'on':
        return False
    return jax.default_backend() == 'tpu'


def _row_chunk(h, w, cb):
    """Largest divisor of h keeping per-chunk fp32 temporaries small
    (Mosaic materialises whole-array temporaries in VMEM, so elementwise
    math runs chunk-by-chunk over rows instead of over the full block)."""
    limit = max(1, (1 << 15) // (w * cb))
    hc = 1
    for d in range(1, h + 1):
        if h % d == 0 and d <= limit:
            hc = d
    return hc


def _chunk_stats(x_ref, eps):
    """Streaming per-channel mean/rstd over the (1, H, W, Cb) block:
    row-chunked fp32 accumulation, ~one chunk of temporaries live."""
    _, h, w, cb = x_ref.shape
    hc = _row_chunk(h, w, cb)

    def body(i, carry):
        s, ss = carry
        xc = x_ref[0, pl.ds(i * hc, hc), :, :].astype(jnp.float32)
        s = s + jnp.sum(xc, axis=(0, 1)).reshape(1, cb)
        ss = ss + jnp.sum(xc * xc, axis=(0, 1)).reshape(1, cb)
        return s, ss

    init = (jnp.zeros((1, cb), jnp.float32), jnp.zeros((1, cb),
                                                       jnp.float32))
    s, ss = jax.lax.fori_loop(0, h // hc, body, init)
    count = jnp.float32(h * w)
    mean = s / count
    var = ss / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    return mean.reshape(1, 1, cb), rstd.reshape(1, 1, cb), hc


def _fwd_kernel(x_ref, y_ref, *, eps, activation):
    mean, rstd, hc = _chunk_stats(x_ref, eps)
    h = x_ref.shape[1]

    def body(i, _):
        xc = x_ref[0, pl.ds(i * hc, hc), :, :].astype(jnp.float32)
        xhat = (xc - mean) * rstd
        y_ref[0, pl.ds(i * hc, hc), :, :] = \
            _act(xhat, activation).astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // hc, body, 0)


def _bwd_kernel(g_ref, x_ref, dx_ref, *, eps, activation):
    mean, rstd, hc = _chunk_stats(x_ref, eps)
    _, h, w, cb = x_ref.shape

    # pass 1: accumulate mean(gm) and mean(gm * xhat) per channel
    def acc(i, carry):
        s1, s2 = carry
        xc = x_ref[0, pl.ds(i * hc, hc), :, :].astype(jnp.float32)
        gc = g_ref[0, pl.ds(i * hc, hc), :, :].astype(jnp.float32)
        xhat = (xc - mean) * rstd
        gm = gc * _act_grad(xhat, activation)
        s1 = s1 + jnp.sum(gm, axis=(0, 1)).reshape(1, cb)
        s2 = s2 + jnp.sum(gm * xhat, axis=(0, 1)).reshape(1, cb)
        return s1, s2

    init = (jnp.zeros((1, cb), jnp.float32), jnp.zeros((1, cb),
                                                       jnp.float32))
    s1, s2 = jax.lax.fori_loop(0, h // hc, acc, init)
    count = jnp.float32(h * w)
    m1 = (s1 / count).reshape(1, 1, cb)
    m2 = (s2 / count).reshape(1, 1, cb)

    # pass 2: dx = rstd * (gm - m1 - xhat * m2)
    def write(i, _):
        xc = x_ref[0, pl.ds(i * hc, hc), :, :].astype(jnp.float32)
        gc = g_ref[0, pl.ds(i * hc, hc), :, :].astype(jnp.float32)
        xhat = (xc - mean) * rstd
        gm = gc * _act_grad(xhat, activation)
        dx_ref[0, pl.ds(i * hc, hc), :, :] = \
            (rstd * (gm - m1 - xhat * m2)).astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // hc, write, 0)


def _grid_and_block(x):
    n, h, w, c = x.shape
    cb = _channel_block(h, w, c)
    block = pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM)
    return (n, c // cb), block


def _forward(x, eps, activation):
    grid, block = _grid_and_block(x)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, activation=activation),
        grid=grid,
        in_specs=[block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x)


def _backward_pallas(g, x, eps, activation):
    """Pallas backward kernel. Currently unused on real TPUs: XLA's
    memory-space assignment insists on stack-pinning the cotangent
    outputs of backward custom calls in scoped VMEM, and at exactly
    16 MiB (every early UNet layer at batch 16 in bf16) that overflows
    the physical limit and fails compilation (observed across six
    mitigation attempts: input aliasing, batch chunking, optimization
    barriers, declared vmem limits). The interpreter path keeps this
    kernel tested; revisit when the XLA TPU MSA boundary bug is fixed.

    Standing reproducer: benchmarks/repro_vmem_bug.py. Re-confirmed on
    jax 0.9.0 / libtpu 0.0.34 (2026-08): ``Ran out of memory in memory
    space vmem while allocating on stack for %transpose_jvp___ =
    bf16[16,128,128,64]{...} custom-call ... Scoped allocation with
    size 16.02M and limit 16.00M exceeded scoped vmem limit by 16.0K``
    -- the bf16[16,128,128,64] cotangent (16.02 MiB with tiling
    padding) is pinned whole on the scoped-VMEM stack regardless of the
    kernel's own channel-blocked grid, so no kernel-side chunking can
    help.

    WORKAROUND (round 2): the 16 MiB scoped-VMEM budget is a libtpu
    FLAG, not silicon. ``LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_
    kib=17408`` compiles this kernel standalone; the full train step
    pins two such cotangents (24 MiB) and needs 25600. Measured on v5e
    with the raise: plain-XLA throughput is unchanged at 17 MiB
    (1051.7 vs 1049.3 img/s) but degrades at large raises (64 MiB
    -3.5%, 128 MiB -12%), and the full step with fused fwd+bwd
    (PATCHGAN_PALLAS=on PATCHGAN_PALLAS_BWD=on, 25 MiB) reaches
    859 img/s vs 1052 XLA -- the custom-call boundary still loses more
    fusion than the kernel saves, so the default path remains XLA and
    the backward stays opt-in via PATCHGAN_PALLAS_BWD=on."""
    grid, block = _grid_and_block(x)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, activation=activation),
        grid=grid,
        in_specs=[block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(g.shape, g.dtype),
        interpret=_interpret(),
    )(g, x)


def _backward_xla(g, x, eps, activation):
    """XLA backward (same math as _bwd_kernel): on TPU hardware the
    train-time backward runs through XLA fusions -- equal HBM traffic to
    autodiff of the unfused norm, while the forward keeps the fused
    one-read/one-write Pallas kernel."""
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 2), keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    gm = gf * _act_grad(xhat, activation)
    m1 = jnp.mean(gm, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(gm * xhat, axis=(1, 2), keepdims=True)
    return (rstd * (gm - m1 - xhat * m2)).astype(g.dtype)


def _backward(g, x, eps, activation):
    if _interpret() or \
            os.environ.get('PATCHGAN_PALLAS_BWD') == 'on':
        # on real TPUs the Pallas backward needs the scoped-VMEM limit
        # raised past the 16 MiB default (see _backward_pallas):
        #   LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=17408
        return _backward_pallas(g, x, eps, activation)
    return _backward_xla(g, x, eps, activation)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_act_pallas(x, eps=1e-5, activation=None):
    return _forward(x, eps, activation)


def _vjp_fwd(x, eps, activation):
    return _forward(x, eps, activation), x


def _vjp_bwd(eps, activation, x, g):
    return (_backward(g, x, eps, activation),)


instance_norm_act_pallas.defvjp(_vjp_fwd, _vjp_bwd)
