"""Pallas im2col kernels for THIN-CHANNEL 3x3/s1/p1 convolutions.

Why (round-4 trace evidence, BENCHMARKS.md "per-conv-fusion
efficiency"): the s2d boundary convs — generator enc0 (Cin=12), the
discriminator's split conv0 (Cin=12 and Cin=4) and their weight/input
gradients — run at **3–12% of bf16 MXU peak** under XLA's conv emitter,
~1.6 ms of the 13.6 ms train step. The emitter accumulates per tap, so
its MXU contraction is Cin (4–16 of 128 lanes). The im2col form
contracts over K = 9·Cin (36–144 lanes) instead: no extra MACs, 4–9x
the lane utilisation.

TPU-native formulation (all layout-aware, nothing here is a torch
translation; reference semantics = lax.conv_general_dilated 3x3/s1/p1
as used by ops/s2d.py::_conv3):

- the input arrives TRANSPOSED and PADDED as ``[N, C, H+2, W+2]``
  (XLA-side; a thin NHWC->NCHW transpose is cheap and usually fuses
  into the producer). In this layout each of the 9 tap slabs
  ``xp[:, r:r+H, s:s+W]`` is a static sublane/lane shift, and stacking
  them along C — the MAJOR, untiled dim — is a plain VMEM copy with
  NO lane shuffles. The patch matrix ``[9C, H·W]`` then reshapes for
  free (W = lane dim is its own tile row).
- forward: one ``dot_general`` contracting the 9C dim of the patches
  with the 9C dim of the reshaped kernel -> ``y[H·W, Cout]``, fp32
  accumulation on the MXU, written back in NHWC (the [H·W, Cout] ->
  [H, W, Cout] reshape is free).
- weight grad: ``dw[9C, Cout] = patches @ dy`` contracting H·W — both
  operands already have H·W where the MXU wants it, so no transposes;
  per-sample partials accumulate into one fp32 output block across a
  sequential grid.
- input grad (col2im): ``dxp[H·W, 9C] = dy @ w9^T`` (full-width MXU),
  then the nine ``[H, W, C]`` lane-slabs of dxp are shift-added into a
  padded accumulator — the exact adjoint of patch extraction, on the
  VPU.

Everything is chunked over H inside the kernel with STATIC offsets
(Mosaic cannot lower dynamic sublane offsets, cf. conv_norm_act.py).

STATUS/measurements: see BENCHMARKS.md "thin-conv kernels" (round 4).
Enable: PATCHGAN_THIN_CONV=on|auto|off|interpret (default auto; auto
uses the kernel on TPU for supported shapes per the measured verdict
recorded below).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set cap (bytes): full-sample blocks below stay ~12 MiB
# at the 128x128 shapes this targets (v5e scoped VMEM is 16 MiB).
_MAX_VMEM = 13 * 1024 * 1024

# rows per in-kernel chunk: the matmul M dim is _BH * W
_BH = 32


def _mode():
    return os.environ.get('PATCHGAN_THIN_CONV', 'auto')


def _interpret():
    if _mode() == 'interpret':
        return True
    return jax.default_backend() != 'tpu'


# Measured full-model verdict for 'auto' mode (BENCHMARKS.md
# "thin-conv kernels", 2026-08-18): False until the kernel is shown to
# win INSIDE the full train/infer step on real hardware, per the
# dispatch-table lesson (isolated wins can invert at the fusion
# boundary). Flip to True when the full-step A/B wins.
_AUTO_WINS = False


def thin_conv_supported(x, w):
    """Gate: 3x3 kernel, thin input channels, VMEM fit, H/W tiling."""
    mode = _mode()
    if mode not in ('on', 'auto', 'interpret'):
        return False
    if mode == 'auto' and (not _AUTO_WINS
                           or jax.default_backend() != 'tpu'):
        return False  # interpreted execution would be slow-correct
    n, h, wd, cin = x.shape
    kh, kw, wcin, cout = w.shape
    if (kh, kw) != (3, 3) or wcin != cin:
        return False
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    # thin-Cin regime only: at Cin >= 64 XLA's emitter is already at
    # 40%+ MXU and owns the epilogue fusions (dispatch-table lesson);
    # at Cin = 4 the kernel LOSES (measured 0.88x infer — K = 36 of 128
    # lanes still starves the MXU and the XLA arm is cheap anyway),
    # so the supported window is 8 <= Cin <= 32
    if cin > 32 or cin < 8:
        return False
    if cout > 512 or cout % 8:
        return False
    # lane dim must be a whole number of 128-tiles for the free
    # [bh, W, C] -> [bh*W, C] merges; H must split into static chunks
    if wd % 128 or h % _BH:
        return False
    itemsize = x.dtype.itemsize
    bh = _BH
    vmem = (
        cin * (h + 2) * _ceil(wd + 2, 256) * itemsize * 2   # xp block x2
        + h * wd * _ceil(cout, 128) * itemsize * 2          # y block x2
        + 9 * cin * bh * wd * itemsize                      # patch chunk
        + bh * wd * _ceil(cout, 128) * 4                    # fp32 chunk
        + 9 * cin * _ceil(cout, 128) * 4)                   # weights
    return vmem <= _MAX_VMEM


def _ceil(v, m):
    return (v + m - 1) // m * m


def _prep(x):
    """NHWC -> padded NCHW: [N, C, H+2, W+2] (XLA side)."""
    xt = jnp.transpose(x, (0, 3, 1, 2))
    return jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1)))


def _w9(w):
    """[3, 3, C, O] -> [9C, O] matching the patch stacking order."""
    return w.reshape(9 * w.shape[2], w.shape[3])


def _patches(xp, c, h0, bh, wd):
    """Stack the nine tap slabs of rows [h0, h0+bh) along the major C
    dim: [9C, bh, W] -> [9C, bh*W]. All offsets static."""
    slabs = []
    for r in range(3):
        for s in range(3):
            slabs.append(xp[:, h0 + r:h0 + r + bh, s:s + wd])
    p = jnp.concatenate(slabs, axis=0)
    return p.reshape(9 * c, bh * wd)


def _fwd_kernel(xp_ref, wt_ref, y_ref):
    _, c, hp, wp = xp_ref.shape
    h, wd = hp - 2, wp - 2
    cout = wt_ref.shape[0]
    xp = xp_ref[0]
    for h0 in range(0, h, _BH):
        p = _patches(xp, c, h0, _BH, wd)
        # canonical MXU matmul [Cout, 9C] @ [9C, S] + a 2-D transpose:
        # measured 10% faster than the dot_general form that contracts
        # dim 0 of both operands (143 vs 160 us at 12->64)
        yt = jnp.dot(wt_ref[...], p, preferred_element_type=jnp.float32)
        y = jnp.transpose(yt.astype(y_ref.dtype), (1, 0))
        y_ref[0, h0:h0 + _BH] = y.reshape(_BH, wd, cout)


def _wgrad_kernel(xp_ref, dy_ref, dw_ref):
    _, c, hp, wp = xp_ref.shape
    h, wd = hp - 2, wp - 2
    cout = dy_ref.shape[-1]
    xp = xp_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    acc = jnp.zeros((9 * c, cout), jnp.float32)
    for h0 in range(0, h, _BH):
        p = _patches(xp, c, h0, _BH, wd)
        dy2 = dy_ref[0, h0:h0 + _BH].reshape(_BH * wd, cout)
        # dw[9C, Cout] += p @ dy2: contract the bh*W dim of both
        acc = acc + jax.lax.dot_general(
            p, dy2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dw_ref[...] += acc


# NOTE: a Pallas col2im dgrad (dxp = dy @ w9^T on the full-width MXU,
# then nine shift-adds) was built and is numerically correct in
# interpret mode, but its fold — moving the tap slabs from the
# [spatial, 9C] matmul orientation into a [C, H, W] accumulator —
# needs 3-D sublane<->lane transposes that crash this toolchain's
# Mosaic compile helper (libtpu 0.0.34; tpu_compile_helper exit 1).
# dgrad is also the SMALLEST of the three pieces (it survives DCE only
# on the discriminator's 4-channel mask side, ~0.2 ms/step), so the
# backward uses XLA's conv for dx until the lowering is revisited
# (git history has the kernel: thin_conv.py @ 4cad716^..).


def _forward(x, w):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = _prep(x)
    wt = jnp.transpose(_w9(w), (1, 0)).astype(x.dtype)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, h + 2, wd + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        interpret=_interpret(),
    )(xp, wt)


def _wgrad(x, dy, wshape):
    n, h, wd, cin = x.shape
    cout = dy.shape[-1]
    xp = _prep(x)
    dw = pl.pallas_call(
        _wgrad_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, cin, h + 2, wd + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        interpret=_interpret(),
    )(xp, dy)
    return dw.reshape(wshape)


def _dgrad(dy, w):
    """dx via XLA: conv of dy with the flipped/IO-swapped kernel."""
    wf = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(dy.dtype)
    return jax.lax.conv_general_dilated(
        dy, wf, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@jax.custom_vjp
def thin_conv3x3(x, w):
    """3x3 / stride-1 / pad-1 convolution (NHWC x HWIO) for thin Cin.

    Semantics identical to ops/s2d.py::_conv3 (and so to the
    reference's stride-2 boundary convs once composed with the s2d
    kernel rewrite); dispatched from there when supported.
    """
    return _forward(x, w)


def _vjp_fwd(x, w):
    return _forward(x, w), (x, w)


def _vjp_bwd(res, dy):
    x, w = res
    dw = _wgrad(x, dy, w.shape).astype(w.dtype)
    dx = _dgrad(dy, w.astype(dy.dtype))
    return dx, dw


thin_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)
