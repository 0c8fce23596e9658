"""Fully fused conv(k=4,s=2,p=1) + InstanceNorm + activation forward
kernel (the BASELINE.json north-star fusion).

Unlike the epilogue-only kernel (norm_act.py), which measured SLOWER
than XLA because the custom-call boundary breaks XLA's conv fusions,
this kernel owns the convolution itself: per sample, the input block is
padded in VMEM, the stride-2 convolution runs as 16 shifted (Ho*Wo, Cin)
x (Cin, Cout) MXU matmuls over a parity-reshaped view, statistics
accumulate in fp32, and the normalised+activated output is written once
-- the conv output never round-trips HBM.

Parity-reshape trick: with 1-padding, output[i, j] needs
x_pad[2i+dy, 2j+dx] for dy, dx in [0, 4). Viewing x_pad as
(Hp/2, 2, Wp/2, 2, C), the (dy, dx) term is the contiguous slice
xv[dy//2 : dy//2+Ho, dy&1, dx//2 : dx//2+Wo, dx&1, :] -- no strided
access needed.

Scope: forward-only (training backward falls to XLA via custom_vjp,
like norm_act.py), generator DownBlock semantics (norm-then-act),
gated to shapes whose VMEM working set fits and whose channel counts
avoid catastrophic lane padding (Cin >= 16). Experimental: enable with
PATCHGAN_FUSED_CONV=interpret (tests).

STATUS: numerically exact in interpreter mode (fwd 3e-6, bwd 9e-7 vs
the XLA reference) but NOT yet compilable by Mosaic on hardware: the
parity-layout term loads are 5-D strided vector loads
(vector<HoxkxWoxkxC>) that the current Mosaic vectorizer rejects, and
the Python-unrolled alternative OOMs this host's 1-vCPU remote compile
helper. Tracked in ROADMAP.md; the per-output-row formulation that
Mosaic could lower degenerates into (Wo, Cin)x(Cin, Cout) matmuls too
small to win on the MXU.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norm_act import _act, _act_grad  # shared activation table

# VMEM working-set cap for the gate (bytes, rough accounting)
_MAX_VMEM = 10 * 1024 * 1024


def fused_conv_supported(x, w, activation):
    if os.environ.get('PATCHGAN_FUSED_CONV', 'off') not in ('on',
                                                            'interpret'):
        return False
    if activation not in (None, 'tanh', 'relu', 'leakyrelu'):
        return False
    n, h, wd, cin = x.shape
    kh, kw, wcin, cout = w.shape
    if (kh, kw) != (4, 4) or wcin != cin:
        return False
    if h % 2 or wd % 2 or h < 4 or wd < 4:
        return False
    if cin < 16:
        return False  # lane padding would blow up VMEM
    ho, wo = h // 2, wd // 2
    itemsize = x.dtype.itemsize
    vmem = ((h + 2) * (wd + 2) * max(cin, 128) * itemsize  # padded input
            + ho * wo * cout * 4                            # fp32 accum
            + 16 * cin * cout * itemsize                    # weights
            + ho * wo * max(cin, 128) * 4)                  # term slice
    return vmem <= _MAX_VMEM


def _interpret():
    if os.environ.get('PATCHGAN_FUSED_CONV') == 'interpret':
        return True
    return jax.default_backend() != 'tpu'


def _kernel(x_ref, w_ref, y_ref, xv_ref, *, eps, activation):
    _, h, wd, cin = x_ref.shape
    ho, wo = h // 2, wd // 2
    cout = w_ref.shape[-1]
    h2, w2 = h // 2, wd // 2

    # Build the 1-padded input directly in PARITY layout
    # ((h+2)/2, 2, (wd+2)/2, 2, C): padded index p = r+1 maps row r=2a+b
    # to xv[a + b, 1 - b] -- four static block copies cover all parities.
    xv_ref[...] = jnp.zeros_like(xv_ref)
    x8 = x_ref[0].reshape(h2, 2, w2, 2, cin)
    xv_ref[1:h2 + 1, 0, 1:w2 + 1, 0, :] = x8[:, 1, :, 1, :]
    xv_ref[1:h2 + 1, 0, 0:w2, 1, :] = x8[:, 1, :, 0, :]
    xv_ref[0:h2, 1, 1:w2 + 1, 0, :] = x8[:, 0, :, 1, :]
    xv_ref[0:h2, 1, 0:w2, 1, :] = x8[:, 0, :, 0, :]

    def term(i, acc):
        # i = 4*dy + dx; fori keeps the Mosaic IR 16x smaller than a
        # Python unroll (the remote compile helper OOMs otherwise); all
        # dynamic offsets index REFS (Mosaic has no value dynamic_slice)
        dy, dx = i // 4, i % 4
        sl = xv_ref[pl.ds(dy // 2, ho), pl.ds(dy % 2, 1),
                    pl.ds(dx // 2, wo), pl.ds(dx % 2, 1), :]
        lhs = sl.reshape(ho * wo, cin)
        rhs = w_ref[pl.ds(dy, 1), pl.ds(dx, 1), :, :].reshape(cin, cout)
        return acc + jnp.dot(lhs, rhs,
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, 16, term, jnp.zeros((ho * wo, cout), jnp.float32))

    # instance norm over spatial (rows of acc) per channel + activation
    count = jnp.float32(ho * wo)
    mean = jnp.sum(acc, axis=0, keepdims=True) / count
    var = jnp.sum(acc * acc, axis=0, keepdims=True) / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (acc - mean) * rstd
    y_ref[...] = _act(xhat, activation).reshape(
        1, ho, wo, cout).astype(y_ref.dtype)


def _forward(x, w, eps, activation):
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    ho, wo = h // 2, wd // 2
    x_spec = pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((4, 4, cin, cout), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, ho, wo, cout), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, activation=activation),
        grid=(n,),
        in_specs=[x_spec, w_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM(
            ((h + 2) // 2, 2, (wd + 2) // 2, 2, cin), x.dtype)],
        interpret=_interpret(),
    )(x, w)


def _xla_reference(x, w, eps, activation):
    """Unfused reference (used as the custom-vjp backward base)."""
    from ..conv import conv2d
    from ..norm import _instance_norm_xla
    out = conv2d(x, w, stride=2, padding=1)
    return _instance_norm_xla(out, eps, activation)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_conv_norm_act(x, w, eps=1e-5, activation=None):
    """conv(k4,s2,p1) -> instance norm -> activation, one HBM pass."""
    return _forward(x, w, eps, activation)


def _vjp_fwd(x, w, eps, activation):
    return _forward(x, w, eps, activation), (x, w)


def _vjp_bwd(eps, activation, residuals, g):
    x, w = residuals
    _, vjp = jax.vjp(
        lambda x_, w_: _xla_reference(x_, w_, eps, activation), x, w)
    return vjp(g)


fused_conv_norm_act.defvjp(_vjp_fwd, _vjp_bwd)
