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

STATUS: numerically exact (interpreter fwd 3e-6 / bwd 9e-7; on-TPU
matches the unfused bf16 reference to bf16 rounding, and is in fact MORE
accurate since the conv accumulator stays fp32 into the norm). Compiles
and runs on v5e after two redesigns: parity planes are pre-split by XLA
(in-kernel 5-D parity views hit an unimplemented Mosaic strided vector
load) and the 16 terms are statically unrolled (dynamic sublane offsets
are also unlowerable).

MEASURABILITY (round 4): the early "4x run-to-run variance" problem of
naive per-dispatch timing is SOLVED -- benchmarks/fused_conv_table.py
times each shape as K chained iterations inside one jitted lax.scan and
reports the differential (long - short)/(L - S), which cancels the
axon relay's fixed dispatch cost exactly; run-to-run spread is a few
percent (dated per-shape table with variance bounds in BENCHMARKS.md,
"Pallas dispatch tables"). The verdict on this toolchain (jax 0.9.0 /
libtpu 0.0.34): XLA wins every UNet forward shape and the one isolated
train win inverts at full-model level, so `auto` == XLA everywhere and
_AUTO_TABLE ships empty. Re-run both table harnesses on toolchain
bumps; enable unconditionally with PATCHGAN_FUSED_CONV=on.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norm_act import _act  # shared activation table

# VMEM working-set cap for the gate (bytes, rough accounting)
_MAX_VMEM = 10 * 1024 * 1024

# Measured dispatch table (benchmarks/fused_conv_table.py on v5e,
# differential scan timing so the ~1 ms relay dispatch cost cancels;
# bf16, batch 16): (H, W, Cin, Cout) -> regimes ('train'/'infer') where
# the fused kernel beats XLA at FULL-MODEL level. Current state, 2026-08:
# EMPTY. Isolated per-op timing: XLA's conv emitter wins every
# forward-only UNet shape (0.14x-0.70x; the custom-call boundary plus
# lane-padded shallow matmuls cost more than the saved norm round-trip),
# and the one isolated training win -- 1.59x at 16x16x512->512, where
# fused-fwd + XLA-recompute-bwd acts as profitable remat -- INVERTS when
# enabled inside the full train step (benchmarks/step_time.py: 15.08 ms
# XLA vs 15.85 ms with enc4 fused; the boundary breaks XLA's fusion of
# the surrounding ops). 'auto' therefore currently always chooses XLA;
# the table is the mechanism for future libtpu/Mosaic versions where the
# balance shifts. Regenerate with both harnesses when kernels change.
_AUTO_TABLE = {}


def _auto_enabled(h, wd, cin, cout, train):
    regimes = _AUTO_TABLE.get((h, wd, cin, cout))
    if not regimes:
        return False
    return ('train' if train else 'infer') in regimes


def fused_conv_supported(x, w, activation, train=False):
    mode = os.environ.get('PATCHGAN_FUSED_CONV', 'auto')
    if mode not in ('on', 'interpret', 'auto'):
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
    if mode == 'auto':
        # the dispatch table is measured on TPU; on other backends the
        # kernel would run interpreted (correct but slow), so 'auto'
        # never selects it there
        if jax.default_backend() != 'tpu':
            return False
        if not _auto_enabled(h, wd, cin, cout, train):
            return False
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


def _parity_planes(x):
    """XLA-side parity split of the 1-padded input: four (N, Hp, Wp, C)
    planes with plane[py][px][n, a, b] = x_pad[n, 2a+py, 2b+px].
    Materialising these costs one extra write of x, but keeps every load
    inside the kernel a plain 4-D block slice that Mosaic can lower (the
    in-kernel 5-D parity view hits an unimplemented strided vector
    load)."""
    n, h, wd, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = (h + 2) // 2, (wd + 2) // 2
    x5 = xp.reshape(n, hp, 2, wp, 2, cin)
    return [[x5[:, :, py, :, px, :] for px in (0, 1)] for py in (0, 1)]


def _kernel(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, y_ref, *,
            eps, activation):
    _, hp, wp, cin = p00_ref.shape
    ho, wo = hp - 1, wp - 1
    cout = w_ref.shape[-1]
    planes = ((p00_ref, p01_ref), (p10_ref, p11_ref))

    # fully static unroll: Mosaic cannot lower dynamic sublane offsets,
    # and static slices let it relayout at compile time
    acc = jnp.zeros((ho * wo, cout), jnp.float32)
    for py in (0, 1):
        for px in (0, 1):
            ref = planes[py][px]
            for a in (0, 1):
                for b in (0, 1):
                    sl = ref[0, a:a + ho, b:b + wo, :]
                    lhs = sl.reshape(ho * wo, cin)
                    rhs = w_ref[2 * a + py, 2 * b + px]
                    acc = acc + jnp.dot(
                        lhs, rhs, preferred_element_type=jnp.float32)

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
    hp, wp = ho + 1, wo + 1
    planes = _parity_planes(x)
    p_spec = pl.BlockSpec((1, hp, wp, cin), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((4, 4, cin, cout), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, ho, wo, cout), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, activation=activation),
        grid=(n,),
        in_specs=[p_spec, p_spec, p_spec, p_spec, w_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        interpret=_interpret(),
    )(planes[0][0], planes[0][1], planes[1][0], planes[1][1], w)


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
