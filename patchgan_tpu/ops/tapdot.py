"""Pure-XLA tap-dot forms for the thin-channel boundary convolutions.

The round-4 trace (BENCHMARKS.md #16) shows the s2d boundary convs —
generator enc0 (Cin=12), the discriminator's split conv0 (Cin=12/4) and
the dec6 head pair (Cout=4) — running at 3-12% of bf16 MXU peak under
XLA's per-tap conv emitter: its MXU contraction is Cin (or its output
width Cout) of 128 lanes. The Pallas im2col kernel that fixes this in
isolation is NEUTRAL at full-step level because the custom-call
boundary costs the surrounding program its layouts and fusions
(BENCHMARKS.md #18). These reformulations stay INSIDE XLA — plain
dot_general + static slices, differentiable by autodiff — so the
compiler keeps fusion/layout control, the property that made the s2d
rewrite a shipping win (+13.5%) where Pallas lost.

- ``tapconcat_conv3`` (thin INPUT): concatenate the nine shifted input
  slabs along C, contract once with the [9*Cin, Cout] kernel
  (K = 9*Cin lanes instead of Cin). Autodiff gives a full-spatial
  wgrad contraction and a shift-add dgrad, both MXU-shaped.
- ``tapmerge_conv3`` (thin OUTPUT): contract with the kernel reshaped
  to [Cin, 9*Cout] (output width 9*Cout instead of Cout), then
  shift-add the nine tap planes. The backward mirrors it: dz is a
  shift-gather of dy and dx contracts K = 9*Cout.

Both are exact up to fp32 accumulation order (the MXU accumulates in
fp32 either way; only the tap-summation order differs).

Reference semantics: lax.conv_general_dilated 3x3/s1/p1 as used by
ops/s2d.py::_conv3 (the only call site). Gate: PATCHGAN_TAPDOT=
auto|on|off (default auto = use for the measured-win shapes; see
BENCHMARKS.md "tap-dot thin convs" for the per-shape and full-step
record).
"""

import os

import jax.numpy as jnp
from jax import lax


def _mode():
    return os.environ.get('PATCHGAN_TAPDOT', 'auto')


# The per-shape record (BENCHMARKS.md "tap-dot thin convs") is
# REGIME-split: tapconcat wins every regime that includes gradients
# (fwd+wgrad 1.20x, full train 1.68-2.14x) but loses the bare Cin=12
# forward (0.56x); tapmerge wins the bare forward (1.51x at Cout=4)
# but loses any backward. 'auto' therefore dispatches by the PROGRAM
# being traced: Trainer/train-step tracing sets 'train', the
# InferenceEngine sets 'infer'.
#
# MEASURED FULL-MODEL VERDICT (2026-08-18, BENCHMARKS.md "tap-dot thin
# convs"): every isolated win INVERTS at full-model level on this
# toolchain — train-step neutral (the patch concat materialises with
# N-minor relayout copies), inference 0.78x (tapmerge costs the head
# its convT fusion chain). Both auto sets are therefore EMPTY: XLA's
# emitter keeps the sites, PATCHGAN_TAPDOT=on stays as the opt-in
# re-probe vehicle for toolchain bumps (same protocol as the Pallas
# dispatch tables).
_AUTO_FORMS = {'train': (), 'infer': ()}

_regime = 'train'


def set_tapdot_regime(regime):
    """Set the trace-time dispatch regime ('train' or 'infer').

    Called by the Trainer (before tracing the train step) and the
    InferenceEngine (before tracing forwards). A trace-time global:
    it must be set BEFORE jit traces the program it applies to.
    """
    global _regime
    assert regime in ('train', 'infer'), regime
    _regime = regime


_MIN_THIN_CIN = 8    # below this the 9C patch tensor inherits the
#                      N-minor layout of C<8 tensors and the concat +
#                      relayout copies swamp the dot gain (profiled:
#                      ~1.7 ms/step of [16,128,128,36] traffic)
_MAX_THIN_CIN = 16   # tapconcat regime: K = 9*Cin <= 144
_MAX_THIN_COUT = 8   # tapmerge regime: N = 9*Cout <= 72


def tapdot_form(x, k):
    """Which tap-dot form (if any) to use for conv3x3(x, k)."""
    mode = _mode().lower()
    cin, cout = k.shape[2], k.shape[3]
    if k.shape[:2] != (3, 3) or cin != x.shape[-1]:
        return None
    if mode == 'auto':
        enabled = _AUTO_FORMS[_regime]
    elif mode in ('tapconcat', 'tapmerge'):   # single-form A/B arms
        enabled = (mode,)
    elif mode == 'on':
        enabled = ('tapconcat', 'tapmerge')
    else:
        # 'off' and anything unrecognised ('0', 'false', ...) DISABLE:
        # a kill switch must fail in the disabling direction
        return None
    if _MIN_THIN_CIN <= cin <= _MAX_THIN_CIN and 'tapconcat' in enabled:
        return 'tapconcat'
    if cout <= _MAX_THIN_COUT and 'tapmerge' in enabled:
        return 'tapmerge'
    return None


def tapconcat_conv3(x, k):
    """conv3x3/s1/p1 as ONE dot contracting K = 9*Cin."""
    n, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    p = jnp.concatenate(
        [xp[:, r:r + h, s:s + wd, :] for r in range(3) for s in range(3)],
        axis=-1)                                        # [N, H, W, 9C]
    k9 = k.reshape(9 * c, k.shape[3]).astype(x.dtype)   # tap-major
    return lax.dot_general(p, k9, (((3,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)


def tapmerge_conv3(x, k):
    """conv3x3/s1/p1 as ONE dot of output width 9*Cout + shift-add."""
    n, h, wd, c = x.shape
    cout = k.shape[3]
    k2 = jnp.transpose(k, (2, 0, 1, 3)).reshape(c, 9 * cout)
    z = lax.dot_general(x, k2.astype(x.dtype), (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    z = z.reshape(n, h, wd, 9, cout)
    # y[h, w] = sum_{r,s} z[h + r - 1, w + s - 1, (r, s)], zero outside:
    # pad z by 1 (zp[i + 1] = z[i]) and slice at offset r, s
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    y = jnp.zeros((n, h, wd, cout), jnp.float32)
    for r in range(3):
        for s in range(3):
            y = y + zp[:, r:r + h, s:s + wd, 3 * r + s]
    return y.astype(x.dtype)


def tapdot_conv3(x, k):
    """Dispatch conv3x3(x, k) to the gated tap-dot form (caller must
    have checked ``tapdot_form``)."""
    form = tapdot_form(x, k)
    if form == 'tapconcat':
        return tapconcat_conv3(x, k)
    assert form == 'tapmerge', form
    return tapmerge_conv3(x, k)
