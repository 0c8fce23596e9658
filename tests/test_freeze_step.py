"""Frozen-subtree train step (steps.make_train_step freeze_patterns):
bit-exact vs the optimizer-mask-only step, and the frozen backward is
actually DELETED from the compiled program.

Freezing in the reference does not exist; BASELINE.json config 3 asks
for "load Torch checkpoint, freeze encoder, retrain decoder". The
optimizer-side mask (make_optimizer freeze_patterns ->
optax.set_to_zero) fixes the SEMANTICS. The COST picture (measured,
see freeze_stop_gradients' docstring): at every_k=1 the mask alone
already lets XLA DCE the encoder dgrad/wgrad convs (zeros_like
updates sever the data dependency), but under gradient accumulation
the MultiSteps accumulator keeps the raw grads live and the frozen
backward survives; the step-side freeze_stop_gradients cuts the
cotangents at the frozen leaves so the deletion holds in EVERY
optimizer configuration. These tests pin exactness, the k=1 DCE, and
the accumulation case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.models import Discriminator, UNet
from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                      make_shadows, make_train_step)

FREEZE = ('enc',)


def _build(dtype, s2d=False, size=128, nf=8):
    gen = UNet(input_nc=3, output_nc=1, nf=nf, final_act='sigmoid',
               dtype=dtype, s2d=s2d, use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=nf, n_layers=2, dtype=dtype,
                         s2d=s2d, use_pallas=False)
    gen_tx = make_optimizer(1e-3, freeze_patterns=FREEZE)
    disc_tx = make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, size, size, 3), 1, gen_tx,
                             disc_tx, seed=0)
    return gen, disc, gen_tx, disc_tx, state


def _batch(rng, n=2, size=128):
    x = rng.uniform(size=(n, size, size, 3)).astype(np.float32)
    y = (rng.uniform(size=(n, size, size, 1)) > 0.5).astype(np.float32)
    return x, y


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_freeze_stop_gradient_bit_exact(rng, dtype):
    """stop_gradient'ing the frozen leaves commutes with the optimizer
    mask exactly: same TrainState and losses over multiple steps."""
    gen, disc, gen_tx, disc_tx, state = _build(dtype)
    masked = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx))
    cut = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                  freeze_patterns=FREEZE))
    x, y = _batch(rng)

    s_a, s_b = state, state
    for _ in range(3):
        s_a, l_a = masked(s_a, x, y)
        s_b, l_b = cut(s_b, x, y)
    for a, b in zip(jax.tree.leaves(s_a), jax.tree.leaves(s_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in l_a:
        np.testing.assert_array_equal(np.asarray(l_a[k]),
                                      np.asarray(l_b[k]))


def test_freeze_stop_gradient_bit_exact_shadow_s2d(rng):
    """The shipping Trainer regime: s2d boundary form + bf16 shadow."""
    dtype = jnp.bfloat16
    gen, disc, gen_tx, disc_tx, state = _build(dtype, s2d=True)
    masked = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                     shadow_dtype=dtype))
    cut = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                  shadow_dtype=dtype,
                                  freeze_patterns=FREEZE))
    x, y = _batch(rng)

    shadows = make_shadows(state, dtype)
    s_a, sh_a, l_a = masked(state, shadows, x, y)
    s_b, sh_b, l_b = cut(state, shadows, x, y)
    for a, b in zip(jax.tree.leaves((s_a, sh_a)),
                    jax.tree.leaves((s_b, sh_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in l_a:
        np.testing.assert_array_equal(np.asarray(l_a[k]),
                                      np.asarray(l_b[k]))


def _step_flops(gen, disc, state, x, y, gen_tx, disc_tx, **kw):
    fn = make_train_step(gen, disc, gen_tx, disc_tx, **kw)
    compiled = jax.jit(fn).lower(state, x, y).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return analysis.get('flops')


def test_freeze_deletes_frozen_backward():
    """The compiled frozen step must cost measurably fewer FLOPs than
    the UNFROZEN step -- the encoder backward is DCE'd, not zeroed.
    (The mask-only arm compiles identically to the stop_gradient arm at
    every_k=1: set_to_zero's zeros_like already severs the grads' data
    dependency, so XLA DCEs either way -- pinned here too.)"""
    gen, disc, gen_tx, disc_tx, state = _build(jnp.float32)
    full_tx = make_optimizer(1e-3)
    full_state = init_train_state(gen, disc, (1, 128, 128, 3), 1,
                                  full_tx, disc_tx, seed=0)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    y = jnp.zeros((2, 128, 128, 1), jnp.float32)

    base = _step_flops(gen, disc, full_state, x, y, full_tx, disc_tx)
    mask = _step_flops(gen, disc, state, x, y, gen_tx, disc_tx)
    cut = _step_flops(gen, disc, state, x, y, gen_tx, disc_tx,
                      freeze_patterns=FREEZE)
    if not base or not cut:
        pytest.skip('backend reports no flops in cost_analysis')
    # the whole encoder backward (dgrad+wgrad, ~2x the encoder forward)
    # disappears; demand at least a 10% program-level FLOP cut
    assert cut < 0.9 * base, (cut, base)
    assert mask == cut, (mask, cut)


def test_freeze_deletes_frozen_backward_under_accumulation():
    """Gradient accumulation is where stop_gradient EARNS its keep:
    optax.MultiSteps stores the raw incoming grads in optimizer state,
    so the mask alone cannot free the frozen backward -- the
    accumulation-mode frozen step must still match the k=1 FLOP cut."""
    gen, disc, _, _, _ = _build(jnp.float32)
    gen_tx = make_optimizer(1e-3, freeze_patterns=FREEZE, every_k=2)
    disc_tx = make_optimizer(1e-3, every_k=2)
    state = init_train_state(gen, disc, (1, 128, 128, 3), 1, gen_tx,
                             disc_tx, seed=0)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    y = jnp.zeros((2, 128, 128, 1), jnp.float32)

    mask_only = _step_flops(gen, disc, state, x, y, gen_tx, disc_tx)
    cut = _step_flops(gen, disc, state, x, y, gen_tx, disc_tx,
                      freeze_patterns=FREEZE)
    if not mask_only or not cut:
        pytest.skip('backend reports no flops in cost_analysis')
    assert cut < 0.9 * mask_only, (cut, mask_only)
