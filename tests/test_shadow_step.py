"""Shadow-param train step (steps.make_train_step shadow_dtype):
bit-exact equivalence with the plain step.

The shadow step hoists the models' internal ``kernel.astype(dtype)``
casts into the train-state boundary (train/steps.py). Because every
conv consumes its kernel in the module dtype (fp32 heads only cast conv
OUTPUTS, models/blocks.py), consuming a pre-cast shadow tree is the
same computation -- these tests pin that equivalence to the bit, in
both bf16 and f32 module dtypes, including the emitted loss dicts and
the refreshed shadows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.models import Discriminator, UNet
from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                      make_shadows, make_train_step)


def _build(dtype, s2d=False, size=128, nf=8):
    gen = UNet(input_nc=3, output_nc=1, nf=nf, final_act='sigmoid',
               dtype=dtype, s2d=s2d, use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=nf, n_layers=2, dtype=dtype,
                         s2d=s2d, use_pallas=False)
    gen_tx = make_optimizer(1e-3)
    disc_tx = make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, size, size, 3), 1, gen_tx,
                             disc_tx, seed=0)
    return gen, disc, gen_tx, disc_tx, state


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_shadow_step_bit_exact(rng, dtype):
    gen, disc, gen_tx, disc_tx, state = _build(dtype)
    plain = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx))
    shadow = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                     shadow_dtype=dtype))
    x = rng.uniform(size=(2, 128, 128, 3)).astype(np.float32)
    y = (rng.uniform(size=(2, 128, 128, 1)) > 0.5).astype(np.float32)

    s_plain = state
    s_shadow, shadows = state, make_shadows(state, dtype)
    for _ in range(3):
        s_plain, l_plain = plain(s_plain, x, y)
        s_shadow, shadows, l_shadow = shadow(s_shadow, shadows, x, y)

    for a, b in zip(jax.tree.leaves(s_plain), jax.tree.leaves(s_shadow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in l_plain:
        np.testing.assert_array_equal(np.asarray(l_plain[k]),
                                      np.asarray(l_shadow[k]))
    # refreshed shadows == cast of the updated masters
    for a, b in zip(jax.tree.leaves(shadows),
                    jax.tree.leaves(make_shadows(s_shadow, dtype))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shadow_step_bit_exact_s2d(rng):
    """The shipping single-chip configuration: s2d boundary form."""
    dtype = jnp.bfloat16
    gen, disc, gen_tx, disc_tx, state = _build(dtype, s2d=True)
    plain = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx))
    shadow = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                     shadow_dtype=dtype))
    x = rng.uniform(size=(2, 128, 128, 3)).astype(np.float32)
    y = (rng.uniform(size=(2, 128, 128, 1)) > 0.5).astype(np.float32)

    s_plain, l_plain = plain(state, x, y)
    shadows = make_shadows(state, dtype)
    s_shadow, _, l_shadow = shadow(state, shadows, x, y)
    for a, b in zip(jax.tree.leaves(s_plain), jax.tree.leaves(s_shadow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in l_plain:
        np.testing.assert_array_equal(np.asarray(l_plain[k]),
                                      np.asarray(l_shadow[k]))


def test_shadow_step_with_accumulation(rng):
    """Gradient accumulation (optax.MultiSteps) composes with shadows."""
    dtype = jnp.bfloat16
    gen = UNet(input_nc=3, output_nc=1, nf=8, final_act='sigmoid',
               dtype=dtype, use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=8, n_layers=2, dtype=dtype,
                         use_pallas=False)
    gen_tx = make_optimizer(1e-3, every_k=2)
    disc_tx = make_optimizer(1e-3, every_k=2)
    state = init_train_state(gen, disc, (1, 128, 128, 3), 1, gen_tx,
                             disc_tx, seed=0)
    plain = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx))
    shadow = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                     shadow_dtype=dtype))
    x = rng.uniform(size=(2, 128, 128, 3)).astype(np.float32)
    y = (rng.uniform(size=(2, 128, 128, 1)) > 0.5).astype(np.float32)

    s_plain, s_shadow, shadows = state, state, make_shadows(state, dtype)
    for _ in range(4):  # two full accumulation windows
        s_plain, _ = plain(s_plain, x, y)
        s_shadow, shadows, _ = shadow(s_shadow, shadows, x, y)
    for a, b in zip(jax.tree.leaves(s_plain), jax.tree.leaves(s_shadow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
