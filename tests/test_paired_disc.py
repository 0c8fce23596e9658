"""Paired discriminator forward (models/disc.py tuple-of-masks form).

The train step's D loss evaluates the critic on (x, y_real) and
(x, y_fake) -- one image, two masks (reference trainer.py:96-99). The
paired form shares conv0's image-part value between the two branches so
its weight gradient becomes ONE contraction of the summed cotangents
(autodiff cannot merge the two wgrads across separate module applies).
These tests pin:

- forward bit-exactness vs two separate applies (plain and s2d forms);
- gradient equivalence (allclose: the merged wgrad reorders the two
  contributions' summation, which is exact math but not bit-order);
- full train-step equivalence with ``paired_disc=True``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.models import Discriminator
from patchgan_tpu.ops.s2d import space_to_depth


def _data(seed=0, n=2, hw=32, cm=1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, hw, hw, 3)).astype(np.float32)
    y1 = (rng.uniform(size=(n, hw, hw, cm)) > 0.5).astype(np.float32)
    y2 = rng.uniform(size=(n, hw, hw, cm)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y1), jnp.asarray(y2)


@pytest.mark.parametrize('s2d', [False, True])
def test_paired_forward_bit_exact(s2d):
    disc = Discriminator(input_nc=4, ndf=8, n_layers=3, s2d=s2d,
                         use_pallas=False)
    x, y1, y2 = _data()
    if s2d:
        x, y1, y2 = (space_to_depth(a) for a in (x, y1, y2))
    params = disc.init(jax.random.PRNGKey(0), x, y1)['params']

    sep1 = disc.apply({'params': params}, x, y1)
    sep2 = disc.apply({'params': params}, x, y2)
    pair = disc.apply({'params': params}, x, (y1, y2))

    assert isinstance(pair, tuple) and len(pair) == 2
    # identical op structure and association order -> bitwise equal
    np.testing.assert_array_equal(np.asarray(pair[0]), np.asarray(sep1))
    np.testing.assert_array_equal(np.asarray(pair[1]), np.asarray(sep2))


@pytest.mark.parametrize('s2d', [False, True])
def test_paired_gradients_match_separate(s2d):
    disc = Discriminator(input_nc=4, ndf=8, n_layers=3, s2d=s2d,
                         use_pallas=False)
    x, y1, y2 = _data(seed=3)
    if s2d:
        x, y1, y2 = (space_to_depth(a) for a in (x, y1, y2))
    params = disc.init(jax.random.PRNGKey(1), x, y1)['params']

    def loss_sep(p):
        a = disc.apply({'params': p}, x, y1)
        b = disc.apply({'params': p}, x, y2)
        return jnp.mean(a ** 2) + jnp.mean((1.0 - b) ** 2)

    def loss_pair(p):
        a, b = disc.apply({'params': p}, x, (y1, y2))
        return jnp.mean(a ** 2) + jnp.mean((1.0 - b) ** 2)

    v1, g1 = jax.value_and_grad(loss_sep)(params)
    v2, g2 = jax.value_and_grad(loss_pair)(params)
    assert np.allclose(v1, v2, rtol=0, atol=0)   # forwards bit-equal
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat2[path]),
            rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_resolve_paired_disc_precedence(monkeypatch):
    """Default-resolution rules (train/steps.py resolve_paired_disc):
    explicit paired_disc wins; an explicit merged_disc=True keeps the
    merged form (otherwise it would be a silent no-op, since
    disc_real_fake resolves paired before merged); the env gate opts
    out; duck-typed heads without the tuple signature never pair."""
    from patchgan_tpu.train.steps import resolve_paired_disc

    disc = Discriminator(input_nc=4, ndf=4, n_layers=2)
    monkeypatch.delenv('PATCHGAN_PAIRED_DISC', raising=False)
    assert resolve_paired_disc(None, False, disc) is True
    assert resolve_paired_disc(None, True, disc) is False
    assert resolve_paired_disc(True, True, disc) is True
    assert resolve_paired_disc(False, False, disc) is False

    monkeypatch.setenv('PATCHGAN_PAIRED_DISC', 'off')
    assert resolve_paired_disc(None, False, disc) is False

    class DuckHead:  # no .s2d: lacks the tuple-of-masks apply form
        pass

    monkeypatch.delenv('PATCHGAN_PAIRED_DISC', raising=False)
    assert not resolve_paired_disc(None, False, DuckHead())


def test_train_step_paired_matches_default():
    """make_train_step(paired_disc=True) reproduces the default step's
    losses and parameters (the merged conv0-img wgrad only reorders a
    float sum)."""
    from patchgan_tpu.models import UNet
    from patchgan_tpu.train.steps import (init_train_state,
                                          make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
               use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=4, n_layers=3, use_pallas=False)
    tx = make_optimizer(1e-3)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(2, 128, 128, 3))
                    .astype(np.float32))
    y = jnp.asarray((rng.uniform(size=(2, 128, 128, 1)) > 0.5)
                    .astype(np.float32))

    outs = {}
    for name, paired in [('default', False), ('paired', True)]:
        state = init_train_state(gen, disc, (1, 128, 128, 3), 1, tx, tx,
                                 seed=0)
        step = jax.jit(make_train_step(gen, disc, tx, tx,
                                       paired_disc=paired))
        for _ in range(3):
            state, losses = step(state, x, y)
        outs[name] = (state, losses)

    s0, l0 = outs['default']
    s1, l1 = outs['paired']
    for k in l0:
        np.testing.assert_allclose(float(l0[k]), float(l1[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.g_params),
            jax.tree_util.tree_leaves_with_path(s1.g_params)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.d_params),
            jax.tree_util.tree_leaves_with_path(s1.d_params)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
