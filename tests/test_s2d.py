"""Space-to-depth boundary-form parity (ops/s2d.py).

The s2d path rewrites the train step so the full-resolution few-channel
tensors (generator input/output, discriminator image/mask input) never
exist inside the program -- a TPU layout optimisation (BENCHMARKS.md
round-3 trace: XLA lays C=1 256x256 tensors out N-minor and pays
relayout copies). These tests pin the claim that the rewrite is EXACT:
same parameters, same batches, same losses/updates as the normal form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.models import Discriminator, UNet
from patchgan_tpu.ops import conv as C
from patchgan_tpu.ops import s2d as S
from patchgan_tpu.train.steps import (init_train_state, make_eval_step,
                                      make_optimizer, make_train_step)

rng = np.random.default_rng(7)


def arr(*shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


# ---------------------------------------------------------------- ops

def test_s2d_roundtrip():
    x = arr(2, 8, 10, 3)
    assert np.array_equal(S.depth_to_space(S.space_to_depth(x)), x)


@pytest.mark.parametrize('cin,cout,c2', [(1, 8, None), (3, 16, None),
                                         (4, 8, 3)])
def test_conv2d_s2d_matches_strided_conv(cin, cout, c2):
    x = arr(2, 16, 16, cin)
    w = arr(4, 4, cin + (c2 or 0), cout)
    b = arr(cout)
    x2 = arr(2, 16, 16, c2) if c2 else None
    ref = C.conv2d(x, w, bias=b, x2=x2)
    got = S.conv2d_s2d(S.space_to_depth(x), w, bias=b,
                       x2=S.space_to_depth(x2) if c2 else None)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize('cin,cout,c2', [(8, 1, None), (8, 4, 8),
                                         (16, 3, None)])
def test_conv_transpose2d_s2d_matches(cin, cout, c2):
    x = arr(2, 8, 8, cin)
    w = arr(4, 4, cin + (c2 or 0), cout)
    b = arr(cout)
    x2 = arr(2, 8, 8, c2) if c2 else None
    ref = C.conv_transpose2d(x, w, bias=b, x2=x2)
    got = S.conv_transpose2d_s2d(x, w, bias=b, x2=x2)
    np.testing.assert_allclose(got, S.space_to_depth(ref), atol=1e-5)


def test_fold_blocks_preserves_class_pixel_multisets():
    x = arr(2, 8, 8, 12)
    folded = S.fold_blocks(x)
    full = S.depth_to_space(x)
    for n in range(2):
        for c in range(3):
            a = np.sort(np.asarray(folded[n, :, :, c]).ravel())
            b = np.sort(np.asarray(full[n, :, :, c]).ravel())
            assert np.array_equal(a, b)


def test_apply_activation_s2d_softmax_per_block():
    x = arr(2, 4, 4, 12)  # C=3 classes
    got = S.depth_to_space(S.apply_activation_s2d(x, 'softmax'))
    ref = jax.nn.softmax(S.depth_to_space(x), axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # elementwise activations pass through unchanged
    np.testing.assert_allclose(S.apply_activation_s2d(x, 'sigmoid'),
                               jax.nn.sigmoid(x), atol=1e-6)


# ------------------------------------------------------------- models

def _models(s2d, final_act='sigmoid', output_nc=1, use_dropout=False):
    gen = UNet(input_nc=3, output_nc=output_nc, nf=4, final_act=final_act,
               use_dropout=use_dropout, s2d=s2d)
    disc = Discriminator(input_nc=3 + output_nc, ndf=4, n_layers=3,
                         s2d=s2d)
    return gen, disc


@pytest.mark.parametrize('final_act,output_nc', [('sigmoid', 1),
                                                 ('softmax', 3)])
def test_unet_s2d_forward_exact(final_act, output_nc):
    gen_n, _ = _models(False, final_act, output_nc)
    gen_s, _ = _models(True, final_act, output_nc)
    x = arr(2, 128, 128, 3)
    params = gen_n.init(jax.random.PRNGKey(0), x)['params']
    # identical parameter tree: the s2d model accepts it verbatim
    ref = gen_n.apply({'params': params}, x)
    got = gen_s.apply({'params': params}, S.space_to_depth(x))
    np.testing.assert_allclose(S.depth_to_space(got), ref, atol=2e-5)


def test_disc_s2d_forward_exact():
    _, disc_n = _models(False)
    _, disc_s = _models(True)
    x, y = arr(2, 128, 128, 3), arr(2, 128, 128, 1)
    params = disc_n.init(jax.random.PRNGKey(1), x, y)['params']
    ref = disc_n.apply({'params': params}, x, y)
    got = disc_s.apply({'params': params}, S.space_to_depth(x),
                       S.space_to_depth(y))
    np.testing.assert_allclose(got, ref, atol=2e-5)


# ---------------------------------------------------------- train step

@pytest.mark.parametrize('loss_type,output_nc,final_act', [
    ('tversky', 1, 'sigmoid'),
    ('weighted_bce', 3, 'softmax'),
])
def test_train_step_s2d_parity(loss_type, output_nc, final_act):
    """Same init, same batches: the s2d step produces the same losses
    and parameter updates as the normal step (dropout ON: enc0's mask
    shape is identical in both modes, so even rng effects line up)."""
    losses_by_mode, params_by_mode = {}, {}
    x = arr(2, 128, 128, 3)
    y = jnp.asarray(
        rng.uniform(size=(2, 128, 128, output_nc)) > 0.5, jnp.float32)
    for s2d in (False, True):
        gen, disc = _models(s2d, final_act, output_nc, use_dropout=True)
        gen_tx = make_optimizer(1e-3)
        disc_tx = make_optimizer(1e-3)
        state = init_train_state(gen, disc, (2, 128, 128, 3), output_nc,
                                 gen_tx, disc_tx, seed=3)
        step = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                       loss_type=loss_type, seg_alpha=10.0))
        for _ in range(2):
            state, losses = step(state, x, y)
        losses_by_mode[s2d] = losses
        params_by_mode[s2d] = state.g_params
    for k in losses_by_mode[False]:
        np.testing.assert_allclose(losses_by_mode[True][k],
                                   losses_by_mode[False][k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    flat_n = jax.tree_util.tree_leaves(params_by_mode[False])
    flat_s = jax.tree_util.tree_leaves(params_by_mode[True])
    for a, b in zip(flat_n, flat_s):
        assert a.shape == b.shape  # identical (checkpoint-compatible) tree
        # tolerance is set by the Adam update scale (lr=1e-3 per step):
        # a near-zero gradient differing in its last fp32 accumulation
        # bits can flip one normalised update's sign
        np.testing.assert_allclose(b, a, rtol=1e-2, atol=5e-4)


def test_eval_step_s2d_parity():
    x = arr(2, 128, 128, 3)
    y = jnp.asarray(rng.uniform(size=(2, 128, 128, 1)) > 0.5, jnp.float32)
    out = {}
    for s2d in (False, True):
        gen, disc = _models(s2d)
        gen_tx = make_optimizer(1e-3)
        disc_tx = make_optimizer(1e-3)
        state = init_train_state(gen, disc, (2, 128, 128, 3), 1,
                                 gen_tx, disc_tx, seed=5)
        ev = jax.jit(make_eval_step(gen, disc, compute_iou=True))
        out[s2d] = ev(state, x, y)
    for k in out[False]:
        np.testing.assert_allclose(out[True][k], out[False][k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


# ----------------------------------------------------- inference engine

def test_inference_engine_s2d_matches_plain(monkeypatch):
    """The engine's default s2d tiled forward (engine.py __init__)
    returns the same stitched masks as the plain form, including on a
    non-square image smaller than the tile."""
    from patchgan_tpu.inference.engine import InferenceEngine

    gen, _ = _models(False)
    params = gen.init(jax.random.PRNGKey(5),
                      jnp.zeros((1, 128, 128, 3)))['params']
    img = rng.uniform(size=(150, 200, 3)).astype(np.float32)
    small = rng.uniform(size=(90, 70, 3)).astype(np.float32)

    monkeypatch.setenv('PATCHGAN_S2D', 'on')
    e_s2d = InferenceEngine(gen, params, size=128, batch_size=4)
    assert e_s2d._s2d
    monkeypatch.setenv('PATCHGAN_S2D', 'off')
    e_plain = InferenceEngine(gen, params, size=128, batch_size=4)
    assert not e_plain._s2d

    for image in (img, small):
        a = e_s2d.predict_image(image)
        b = e_plain.predict_image(image)
        assert a.shape == image.shape[:2]
        np.testing.assert_allclose(a, b, atol=2e-5)

    # a module already in s2d form works too (the engine derives the
    # plain clone for the spatial path and uses the module as-is)
    monkeypatch.setenv('PATCHGAN_S2D', 'on')
    gen_s, _ = _models(True)
    e_pre = InferenceEngine(gen_s, params, size=128, batch_size=4)
    np.testing.assert_allclose(e_pre.predict_image(img),
                               e_plain.predict_image(img), atol=2e-5)
