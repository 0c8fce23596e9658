"""Tap-dot thin-conv reformulations (ops/tapdot.py): numerical parity
with the XLA conv they replace, the dispatch gate, and the s2d
boundary-conv call site."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.ops.tapdot import (tapconcat_conv3, tapdot_form,
                                     tapmerge_conv3)


def _conv3_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('cin,cout,fn', [
    (12, 64, tapconcat_conv3), (4, 64, tapconcat_conv3),
    (64, 4, tapmerge_conv3), (128, 8, tapmerge_conv3),
])
def test_tapdot_forward_and_grads(rng, cin, cout, fn):
    x = jnp.asarray(rng.normal(size=(2, 32, 32, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                    * 0.1)
    ref = np.asarray(_conv3_xla(x, w))
    got = np.asarray(fn(x, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def loss(f):
        return lambda x_, w_: 0.5 * jnp.sum(f(x_, w_) ** 2)

    gx, gw = jax.grad(loss(fn), (0, 1))(x, w)
    rx, rw = jax.grad(loss(_conv3_xla), (0, 1))(x, w)
    scale = max(1e-6, float(np.max(np.abs(np.asarray(rx)))))
    np.testing.assert_allclose(np.asarray(gx) / scale,
                               np.asarray(rx) / scale,
                               rtol=1e-4, atol=1e-5)
    scale = max(1e-6, float(np.max(np.abs(np.asarray(rw)))))
    np.testing.assert_allclose(np.asarray(gw) / scale,
                               np.asarray(rw) / scale,
                               rtol=1e-4, atol=1e-5)


def test_tapdot_gate():
    x12 = jnp.zeros((2, 32, 32, 12), jnp.bfloat16)
    w12 = jnp.zeros((3, 3, 12, 64), jnp.bfloat16)
    x64 = jnp.zeros((2, 32, 32, 64), jnp.bfloat16)
    w_head = jnp.zeros((3, 3, 64, 4), jnp.bfloat16)
    w_deep = jnp.zeros((3, 3, 64, 128), jnp.bfloat16)
    os.environ['PATCHGAN_TAPDOT'] = 'on'
    try:
        assert tapdot_form(x12, w12) == 'tapconcat'
        assert tapdot_form(x64, w_head) == 'tapmerge'
        assert tapdot_form(x64, w_deep) is None      # both dims wide
        # wrong kernel size -> None
        assert tapdot_form(
            x12, jnp.zeros((4, 4, 12, 64), jnp.bfloat16)) is None
        os.environ['PATCHGAN_TAPDOT'] = 'off'
        assert tapdot_form(x12, w12) is None
    finally:
        os.environ.pop('PATCHGAN_TAPDOT', None)


def test_tapdot_through_s2d_boundary(rng):
    """conv2d_s2d / conv_transpose2d_s2d (the enc0 / disc-conv0 / head
    dispatch sites) produce the same result with tap-dot on and off."""
    from patchgan_tpu.ops.s2d import (conv2d_s2d, conv_transpose2d_s2d,
                                      space_to_depth)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 64)).astype(np.float32)
                    * 0.1)
    xs, x2s = space_to_depth(x), space_to_depth(x2)
    xu = jnp.asarray(rng.normal(size=(2, 32, 32, 64)).astype(np.float32))
    wu = jnp.asarray(rng.normal(size=(4, 4, 64, 1)).astype(np.float32)
                     * 0.1)

    os.environ['PATCHGAN_TAPDOT'] = 'on'
    try:
        got_down = conv2d_s2d(xs, w, x2=x2s)
        got_up = conv_transpose2d_s2d(xu, wu)
    finally:
        os.environ['PATCHGAN_TAPDOT'] = 'off'
    try:
        exp_down = conv2d_s2d(xs, w, x2=x2s)
        exp_up = conv_transpose2d_s2d(xu, wu)
    finally:
        os.environ.pop('PATCHGAN_TAPDOT', None)
    np.testing.assert_allclose(np.asarray(got_down), np.asarray(exp_down),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_up), np.asarray(exp_up),
                               rtol=1e-4, atol=1e-4)
