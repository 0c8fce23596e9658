"""Op-level golden parity vs torch: conv, transposed conv, instance norm,
and the concat-fusion identities (ops/conv.py, ops/norm.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from patchgan_tpu.ops import conv2d, conv_transpose2d, instance_norm
from patchgan_tpu.utils.transfer import (conv_kernel_to_jax,
                                         convT_kernel_to_jax)


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def test_conv2d_matches_torch(rng):
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    w = rng.normal(size=(8, 3, 4, 4)).astype(np.float32) * 0.1
    expected = F.conv2d(torch.tensor(x), torch.tensor(w), stride=2, padding=1)
    got = conv2d(_nhwc(x), conv_kernel_to_jax(w), stride=2, padding=1)
    np.testing.assert_allclose(_nchw(got), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_conv2d_bias_matches_torch(rng):
    x = rng.normal(size=(2, 4, 10, 10)).astype(np.float32)
    w = rng.normal(size=(6, 4, 4, 4)).astype(np.float32) * 0.1
    b = rng.normal(size=(6,)).astype(np.float32)
    expected = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                        stride=1, padding=1)
    got = conv2d(_nhwc(x), conv_kernel_to_jax(w), stride=1, padding=1,
                 bias=b)
    np.testing.assert_allclose(_nchw(got), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_matches_torch(rng):
    # torch ConvTranspose2d(k=4, s=2, p=1): H_out = 2*H
    x = rng.normal(size=(2, 8, 7, 9)).astype(np.float32)
    w = rng.normal(size=(8, 5, 4, 4)).astype(np.float32) * 0.1  # (I, O, k, k)
    expected = F.conv_transpose2d(torch.tensor(x), torch.tensor(w),
                                  stride=2, padding=1)
    got = conv_transpose2d(_nhwc(x), convT_kernel_to_jax(w),
                           stride=2, padding=1)
    assert got.shape == (2, 14, 18, 5)
    np.testing.assert_allclose(_nchw(got), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_conv_concat_fusion_identity(rng):
    """conv(cat([a, b]), w) == conv(a, w[:Ca]) + conv(b, w[Ca:])."""
    a = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    b = rng.normal(size=(1, 8, 8, 5)).astype(np.float32)
    w = rng.normal(size=(4, 4, 8, 6)).astype(np.float32) * 0.1
    cat = np.concatenate([a, b], axis=-1)
    full = conv2d(cat, w, stride=2, padding=1)
    fused = conv2d(a, w, stride=2, padding=1, x2=b)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_convT_concat_fusion_identity(rng):
    a = rng.normal(size=(1, 4, 4, 6)).astype(np.float32)
    b = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    w = rng.normal(size=(4, 4, 8, 3)).astype(np.float32) * 0.1
    cat = np.concatenate([a, b], axis=-1)
    full = conv_transpose2d(cat, w)
    fused = conv_transpose2d(a, w, x2=b)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.normal(size=(3, 6, 10, 10)).astype(np.float32) * 3 + 1
    expected = F.instance_norm(torch.tensor(x), eps=1e-5)
    got = instance_norm(_nhwc(x), eps=1e-5, use_pallas=False)
    np.testing.assert_allclose(_nchw(got), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_fused_activation(rng):
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    plain = instance_norm(x, use_pallas=False)
    fused = instance_norm(x, activation='leakyrelu', use_pallas=False)
    expected = np.where(np.asarray(plain) >= 0, np.asarray(plain),
                        0.2 * np.asarray(plain))
    np.testing.assert_allclose(np.asarray(fused), expected, rtol=1e-5,
                               atol=1e-6)


def test_instance_norm_bf16_fp32_stats(rng):
    import jax.numpy as jnp
    # large offset: bf16-accumulated statistics would be catastrophically
    # wrong. Compare against fp32 normalisation of the SAME bf16-rounded
    # input so only the statistics/normalisation precision is measured.
    x = (rng.normal(size=(1, 32, 32, 4)) + 100.0).astype(np.float32)
    x_bf16 = jnp.asarray(x, jnp.bfloat16)
    ref = instance_norm(np.asarray(x_bf16, dtype=np.float32),
                        use_pallas=False)
    got = instance_norm(x_bf16, use_pallas=False)
    assert np.asarray(got).dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref), atol=0.05)


@pytest.mark.parametrize('activation',
                         [None, 'relu', 'leakyrelu', 'tanh', 'sigmoid'])
def test_instance_norm_custom_vjp_matches_autodiff(rng, activation,
                                                   monkeypatch):
    """PATCHGAN_NORM_VJP=custom: values identical, gradients equal to
    the default autodiff (the hand-written backward recomputes
    mean/rstd/xhat from x instead of saving f32 residuals)."""
    import jax
    monkeypatch.delenv('PATCHGAN_NORM_VJP', raising=False)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32) * 2 + 0.5
    dy = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)

    def loss(xx):
        return jnp.sum(instance_norm(xx, activation=activation,
                                     use_pallas=False) * dy)

    y_ref = instance_norm(x, activation=activation, use_pallas=False)
    g_ref = jax.grad(loss)(x)
    monkeypatch.setenv('PATCHGAN_NORM_VJP', 'custom')
    y_got = instance_norm(x, activation=activation, use_pallas=False)
    g_got = jax.grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(y_got), np.asarray(y_ref))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_custom_vjp_softmax_falls_back(rng, monkeypatch):
    """Unsupported fused activations keep the default autodiff path
    (still differentiable, same values)."""
    import jax
    monkeypatch.setenv('PATCHGAN_NORM_VJP', 'custom')
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    y = instance_norm(x, activation='softmax', use_pallas=False)
    g = jax.grad(lambda xx: jnp.sum(jnp.square(instance_norm(
        xx, activation='softmax', use_pallas=False))))(x)
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_conv_transpose_segregated_matches_dilated(rng):
    """The kernel-segregated lowering must be numerically identical to
    the lhs-dilated formulation (and hence to torch, via the test
    above)."""
    x = rng.normal(size=(2, 8, 6, 5)).astype(np.float32)
    w = rng.normal(size=(4, 4, 5, 7)).astype(np.float32) * 0.1
    seg = conv_transpose2d(x, w, segregated=True)
    dil = conv_transpose2d(x, w, segregated=False)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(dil),
                               rtol=1e-4, atol=1e-5)

    # with fused skip concat
    x2 = rng.normal(size=(2, 8, 6, 3)).astype(np.float32)
    w2 = rng.normal(size=(4, 4, 8, 7)).astype(np.float32) * 0.1
    seg = conv_transpose2d(x, w2, x2=x2, segregated=True)
    dil = conv_transpose2d(x, w2, x2=x2, segregated=False)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(dil),
                               rtol=1e-4, atol=1e-5)


def test_dot_wgrad_conv_matches_autodiff(rng):
    """The tap-dot weight gradient (ops/wgrad.py, PATCHGAN_DOT_WGRAD)
    must produce the same value AND gradients as autodiff of the plain
    conv lowering — for the strided conv, the transposed conv, and the
    fused-concat (x2) paths."""
    import jax
    import jax.numpy as jnp

    x = rng.normal(size=(2, 8, 6, 5)).astype(np.float32)
    x2 = rng.normal(size=(2, 8, 6, 3)).astype(np.float32)
    w = rng.normal(size=(4, 4, 8, 7)).astype(np.float32) * 0.1
    dy_seed = rng.normal(size=(1,)).astype(np.float32)  # noqa: F841

    def loss(fn):
        def f(x, x2, w):
            out = fn(x, w, x2=x2)
            return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent
        return jax.value_and_grad(f, argnums=(0, 1, 2))

    for op in (conv2d, conv_transpose2d):
        ref_v, ref_g = loss(lambda x, w, x2: op(x, w, x2=x2,
                                                dot_wgrad=False))(x, x2, w)
        got_v, got_g = loss(lambda x, w, x2: op(x, w, x2=x2,
                                                dot_wgrad=True))(x, x2, w)
        np.testing.assert_allclose(got_v, ref_v, rtol=1e-5)
        for r, g, name in zip(ref_g, got_g, ('dx', 'dx2', 'dw')):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5,
                err_msg=f'{op.__name__} {name}')


def test_dot_wgrad_tiny_dims_gate(rng):
    """Tap grids below ops/wgrad._MIN_TAP_GRID must route to the plain
    conv lowering (the TPU miscompiles/crashes tiny tap grids —
    benchmarks/repro_tapdot_tiny.py): the jaxpr of the backward must
    contain no dot_general, and values/grads still match autodiff."""
    import jax
    import jax.numpy as jnp

    x = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)   # ho=2 < 8
    w = rng.normal(size=(4, 4, 5, 7)).astype(np.float32) * 0.1

    def g(flag):
        def f(x, w):
            return jnp.sum(conv2d(x, w, dot_wgrad=flag) ** 2)
        return f

    jaxpr = jax.make_jaxpr(jax.grad(g(True), argnums=(0, 1)))(x, w)
    assert 'dot_general' not in str(jaxpr), \
        'tiny tap grid must not lower to tap-dots'
    for r, got in zip(jax.grad(g(False), argnums=(0, 1))(x, w),
                      jax.grad(g(True), argnums=(0, 1))(x, w)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)

    # ... and a grid >= the gate still takes the tap-dot path
    x8 = rng.normal(size=(2, 16, 16, 5)).astype(np.float32)  # ho=8
    jaxpr8 = jax.make_jaxpr(jax.grad(g(True), argnums=(0, 1)))(x8, w)
    assert 'dot_general' in str(jaxpr8)


def test_dot_wgrad_strided_and_nonsquare(rng):
    """Tap-dot wgrad at a non-default geometry (stride 1, non-square
    spatial dims) — the tap slicing must stay exact."""
    import jax
    import jax.numpy as jnp

    x = rng.normal(size=(3, 9, 5, 4)).astype(np.float32)
    w = rng.normal(size=(4, 4, 4, 6)).astype(np.float32) * 0.1

    def f(flag):
        def g(x, w):
            return jnp.sum(conv2d(x, w, stride=2, padding=1,
                                  dot_wgrad=flag) ** 2)
        return jax.grad(g, argnums=(0, 1))(x, w)

    for r, got in zip(f(False), f(True)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)
