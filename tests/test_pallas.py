"""Fused Pallas instance-norm+activation kernel vs the XLA reference
path: forward and gradient, all supported activations, odd shapes and
channel-blocked shapes. Runs in interpreter mode on CPU
(PATCHGAN_PALLAS=interpret)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ['PATCHGAN_PALLAS'] = 'interpret'

from patchgan_tpu.ops.norm import _instance_norm_xla  # noqa: E402
from patchgan_tpu.ops.pallas.norm_act import (  # noqa: E402
    _channel_block, instance_norm_act_pallas, pallas_supported)

ACTS = [None, 'tanh', 'relu', 'leakyrelu']


@pytest.fixture(autouse=True)
def _interpret_mode():
    os.environ['PATCHGAN_PALLAS'] = 'interpret'
    yield
    os.environ.pop('PATCHGAN_PALLAS', None)


@pytest.mark.parametrize('activation', ACTS)
def test_forward_matches_xla(rng, activation):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32) * 2
                    + 1)
    expected = _instance_norm_xla(x, 1e-5, activation)
    got = instance_norm_act_pallas(x, 1e-5, activation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('activation', ACTS)
def test_gradient_matches_xla(rng, activation):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))

    def loss_pallas(x):
        return jnp.sum(jnp.square(
            instance_norm_act_pallas(x, 1e-5, activation)))

    def loss_xla(x):
        return jnp.sum(jnp.square(_instance_norm_xla(x, 1e-5, activation)))

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-5)


def test_channel_blocking_large_spatial(rng):
    # H*W*C exceeds the VMEM cap -> channel dimension is split into
    # lane-aligned (multiple-of-128) blocks
    h = w = 64
    c = 512
    cb = _channel_block(h, w, c)
    assert 0 < cb < c and cb % 128 == 0
    x = jnp.asarray(rng.normal(size=(1, h, w, c)).astype(np.float32))
    expected = _instance_norm_xla(x, 1e-5, 'relu')
    got = instance_norm_act_pallas(x, 1e-5, 'relu')
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_unsupported_blocking_falls_back():
    # (128, 128, 192): needs blocking but 192 has no 128-multiple divisor
    # -> pallas_supported must refuse so the XLA path takes over
    x = jnp.zeros((1, 128, 128, 192))
    assert _channel_block(128, 128, 192) == 0
    assert not pallas_supported(x, 'relu')


def test_non_pow2_channels(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 12)).astype(np.float32))
    got = instance_norm_act_pallas(x, 1e-5, None)
    expected = _instance_norm_xla(x, 1e-5, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_bf16_io_fp32_stats(rng):
    x32 = (rng.normal(size=(1, 16, 16, 8)) + 50.0).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    got = instance_norm_act_pallas(x, 1e-5, None)
    assert got.dtype == jnp.bfloat16
    expected = _instance_norm_xla(np.asarray(x, dtype=np.float32), 1e-5,
                                  None)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(expected), atol=0.05)


def test_supported_gate():
    x = jnp.zeros((1, 4, 4, 8))
    assert pallas_supported(x, 'relu')
    assert not pallas_supported(x, 'softmax')
    assert not pallas_supported(jnp.zeros((4, 4)), None)


def test_model_level_pallas_vs_xla(rng):
    """Full UNet forward with the Pallas epilogue matches the XLA path."""
    from patchgan_tpu.models import UNet
    x = jnp.asarray(rng.uniform(size=(1, 128, 128, 3)).astype(np.float32))
    m_pallas = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
                    use_pallas=True)
    m_xla = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
                 use_pallas=False)
    params = m_pallas.init(jax.random.PRNGKey(0), x)['params']
    out_pallas = m_pallas.apply({'params': params}, x)
    out_xla = m_xla.apply({'params': params}, x)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-5)


def test_fused_conv_norm_act_interpret(rng):
    """Experimental full conv+IN+act fusion: exact vs the unfused
    reference in interpreter mode (hardware lowering tracked in
    ROADMAP.md)."""
    os.environ['PATCHGAN_FUSED_CONV'] = 'interpret'
    try:
        from patchgan_tpu.ops.pallas.conv_norm_act import (
            _xla_reference, fused_conv_norm_act, fused_conv_supported)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 16))
                        .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4, 16, 32))
                        .astype(np.float32) * 0.1)
        assert fused_conv_supported(x, w, 'relu')
        got = fused_conv_norm_act(x, w, 1e-5, 'relu')
        expected = _xla_reference(x, w, 1e-5, 'relu')
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)
        g1 = jax.grad(lambda x: jnp.sum(jnp.square(
            fused_conv_norm_act(x, w, 1e-5, 'tanh'))))(x)
        g2 = jax.grad(lambda x: jnp.sum(jnp.square(
            _xla_reference(x, w, 1e-5, 'tanh'))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)
    finally:
        os.environ.pop('PATCHGAN_FUSED_CONV', None)


def test_fused_convt_norm_act_interpret(rng):
    """Decoder-side convT+IN+act fusion: exact vs the unfused reference
    in interpreter mode, with and without the fused skip concat."""
    os.environ['PATCHGAN_FUSED_CONVT'] = 'interpret'
    try:
        from patchgan_tpu.ops.pallas.convt_norm_act import (
            _xla_reference, fused_convt_norm_act, fused_convt_supported)
        x = jnp.asarray(rng.normal(size=(2, 6, 10, 24))
                        .astype(np.float32))
        skip = jnp.asarray(rng.normal(size=(2, 6, 10, 16))
                           .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4, 40, 128))
                        .astype(np.float32) * 0.1)
        assert fused_convt_supported(x, w, 'relu', skip=skip)
        got = fused_convt_norm_act(x, w, 1e-5, 'relu', skip)
        expected = _xla_reference(x, w, 1e-5, 'relu', skip)
        assert got.shape == (2, 12, 20, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

        # backward: identical cotangent into both VJPs (isolates the
        # backward path from fp rounding of the forward outputs)
        g = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))
        _, vjp_f = jax.vjp(
            lambda a, b, s: fused_convt_norm_act(a, b, 1e-5, 'tanh', s),
            x, w, skip)
        _, vjp_r = jax.vjp(
            lambda a, b, s: _xla_reference(a, b, 1e-5, 'tanh', s),
            x, w, skip)
        for a, b in zip(vjp_f(g), vjp_r(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

        # no-skip form
        w1 = jnp.asarray(rng.normal(size=(4, 4, 24, 128))
                         .astype(np.float32) * 0.1)
        got1 = fused_convt_norm_act(x, w1, 1e-5, None, None)
        exp1 = _xla_reference(x, w1, 1e-5, None, None)
        np.testing.assert_allclose(np.asarray(got1), np.asarray(exp1),
                                   rtol=1e-4, atol=1e-5)
    finally:
        os.environ.pop('PATCHGAN_FUSED_CONVT', None)


def test_fused_convt_cout_blocking(rng):
    """Cout-block gridding (the path that keeps 1024->512 decoder
    weights under VMEM): split output channels still match."""
    os.environ['PATCHGAN_FUSED_CONVT'] = 'interpret'
    try:
        from patchgan_tpu.ops.pallas.convt_norm_act import (
            _cout_block, _xla_reference, fused_convt_norm_act)
        h = w = 8
        cin, cout = 512, 512
        cb = _cout_block(h, w, cin, cout, 4)
        assert 0 < cb < cout and cb % 128 == 0
        x = jnp.asarray(rng.normal(size=(1, h, w, cin))
                        .astype(np.float32))
        wt = jnp.asarray(rng.normal(size=(4, 4, cin, cout))
                         .astype(np.float32) * 0.05)
        got = fused_convt_norm_act(x, wt, 1e-5, 'tanh', None)
        expected = _xla_reference(x, wt, 1e-5, 'tanh', None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)
    finally:
        os.environ.pop('PATCHGAN_FUSED_CONVT', None)


def test_model_level_fused_convt_vs_xla(rng):
    """Full UNet forward with the fused convT path (interpret) matches
    the default path."""
    os.environ['PATCHGAN_FUSED_CONVT'] = 'interpret'
    try:
        from patchgan_tpu.models import UNet
        x = jnp.asarray(rng.uniform(size=(1, 128, 128, 3))
                        .astype(np.float32))
        model = UNet(input_nc=3, output_nc=1, nf=16, final_act='sigmoid',
                     use_pallas=False)
        params = model.init(jax.random.PRNGKey(0), x)['params']
        out_fused = model.apply({'params': params}, x)
        os.environ.pop('PATCHGAN_FUSED_CONVT', None)
        out_plain = model.apply({'params': params}, x)
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_plain),
                                   rtol=1e-4, atol=1e-5)
    finally:
        os.environ.pop('PATCHGAN_FUSED_CONVT', None)


def test_model_level_fused_conv_vs_xla(rng):
    """Full UNet forward with the fused conv+IN+act path (interpret)
    matches the default path."""
    os.environ['PATCHGAN_FUSED_CONV'] = 'interpret'
    try:
        from patchgan_tpu.models import UNet
        x = jnp.asarray(rng.uniform(size=(1, 128, 128, 3))
                        .astype(np.float32))
        model = UNet(input_nc=3, output_nc=1, nf=16, final_act='sigmoid',
                     use_pallas=False)
        params = model.init(jax.random.PRNGKey(0), x)['params']
        out_fused = model.apply({'params': params}, x)
        os.environ.pop('PATCHGAN_FUSED_CONV', None)
        out_plain = model.apply({'params': params}, x)
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_plain),
                                   rtol=1e-4, atol=1e-5)
    finally:
        os.environ.pop('PATCHGAN_FUSED_CONV', None)


# ---------------------------------------------------------------------
# thin-channel im2col conv kernels (ops/pallas/thin_conv.py)

def _conv3_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('cin,cout', [(12, 64), (4, 64), (16, 8)])
def test_thin_conv_forward_and_grads(rng, cin, cout):
    os.environ['PATCHGAN_THIN_CONV'] = 'interpret'
    try:
        from patchgan_tpu.ops.pallas.thin_conv import thin_conv3x3
        x = jnp.asarray(rng.normal(size=(2, 128, 128, cin))
                        .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout))
                        .astype(np.float32) * 0.1)
        np.testing.assert_allclose(np.asarray(thin_conv3x3(x, w)),
                                   np.asarray(_conv3_xla(x, w)),
                                   rtol=1e-5, atol=1e-5)

        def loss(f):
            return lambda x_, w_: jnp.sum(jnp.sin(f(x_, w_)))

        gx, gw = jax.grad(loss(thin_conv3x3), (0, 1))(x, w)
        rx, rw = jax.grad(loss(_conv3_xla), (0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   rtol=1e-4, atol=2e-3)
    finally:
        os.environ.pop('PATCHGAN_THIN_CONV', None)


def test_thin_conv_gate():
    from patchgan_tpu.ops.pallas.thin_conv import thin_conv_supported
    os.environ['PATCHGAN_THIN_CONV'] = 'interpret'
    try:
        x = jnp.zeros((2, 128, 128, 12), jnp.bfloat16)
        w = jnp.zeros((3, 3, 12, 64), jnp.bfloat16)
        assert thin_conv_supported(x, w)
        # not thin / wrong kernel / unaligned spatial -> XLA
        assert not thin_conv_supported(
            jnp.zeros((2, 128, 128, 64), jnp.bfloat16),
            jnp.zeros((3, 3, 64, 64), jnp.bfloat16))
        assert not thin_conv_supported(
            x, jnp.zeros((4, 4, 12, 64), jnp.bfloat16))
        assert not thin_conv_supported(
            jnp.zeros((2, 128, 96, 12), jnp.bfloat16),
            jnp.zeros((3, 3, 12, 64), jnp.bfloat16))
        # measured loss at Cin=4 (BENCHMARKS.md thin-conv table)
        assert not thin_conv_supported(
            jnp.zeros((2, 128, 128, 4), jnp.bfloat16),
            jnp.zeros((3, 3, 4, 64), jnp.bfloat16))
        os.environ['PATCHGAN_THIN_CONV'] = 'off'
        assert not thin_conv_supported(x, w)
    finally:
        os.environ.pop('PATCHGAN_THIN_CONV', None)


def test_thin_conv_through_s2d_boundary(rng):
    """conv2d_s2d (the enc0 / disc-conv0 dispatch site) produces the
    same result with the thin-conv kernel as with XLA, including the
    split-input (x2) form."""
    from patchgan_tpu.ops.s2d import conv2d_s2d, space_to_depth
    x = jnp.asarray(rng.normal(size=(2, 256, 256, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 256, 256, 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 4, 64)).astype(np.float32)
                    * 0.1)
    xs, x2s = space_to_depth(x), space_to_depth(x2)
    os.environ['PATCHGAN_THIN_CONV'] = 'interpret'
    try:
        got = conv2d_s2d(xs, w, x2=x2s)
    finally:
        os.environ.pop('PATCHGAN_THIN_CONV', None)
    os.environ['PATCHGAN_THIN_CONV'] = 'off'
    try:
        expected = conv2d_s2d(xs, w, x2=x2s)
    finally:
        os.environ.pop('PATCHGAN_THIN_CONV', None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)
