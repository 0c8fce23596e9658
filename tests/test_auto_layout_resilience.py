"""AutoLayoutStep fail-loud + self-healing (VERDICT round-4 weak #3)
and the persistent-compilation-cache interaction (round 5).

The wrapper must never silently cost the measured +9.5% AUTO-layout
gain: every downgrade to the plain jitted step warns, and a poisoned
executable (the cache-layout bug, benchmarks/repro_cache_layout.py)
heals at runtime instead of crashing training.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.models import Discriminator, UNet
from patchgan_tpu.train import auto_layout
from patchgan_tpu.train.auto_layout import AutoLayoutStep
from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                      make_train_step)

NF = 4
SIZE = 128


@pytest.fixture(autouse=True)
def _fresh_warn_registry():
    """_warn_once dedups per process; each test wants its own slate."""
    auto_layout._warned.clear()
    yield
    auto_layout._warned.clear()


def build(seed=0):
    gen = UNet(input_nc=3, output_nc=1, nf=NF, final_act='sigmoid',
               use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=NF, n_layers=2, use_pallas=False)
    gtx, dtx = make_optimizer(1e-3), make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gtx, dtx,
                             seed=seed)
    step = make_train_step(gen, disc, gtx, dtx)
    return state, step


def batch(rng, n=2):
    x = jnp.asarray(rng.uniform(size=(n, SIZE, SIZE, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(n, SIZE, SIZE, 1)) > 0.5,
                    jnp.float32)
    return x, y


def make_wrapper(step):
    return AutoLayoutStep(step, jax.jit(step, donate_argnums=(0,)))


def test_engages_on_this_backend(rng):
    """The AOT AUTO-format path must actually compile here (entry not
    None): deleting the Format import or a backend regression must fail
    a test instead of silently running 9.5% slower (VERDICT weak #3)."""
    state, step = build()
    x, y = batch(rng)
    wrapper = make_wrapper(step)
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # any downgrade warning -> fail
        state, losses = wrapper(state, x, y)
    assert len(wrapper._cache) == 1
    entry = next(iter(wrapper._cache.values()))
    assert entry is not None, "AUTO path silently fell back"
    assert entry[3], "first call did not verify output formats"
    assert np.isfinite(float(losses['gen']))


def test_compile_failure_warns_and_falls_back(rng, monkeypatch):
    """An AOT compile error downgrades loudly, and the fallback output
    matches the plain jitted step exactly."""
    state, step = build()
    x, y = batch(rng)
    ref_state, ref_losses = jax.jit(step)(build()[0], x, y)

    wrapper = make_wrapper(step)
    monkeypatch.setattr(
        AutoLayoutStep, '_compile',
        lambda self, *a: (_ for _ in ()).throw(RuntimeError('boom')))
    with pytest.warns(UserWarning, match='plain jitted step'):
        state, losses = wrapper(state, x, y)
    assert wrapper._cache == {(x.shape, x.dtype, y.shape, y.dtype): None}
    np.testing.assert_allclose(float(losses['gen']),
                               float(ref_losses['gen']), rtol=1e-6)


def test_dispatch_rejection_heals_to_fallback(rng):
    """A compiled entry whose dispatch raises ValueError (the poisoned-
    relayout failure mode) permanently downgrades with a warning and
    the step still completes via the plain path."""
    state, step = build()
    x, y = batch(rng)
    wrapper = make_wrapper(step)
    state, _ = wrapper(state, x, y)  # healthy compile + verify
    key = next(iter(wrapper._cache))

    class Rejecting:
        def __call__(self, *a):
            raise ValueError('Computation was compiled for input '
                             'layouts that disagree')

    wrapper._cache[key][0] = Rejecting()
    wrapper._last_out = None  # force the unsettled path
    with pytest.warns(UserWarning, match='rejected its arguments'):
        state, losses = wrapper(state, x, y)
    assert wrapper._cache[key] is None
    assert np.isfinite(float(losses['gen']))
    # subsequent steps run the fallback without further warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        state, losses = wrapper(state, x, y)
    assert np.isfinite(float(losses['gen']))


def test_output_format_poison_detected_on_first_call(rng, monkeypatch):
    """If the first call's outputs do not carry the compiled fix-point
    formats (cache-poisoned executable), the wrapper returns the valid
    result, warns, and downgrades."""
    state, step = build()
    x, y = batch(rng)
    wrapper = make_wrapper(step)
    # every format check reports a mismatch: the input placement runs
    # (harmless extra device_put) and the post-call verification then
    # sees "outputs lost their formats" -- the poisoned-cache signature
    monkeypatch.setattr(auto_layout, '_formats_match',
                        lambda tree, fmt: False)
    with pytest.warns(UserWarning, match='lost their formats'):
        state, losses = wrapper(state, x, y)
    key = (x.shape, x.dtype, y.shape, y.dtype)
    assert wrapper._cache[key] is None
    assert np.isfinite(float(losses['gen']))


def test_fetch_failure_replays_via_fallback(rng, monkeypatch):
    """A poisoned executable can ACCEPT inputs and return arrays whose
    buffers only fail at fetch time (observed on the TPU relay as a
    backend INVALID_ARGUMENT): the first-call probe fetch must catch
    it, downgrade, and REPLAY the batch through the plain step from
    the pre-call snapshot (the compiled call donated the inputs)."""
    state, step = build()
    x, y = batch(rng)
    ref_state, ref_losses = jax.jit(step)(build()[0], x, y)

    wrapper = make_wrapper(step)
    monkeypatch.setattr(
        AutoLayoutStep, '_probe_fetch',
        staticmethod(lambda losses: (_ for _ in ()).throw(
            RuntimeError('INVALID_ARGUMENT: TPU backend error'))))
    with pytest.warns(UserWarning, match='outputs unusable'):
        state, losses = wrapper(state, x, y)
    key = (x.shape, x.dtype, y.shape, y.dtype)
    assert wrapper._cache[key] is None
    # the replay reproduces the plain step's result exactly
    np.testing.assert_allclose(float(losses['gen']),
                               float(ref_losses['gen']), rtol=1e-6)
    # and training continues on the fallback without further warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        state, losses = wrapper(state, x, y)
    assert np.isfinite(float(losses['gen']))


def test_cache_bypass_restores_config(tmp_path):
    """_cache_bypass must disable the persistent cache only for its
    scope, including on exceptions."""
    from patchgan_tpu.train.auto_layout import _cache_bypass
    jax.config.update('jax_compilation_cache_dir', str(tmp_path))
    try:
        with _cache_bypass():
            assert jax.config.jax_compilation_cache_dir is None
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
        with pytest.raises(RuntimeError):
            with _cache_bypass():
                raise RuntimeError('boom')
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update('jax_compilation_cache_dir', None)


def test_enable_persistent_cache_env_gate(tmp_path, monkeypatch):
    """The helper honours PATCHGAN_COMPILATION_CACHE (path and off)."""
    from patchgan_tpu.utils.compilation_cache import \
        enable_persistent_cache
    try:
        monkeypatch.setenv('PATCHGAN_COMPILATION_CACHE', 'off')
        assert enable_persistent_cache() is None
        # the kill-switch also beats explicit arguments (bench.py
        # passes its repo-local dir explicitly; =off must still win)
        assert enable_persistent_cache(str(tmp_path / 'x')) is None
        assert jax.config.jax_compilation_cache_dir is None

        monkeypatch.setenv('PATCHGAN_COMPILATION_CACHE',
                           str(tmp_path / 'c'))
        got = enable_persistent_cache()
        assert got == str(tmp_path / 'c')
        assert (tmp_path / 'c').is_dir()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / 'c')

        # explicit argument wins over the env var path
        got = enable_persistent_cache(str(tmp_path / 'd'))
        assert got == str(tmp_path / 'd')
    finally:
        jax.config.update('jax_compilation_cache_dir', None)


def test_enable_persistent_cache_respects_user_config(tmp_path,
                                                      monkeypatch):
    """A cache dir the user set on jax.config themselves is returned
    as-is, not clobbered by a no-arg enable (Trainer/engine __init__)."""
    from patchgan_tpu.utils.compilation_cache import \
        enable_persistent_cache
    monkeypatch.delenv('PATCHGAN_COMPILATION_CACHE', raising=False)
    try:
        jax.config.update('jax_compilation_cache_dir',
                          str(tmp_path / 'mine'))
        assert enable_persistent_cache() == str(tmp_path / 'mine')
        assert jax.config.jax_compilation_cache_dir == \
            str(tmp_path / 'mine')
    finally:
        jax.config.update('jax_compilation_cache_dir', None)


def test_cache_bypass_defers_concurrent_enable(tmp_path, monkeypatch):
    """enable_persistent_cache() arriving DURING a bypass (e.g. an
    InferenceEngine constructed on another thread mid-AUTO-compile)
    must not re-enable the cache inside the bypass; it applies when
    the bypass exits."""
    from patchgan_tpu.utils import compilation_cache as cc
    monkeypatch.delenv('PATCHGAN_COMPILATION_CACHE', raising=False)
    try:
        jax.config.update('jax_compilation_cache_dir',
                          str(tmp_path / 'a'))
        with cc.cache_bypass():
            assert jax.config.jax_compilation_cache_dir is None
            got = cc.enable_persistent_cache(str(tmp_path / 'b'))
            assert got == str(tmp_path / 'b')  # accepted...
            # ...but NOT applied while the bypass is active
            assert jax.config.jax_compilation_cache_dir is None
        # applied on exit, superseding the saved dir
        assert jax.config.jax_compilation_cache_dir == \
            str(tmp_path / 'b')

        # nesting: only the outermost exit restores
        with cc.cache_bypass():
            with cc.cache_bypass():
                assert jax.config.jax_compilation_cache_dir is None
            assert jax.config.jax_compilation_cache_dir is None
        assert jax.config.jax_compilation_cache_dir == \
            str(tmp_path / 'b')
    finally:
        jax.config.update('jax_compilation_cache_dir', None)
