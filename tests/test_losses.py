"""Loss numerics vs torch ground truth (reference losses.py:5-39,
trainer.py:71-85)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from patchgan_tpu.ops import (bce_loss, fc_tversky, mae_loss, tversky,
                              weighted_bce_loss)


def _rand_probs(rng, shape):
    return rng.uniform(0.01, 0.99, size=shape).astype(np.float32)


def _rand_mask(rng, shape):
    return (rng.uniform(size=shape) > 0.5).astype(np.float32)


@pytest.mark.parametrize('beta', [0.5, 0.75])
def test_tversky_matches_torch(rng, beta):
    y_true = _rand_mask(rng, (4, 8, 8, 3))
    y_pred = _rand_probs(rng, (4, 8, 8, 3))
    # torch reference sums over (1,2,3) of NCHW; ours over non-batch axes
    # of NHWC -- identical sets of elements.
    tt, tp = torch.tensor(y_true), torch.tensor(y_pred)
    tp_s = torch.sum(tt * tp, dim=(1, 2, 3))
    fn_s = torch.sum((1 - tp) * tt, dim=(1, 2, 3))
    fp_s = torch.sum(tp * (1 - tt), dim=(1, 2, 3))
    expected = torch.mean(1 - tp_s / (tp_s + beta * fn_s + (1 - beta) * fp_s))
    got = tversky(y_true, y_pred, beta)
    np.testing.assert_allclose(got, expected.numpy(), rtol=1e-6)


@pytest.mark.parametrize('beta,gamma', [(0.75, 0.75), (0.5, 1.0)])
def test_fc_tversky_matches_torch(rng, beta, gamma):
    y_true = _rand_mask(rng, (4, 8, 8, 3))
    y_pred = _rand_probs(rng, (4, 8, 8, 3))
    tt, tp = torch.tensor(y_true), torch.tensor(y_pred)
    smooth = 1
    tp_s = torch.sum(tt * tp, dim=(1, 2, 3))
    fn_s = torch.sum((1 - tp) * tt, dim=(1, 2, 3))
    fp_s = torch.sum(tp * (1 - tt), dim=(1, 2, 3))
    tv = (tp_s + smooth) / (tp_s + beta * fn_s + (1 - beta) * fp_s + smooth)
    # gamma power applied AFTER the batch mean (reference losses.py:29)
    expected = torch.pow(torch.mean(1 - tv), gamma)
    got = fc_tversky(y_true, y_pred, beta, gamma)
    np.testing.assert_allclose(got, expected.numpy(), rtol=1e-6)

    # and per-sample (batch_mean=False) applies pow elementwise
    expected_ps = torch.pow(1 - tv, gamma)
    got_ps = fc_tversky(y_true, y_pred, beta, gamma, batch_mean=False)
    np.testing.assert_allclose(got_ps, expected_ps.numpy(), rtol=1e-6)


def test_mae_matches_torch(rng):
    a = rng.normal(size=(2, 5, 5, 2)).astype(np.float32)
    b = rng.normal(size=(2, 5, 5, 2)).astype(np.float32)
    expected = torch.mean(torch.abs(torch.tensor(a) - torch.tensor(b)))
    np.testing.assert_allclose(mae_loss(a, b), expected.numpy(), rtol=1e-6)


def test_bce_matches_torch(rng):
    p = _rand_probs(rng, (3, 6, 6, 1))
    t = _rand_mask(rng, (3, 6, 6, 1))
    expected = F.binary_cross_entropy(torch.tensor(p), torch.tensor(t))
    np.testing.assert_allclose(bce_loss(p, t), expected.numpy(), rtol=1e-5)


def test_bce_extreme_probs_clamped():
    # torch clamps log terms at -100; p=0 with t=1 must not give inf.
    p = np.array([[0.0, 1.0]], dtype=np.float32)
    t = np.array([[1.0, 0.0]], dtype=np.float32)
    got = np.asarray(bce_loss(p, t))
    expected = F.binary_cross_entropy(torch.tensor(p), torch.tensor(t))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, expected.numpy(), rtol=1e-5)


def test_weighted_bce_matches_torch(rng):
    p = _rand_probs(rng, (2, 4, 4, 3))
    t = _rand_mask(rng, (2, 4, 4, 3))
    # per-channel weights as built in reference trainer.py:76-79 (NCHW
    # keepdim over (2,3) == NHWC keepdim over (1,2))
    w = 1 - np.sum(t, axis=(1, 2), keepdims=True) / np.sum(t)
    expected = F.binary_cross_entropy(
        torch.tensor(np.transpose(p, (0, 3, 1, 2))),
        torch.tensor(np.transpose(t, (0, 3, 1, 2))),
        weight=torch.tensor(np.transpose(w, (0, 3, 1, 2))))
    got = weighted_bce_loss(p, t, w)
    np.testing.assert_allclose(got, expected.numpy(), rtol=1e-5)


def test_losses_fp32_accumulation_from_bf16(rng):
    import jax.numpy as jnp
    y_true = _rand_mask(rng, (2, 32, 32, 1))
    y_pred = _rand_probs(rng, (2, 32, 32, 1))
    full = fc_tversky(y_true, y_pred, 0.75)
    half = fc_tversky(jnp.asarray(y_true, jnp.bfloat16),
                      jnp.asarray(y_pred, jnp.bfloat16), 0.75)
    assert np.asarray(half).dtype == np.float32
    np.testing.assert_allclose(full, half, rtol=2e-2)


def test_bce_weighting_variants():
    """weighted_bce class-weight modes: 'complement' is the reference
    semantics, 'inverse' weights rare classes harder, 'none' is plain
    BCE; all finite and ordered sensibly on an imbalanced batch."""
    import numpy as np
    from patchgan_tpu.train.steps import make_seg_loss

    rng = np.random.default_rng(0)
    # class 0 dominates 95% of pixels; class 1 is rare
    labels = (rng.uniform(size=(2, 16, 16)) > 0.95).astype(int)
    y = np.eye(2, dtype=np.float32)[labels]
    pred = np.clip(rng.uniform(size=y.shape).astype(np.float32),
                   1e-3, 1 - 1e-3)

    vals = {}
    for mode in ('complement', 'inverse', 'none'):
        seg = make_seg_loss('weighted_bce', 1.0, bce_weighting=mode)
        vals[mode] = float(seg(pred, y))
        assert np.isfinite(vals[mode]), mode
    # inverse-frequency puts ~all weight on the rare class, complement
    # splits ~(0.05, 0.95) -> the three modes must genuinely differ
    assert len({round(v, 6) for v in vals.values()}) == 3

    import pytest
    with pytest.raises(ValueError, match='bce_weighting'):
        make_seg_loss('weighted_bce', 1.0, bce_weighting='bogus')


def test_inverse_bce_weighting_absent_class_capped():
    """A class absent from the whole batch must not absorb the gradient
    signal: its weight is capped (share floored at 1/(100*C)) and the
    present classes keep meaningful weights."""
    import numpy as np
    from patchgan_tpu.train.steps import make_seg_loss
    import jax

    rng = np.random.default_rng(1)
    labels = (rng.uniform(size=(2, 16, 16)) > 0.5).astype(int)
    y3 = np.zeros((2, 16, 16, 3), np.float32)
    y3[..., 0] = (labels == 0)
    y3[..., 1] = (labels == 1)          # class 2 never appears
    pred = np.clip(rng.uniform(size=y3.shape).astype(np.float32),
                   1e-3, 1 - 1e-3)

    seg = make_seg_loss('weighted_bce', 1.0, bce_weighting='inverse')
    v = float(seg(pred, y3))
    assert np.isfinite(v)
    # gradient signal for PRESENT classes survives: perturbing the
    # present-class predictions changes the loss substantially
    g = jax.grad(lambda p: seg(p, y3))(pred)
    g = np.asarray(g)
    present_mag = np.abs(g[..., :2]).mean()
    absent_mag = np.abs(g[..., 2]).mean()
    assert present_mag > 0
    # the absent class is weighted at most ~100x the uniform weight,
    # not ~1e6x as a raw inverse of a 1e-6-floored share would give
    assert absent_mag < 1000 * present_mag
