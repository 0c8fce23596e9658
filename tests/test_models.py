"""Model structure tests: shapes, filter ladders, param counts, dropout
behaviour (reference unet.py:84, disc.py:23-35)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.models import Discriminator, UNet
from patchgan_tpu.models.unet import unet_filters


def _init(model, *args, seed=0):
    return model.init(jax.random.PRNGKey(seed), *args)['params']


def test_unet_filter_ladder():
    assert unet_filters(64) == [64, 128, 256, 512, 512, 512, 512]


def test_unet_output_shape_and_softmax():
    model = UNet(input_nc=3, output_nc=5, nf=8, final_act='softmax')
    x = jnp.zeros((2, 128, 128, 3))
    params = _init(model, x)
    out = model.apply({'params': params}, x)
    assert out.shape == (2, 128, 128, 5)
    np.testing.assert_allclose(np.sum(np.asarray(out), axis=-1), 1.0,
                               rtol=1e-5)


def test_unet_return_hidden():
    model = UNet(input_nc=3, output_nc=1, nf=8, final_act='sigmoid')
    x = jnp.zeros((1, 128, 128, 3))
    params = _init(model, x)
    out, hidden = model.apply({'params': params}, x, return_hidden=True)
    assert out.shape == (1, 128, 128, 1)
    # 7 stride-2 halvings: 128 -> 1; bottleneck carries 8*nf channels
    assert hidden.shape == (1, 1, 1, 8 * 8)


def test_unet_256_bottleneck_2x2():
    # at 256px the bottleneck is 2x2x8nf (SURVEY.md §2 #3)
    model = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid')
    x = jnp.zeros((1, 256, 256, 3))
    params = _init(model, x)
    _, hidden = model.apply({'params': params}, x, return_hidden=True)
    assert hidden.shape == (1, 2, 2, 32)


def test_unet_param_shapes():
    nf = 8
    model = UNet(input_nc=3, output_nc=2, nf=nf)
    params = _init(model, jnp.zeros((1, 128, 128, 3)))
    filts = unet_filters(nf)
    # encoder kernels: (4, 4, prev, filt)
    prev = 3
    for i, f in enumerate(filts):
        assert params[f'enc{i}']['kernel'].shape == (4, 4, prev, f)
        prev = f
    # decoder: first block 8nf->8nf no-concat; inner blocks doubled input
    dec_in = [filts[-1]] + [2 * f for f in filts[:-1][::-1]]
    dec_out = filts[:-1][::-1] + [2]
    for i, (cin, cout) in enumerate(zip(dec_in, dec_out)):
        assert params[f'dec{i}']['kernel'].shape == (4, 4, cin, cout), i


def test_unet_dropout_train_vs_eval():
    model = UNet(input_nc=3, output_nc=1, nf=8, use_dropout=True,
                 final_act='sigmoid')
    x = jnp.ones((1, 128, 128, 3))
    params = _init(model, x)
    out_eval_1 = model.apply({'params': params}, x, train=False)
    out_eval_2 = model.apply({'params': params}, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval_1),
                                  np.asarray(out_eval_2))
    key = jax.random.PRNGKey(1)
    out_train = model.apply({'params': params}, x, train=True,
                            rngs={'dropout': key})
    # dropout must actually change the output in train mode
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval_1))


@pytest.mark.parametrize('n_layers', [1, 3, 5])
def test_disc_output_shape(n_layers):
    model = Discriminator(input_nc=4, ndf=8, n_layers=n_layers)
    x = jnp.zeros((2, 64, 64, 3))
    y = jnp.zeros((2, 64, 64, 1))
    params = _init(model, x, y)
    out = model.apply({'params': params}, x, y)
    # n_layers stride-2 convs halve; two stride-1 convs shave 1 px each
    size = 64
    for _ in range(n_layers):
        size = size // 2
    expected = size - 2
    assert out.shape == (2, expected, expected, 1)
    o = np.asarray(out)
    assert np.all(o >= 0) and np.all(o <= 1)  # sigmoid output


def test_disc_param_ladder():
    ndf = 8
    model = Discriminator(input_nc=4, ndf=ndf, n_layers=3)
    params = _init(model, jnp.zeros((1, 32, 32, 4)))
    assert params['conv0_kernel'].shape == (4, 4, 4, ndf)
    assert params['conv0_bias'].shape == (ndf,)
    assert params['conv1_kernel'].shape == (4, 4, ndf, 2 * ndf)
    assert params['conv2_kernel'].shape == (4, 4, 2 * ndf, 4 * ndf)
    assert params['conv3_kernel'].shape == (4, 4, 4 * ndf, 8 * ndf)
    assert params['conv_out_kernel'].shape == (4, 4, 8 * ndf, 1)
    assert params['conv_out_bias'].shape == (1,)
    assert 'conv1_bias' not in params  # middle convs are bias-free


def test_disc_concat_equivalence():
    """D(x, y) must equal D(concat([x, y]))."""
    model = Discriminator(input_nc=4, ndf=8, n_layers=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 32, 32, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 1))
    params = _init(model, x, y)
    out_split = model.apply({'params': params}, x, y)
    out_cat = model.apply({'params': params}, jnp.concatenate([x, y], -1))
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_cat),
                               rtol=1e-5, atol=1e-6)


def test_param_count_matches_torch_reference():
    """Total parameter counts equal the PyTorch reference architectures."""
    torch = pytest.importorskip('torch')
    nn = torch.nn

    nf, in_ch, out_ch = 8, 3, 2

    model = UNet(input_nc=in_ch, output_nc=out_ch, nf=nf)
    params = _init(model, jnp.zeros((1, 128, 128, in_ch)))
    ours = sum(np.size(x) for x in jax.tree_util.tree_leaves(params))

    # expected from the reference ladder: encoder convs + decoder convTs,
    # all bias-free, k=4 (unet.py:84-107)
    filts = [nf, 2 * nf, 4 * nf, 8 * nf, 8 * nf, 8 * nf, 8 * nf]
    expected = 0
    prev = in_ch
    for f in filts:
        expected += prev * f * 16
        prev = f
    dec_in = [filts[-1]] + [2 * f for f in filts[:-1][::-1]]
    dec_out = filts[:-1][::-1] + [out_ch]
    for cin, cout in zip(dec_in, dec_out):
        expected += cin * cout * 16
    assert ours == expected

    ndf, n_layers = 8, 3
    dmodel = Discriminator(input_nc=in_ch + out_ch, ndf=ndf,
                           n_layers=n_layers)
    dparams = _init(dmodel, jnp.zeros((1, 32, 32, in_ch + out_ch)))
    ours_d = sum(np.size(x) for x in jax.tree_util.tree_leaves(dparams))

    # build the same ladder with torch to count (disc.py:19-47)
    seq = [nn.Conv2d(in_ch + out_ch, ndf, 4, 2, 1)]
    nf_mult = 1
    for n in range(1, n_layers):
        prev_mult, nf_mult = nf_mult, min(2 ** n, 8)
        seq.append(nn.Conv2d(ndf * prev_mult, ndf * nf_mult, 4, 2, 1,
                             bias=False))
    prev_mult, nf_mult = nf_mult, min(2 ** n_layers, 8)
    seq.append(nn.Conv2d(ndf * prev_mult, ndf * nf_mult, 4, 1, 1,
                         bias=False))
    seq.append(nn.Conv2d(ndf * nf_mult, 1, 4, 1, 1))
    expected_d = sum(p.numel() for m in seq for p in m.parameters())
    assert ours_d == expected_d


def test_jitted_init_matches_eager_init():
    """init_train_state runs as ONE jitted program (round 5: eager
    flax init dispatches ~130 ops = ~80 s through a remote-TPU relay).
    The values must be BIT-identical to eager module init with the
    same keys -- checkpoint/seed reproducibility depends on it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import init_train_state, make_optimizer

    gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
               use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=4, n_layers=2, use_pallas=False)
    gtx, dtx = make_optimizer(1e-3), make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, 128, 128, 3), 1, gtx, dtx,
                             seed=7)

    rng = jax.random.PRNGKey(7)
    g_key, d_key, state_key = jax.random.split(rng, 3)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    y = jnp.zeros((1, 128, 128, 1), jnp.float32)
    g_ref = gen.init(g_key, x, train=False)['params']
    d_ref = disc.init(d_key, x, y)['params']

    for got, ref in ((state.g_params, g_ref), (state.d_params, d_ref)):
        got_l, ref_l = jax.tree.leaves(got), jax.tree.leaves(ref)
        assert len(got_l) == len(ref_l)
        for a, b in zip(got_l, ref_l):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.rng),
                                  np.asarray(state_key))
