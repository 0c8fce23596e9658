"""Golden numerical parity against the PyTorch reference implementation.

Loads the actual reference package from /root/reference (read-only mount),
randomly initialises its UNet / Discriminator, maps the torch state_dicts
into our param trees through the transfer layer, and asserts the forward
outputs agree to fp32 tolerance (BASELINE.json: "masks numerically
matching the PyTorch reference"). Skips cleanly when the reference mount
is absent.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip('torch')

REF_PATH = '/root/reference'


def _load_reference():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        from patchgan.disc import Discriminator as TorchDisc
        from patchgan.unet import UNet as TorchUNet
        return TorchUNet, TorchDisc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize('activation,final_act',
                         [('tanh', 'softmax'), ('relu', 'sigmoid'),
                          ('leakyrelu', 'sigmoid')])
def test_unet_forward_parity(activation, final_act):
    TorchUNet, _ = _load_reference()
    from patchgan_tpu.models import UNet
    from patchgan_tpu.utils.transfer import (load_transfer_data,
                                             unet_key_map)

    torch.manual_seed(0)
    tmodel = TorchUNet(3, 2, nf=8, activation=activation,
                       final_act=final_act)
    tmodel.eval()

    model = UNet(input_nc=3, output_nc=2, nf=8, activation=activation,
                 final_act=final_act, use_pallas=False)
    x = np.random.default_rng(1).normal(
        size=(1, 3, 256, 256)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))['params']
    params, count = load_transfer_data(params, tmodel.state_dict(),
                                       unet_key_map(), verbose=False)
    assert count == 14  # 7 encoder + 7 decoder kernels

    with torch.no_grad():
        expected = tmodel(torch.tensor(x))
    got = model.apply({'params': params},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got), _nhwc(expected),
                               rtol=1e-3, atol=1e-4)


def test_unet_return_hidden_parity():
    TorchUNet, _ = _load_reference()
    from patchgan_tpu.models import UNet
    from patchgan_tpu.utils.transfer import (load_transfer_data,
                                             unet_key_map)

    torch.manual_seed(3)
    tmodel = TorchUNet(1, 1, nf=4, activation='relu', final_act='sigmoid')
    tmodel.eval()
    model = UNet(input_nc=1, output_nc=1, nf=4, activation='relu',
                 final_act='sigmoid', use_pallas=False)
    x = np.random.default_rng(2).normal(
        size=(1, 1, 256, 256)).astype(np.float32)
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = model.init(jax.random.PRNGKey(0), xn)['params']
    params, _ = load_transfer_data(params, tmodel.state_dict(),
                                   unet_key_map(), verbose=False)
    with torch.no_grad():
        t_out, t_hidden = tmodel(torch.tensor(x), return_hidden=True)
    out, hidden = model.apply({'params': params}, xn, return_hidden=True)
    np.testing.assert_allclose(np.asarray(out), _nhwc(t_out),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden), _nhwc(t_hidden),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('n_layers,norm', [(3, False), (2, True),
                                           (5, False)])
def test_disc_forward_parity(n_layers, norm):
    _, TorchDisc = _load_reference()
    from patchgan_tpu.models import Discriminator
    from patchgan_tpu.utils.transfer import (disc_key_map,
                                             load_transfer_data)

    torch.manual_seed(1)
    tmodel = TorchDisc(4, ndf=8, n_layers=n_layers, norm=norm)
    tmodel.eval()

    model = Discriminator(input_nc=4, ndf=8, n_layers=n_layers, norm=norm,
                          use_pallas=False)
    x = np.random.default_rng(5).normal(
        size=(2, 4, 128, 128)).astype(np.float32)
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = model.init(jax.random.PRNGKey(0), xn)['params']
    keymap = disc_key_map(n_layers=n_layers, norm=norm)
    params, count = load_transfer_data(params, tmodel.state_dict(), keymap,
                                       verbose=False)
    assert count == len(keymap)

    with torch.no_grad():
        expected = tmodel(torch.tensor(x))
    got = model.apply({'params': params}, xn)
    np.testing.assert_allclose(np.asarray(got), _nhwc(expected),
                               rtol=1e-3, atol=1e-4)


def test_disc_split_input_parity():
    """Our fused-concat call D(x, y) matches torch D(cat([x, y]))."""
    _, TorchDisc = _load_reference()
    from patchgan_tpu.models import Discriminator
    from patchgan_tpu.utils.transfer import (disc_key_map,
                                             load_transfer_data)

    torch.manual_seed(2)
    tmodel = TorchDisc(5, ndf=8, n_layers=3)
    tmodel.eval()
    model = Discriminator(input_nc=5, ndf=8, n_layers=3, use_pallas=False)
    rng = np.random.default_rng(7)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    mask = rng.uniform(size=(1, 2, 64, 64)).astype(np.float32)
    xn = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    yn = jnp.asarray(np.transpose(mask, (0, 2, 3, 1)))
    params = model.init(jax.random.PRNGKey(0), xn, yn)['params']
    params, _ = load_transfer_data(
        params, tmodel.state_dict(), disc_key_map(3, False), verbose=False)
    with torch.no_grad():
        expected = tmodel(torch.cat([torch.tensor(img),
                                     torch.tensor(mask)], dim=1))
    got = model.apply({'params': params}, xn, yn)
    np.testing.assert_allclose(np.asarray(got), _nhwc(expected),
                               rtol=1e-3, atol=1e-4)


def test_roundtrip_export_to_torch():
    """export_state_dict output loads into the torch reference and
    reproduces our forward."""
    TorchUNet, _ = _load_reference()
    from patchgan_tpu.models import UNet
    from patchgan_tpu.utils.transfer import export_state_dict, unet_key_map

    model = UNet(input_nc=3, output_nc=1, nf=8, activation='relu',
                 final_act='sigmoid', use_pallas=False)
    xn = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 256, 256, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(42), xn)['params']

    sd = {k: torch.tensor(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, unet_key_map()).items()}
    tmodel = TorchUNet(3, 1, nf=8, activation='relu', final_act='sigmoid')
    tmodel.load_state_dict(sd)
    tmodel.eval()

    ours = model.apply({'params': params}, xn)
    with torch.no_grad():
        theirs = tmodel(torch.tensor(
            np.transpose(np.asarray(xn), (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs),
                               rtol=1e-3, atol=1e-4)
