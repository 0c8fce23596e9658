"""Transfer-layer edge coverage: pure-python .pth reading (zip and
legacy formats), keymap completeness for normed discriminators, export
round-trips, partial-copy counting."""

import numpy as np
import pytest

from patchgan_tpu.utils.torch_pickle import load_torch_pickle
from patchgan_tpu.utils.transfer import (InvalidCheckpointError,
                                         conv_kernel_to_jax,
                                         conv_kernel_to_torch,
                                         convT_kernel_to_jax,
                                         convT_kernel_to_torch,
                                         disc_key_map, export_state_dict,
                                         load_transfer_data, unet_key_map)

torch = pytest.importorskip('torch')


def test_zip_pth_reader_matches_torch(tmp_path):
    sd = {'a.weight': torch.randn(3, 4, 2, 2),
          'b.bias': torch.arange(5, dtype=torch.float32)}
    path = str(tmp_path / 'x.pth')
    torch.save(sd, path)
    loaded = load_torch_pickle(path)
    for k, v in sd.items():
        np.testing.assert_array_equal(loaded[k], v.numpy())


def test_legacy_pth_reader_falls_back_to_torch(tmp_path):
    sd = {'w': torch.randn(2, 2)}
    path = str(tmp_path / 'legacy.pth')
    torch.save(sd, path, _use_new_zipfile_serialization=False)
    loaded = load_torch_pickle(path)
    np.testing.assert_array_equal(loaded['w'], sd['w'].numpy())


def test_kernel_layout_roundtrips(rng):
    w = rng.normal(size=(6, 4, 4, 4)).astype(np.float32)  # OIHW
    np.testing.assert_array_equal(
        conv_kernel_to_torch(conv_kernel_to_jax(w)), w)
    wt = rng.normal(size=(4, 6, 4, 4)).astype(np.float32)  # IOHW
    np.testing.assert_array_equal(
        convT_kernel_to_torch(convT_kernel_to_jax(wt)), wt)


def test_disc_key_map_with_norm_indices():
    # with norm=True the Sequential gains an InstanceNorm after each
    # middle/stride-1 tanh, shifting the conv indices (disc.py:31-42)
    keymap = disc_key_map(n_layers=3, norm=True)
    assert 'model.0.weight' in keymap        # first conv (bias too)
    assert 'model.0.bias' in keymap
    assert 'model.2.weight' in keymap        # conv1 (after lrelu)
    assert 'model.5.weight' in keymap        # conv2 (tanh+norm before)
    assert 'model.8.weight' in keymap        # stride-1 conv3
    assert 'model.11.weight' in keymap       # final conv
    assert 'model.11.bias' in keymap
    assert len(keymap) == 7


def test_load_transfer_data_raises_on_zero_copies():
    params = {'enc0': {'kernel': np.zeros((4, 4, 3, 8), np.float32)}}
    with pytest.raises(InvalidCheckpointError):
        load_transfer_data(params, {'unrelated.weight':
                                    np.zeros((2, 2))},
                           unet_key_map(), verbose=False)


def test_export_skips_missing_paths():
    params = {'enc0': {'kernel': np.zeros((4, 4, 3, 8), np.float32)}}
    sd = export_state_dict(params, unet_key_map())
    assert list(sd) == ['encoder.0.model.DownConv0.weight']
    assert sd['encoder.0.model.DownConv0.weight'].shape == (8, 3, 4, 4)
