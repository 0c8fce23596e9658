"""Coverage for the utility modules: config schema handling, summary
printout, profiling helpers, checkpoint store edge cases."""

import os

import numpy as np
import pytest

from patchgan_tpu.utils import checkpoint as ckpt
from patchgan_tpu.utils.config import dataset_paths, model_params
from patchgan_tpu.utils.profiling import StepTimer, maybe_trace
from patchgan_tpu.utils.summary import count_params, summarize


def test_model_params_nested_schema():
    cfg = {'model_params': {
        'generator': {'filters': 32, 'activation': 'relu'},
        'discriminator': {'filters': 16, 'n_layers': 5, 'norm': True},
    }}
    gen, disc = model_params(cfg)
    assert gen['filters'] == 32 and gen['activation'] == 'relu'
    assert gen['use_dropout'] is True          # train-CLI default
    assert gen['final_activation'] == 'sigmoid'
    assert disc == {'filters': 16, 'norm': True, 'n_layers': 5}


def test_model_params_flat_schema():
    cfg = {'model_params': {
        'gen_filts': 8, 'disc_filts': 4, 'n_disc_layers': 2,
        'activation': 'tanh', 'final_activation': 'softmax',
    }}
    gen, disc = model_params(cfg)
    assert gen['filters'] == 8 and gen['final_activation'] == 'softmax'
    assert disc['filters'] == 4 and disc['n_layers'] == 2


def test_model_params_unknown_keys_warn():
    # flat `filters:` (a real foot-gun: neither schema's key) must not
    # silently fall back to the 64-filter default without a warning
    with pytest.warns(UserWarning, match="filters"):
        gen, _ = model_params({'model_params': {'filters': 4}})
    assert gen['filters'] == 64          # behaviour unchanged, just loud

    with pytest.warns(UserWarning, match="n_layers"):
        model_params({'model_params': {
            'generator': {'filters': 8}, 'n_layers': 5}})
    with pytest.warns(UserWarning, match="norm"):
        model_params({'model_params': {
            'generator': {'filters': 8, 'norm': True}}})

    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter('error')
        model_params({'model_params': {
            'generator': {'filters': 8, 'activation': 'relu'},
            'discriminator': {'filters': 4, 'n_layers': 2}}})
        model_params({'model_params': {
            'gen_filts': 8, 'disc_filts': 4, 'n_disc_layers': 2}})


def test_dataset_paths_variants():
    nested = {'dataset': {'train_data': {'images': 'a'},
                          'validation_data': {'images': 'b'}}}
    t, v, d, s = dataset_paths(nested)
    assert t == {'images': 'a'} and v == {'images': 'b'}

    # the shipped example's top-level layout (quirk Q1)
    toplevel = {'dataset': {}, 'train_data': {'images': 'a'},
                'validation_data': {'images': 'b'}}
    t, v, d, s = dataset_paths(toplevel)
    assert t == {'images': 'a'}

    split = {'dataset': {'data': {'images': 'a'},
                         'train_val_split': [0.8, 0.2]}}
    t, v, d, s = dataset_paths(split)
    assert d == {'images': 'a'} and s == [0.8, 0.2]

    with pytest.raises(AttributeError):
        dataset_paths({'dataset': {}})


def test_summary_counts(capsys):
    params = {'enc0': {'kernel': np.zeros((4, 4, 3, 8))},
              'bias': np.zeros((8,))}
    text = summarize('test-model', params, (1, 64, 64, 3))
    assert count_params(params) == 4 * 4 * 3 * 8 + 8
    assert 'total parameters: 392' in text
    assert 'enc0/kernel' in text


def test_step_timer():
    t = StepTimer()
    t.tick(5)
    assert t.steps == 5
    assert t.rate(per=2) >= 0


def test_maybe_trace_noop():
    with maybe_trace(None):
        pass
    with maybe_trace('/tmp/ignored', enabled=False):
        pass


def test_checkpoint_epoch_parsing(tmp_path):
    folder = str(tmp_path)
    for ep, suffix in [(1, 'npz'), (3, 'pth'), (2, 'npz')]:
        open(os.path.join(folder, f'generator_ep_{ep:03d}.{suffix}'),
             'wb').close()
        open(os.path.join(folder, f'discriminator_ep_{ep:03d}.{suffix}'),
             'wb').close()
    # stray files must not confuse the parser
    open(os.path.join(folder, 'generator_ep_bad.npz'), 'wb').close()
    last, gen_path, disc_path = ckpt.find_last_checkpoint(folder)
    assert last == 3
    assert gen_path.endswith('generator_ep_003.pth')


def test_checkpoint_none_found(tmp_path):
    with pytest.raises(FileNotFoundError):
        ckpt.find_last_checkpoint(str(tmp_path))


def test_state_dict_roundtrip(tmp_path):
    sd = {'encoder.0.model.DownConv0.weight':
          np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)}
    path = str(tmp_path / 'gen.npz')
    ckpt.save_state_dict(path, sd)
    loaded = ckpt.load_state_dict(path)
    np.testing.assert_array_equal(
        loaded['encoder.0.model.DownConv0.weight'],
        sd['encoder.0.model.DownConv0.weight'])


def test_shipped_example_configs_parse():
    """The reference SHIPPED an example config its own parser crashed
    on (quirk Q1); ours must always parse both shipped examples."""
    import os
    from patchgan_tpu.utils.config import (dataset_paths, load_config,
                                           model_params)

    root = os.path.join(os.path.dirname(__file__), '..', 'examples')
    train_cfg = load_config(os.path.join(root, 'train_coco.yaml'))
    gen_cfg, disc_cfg = model_params(train_cfg)
    assert gen_cfg['filters'] > 0 and disc_cfg['n_layers'] > 0
    tr, va, data, split = dataset_paths(train_cfg)
    assert (tr and va) or (data and split)
    assert 'train_params' in train_cfg

    infer_cfg = load_config(os.path.join(root, 'infer_coco.yaml'))
    gen_cfg, _ = model_params(infer_cfg)
    assert gen_cfg['filters'] > 0
    assert 'checkpoint_paths' in infer_cfg
    assert 'output_path' in infer_cfg['infer_params']
