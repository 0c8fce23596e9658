"""CWD io.py plugin-dataset protocol through both CLIs (reference
train.py:57-68, infer.py:106-125)."""

import os

import numpy as np
import pytest
import yaml

PLUGIN_IO = '''
import glob
import os

import numpy as np
from PIL import Image


class NpyPairDataset:
    """Custom dataset: .npy image/mask pairs in one folder."""

    augmentation = None

    def __init__(self, folder, maskfolder=None, size=128,
                 augmentation='resize', **kwargs):
        self.images = sorted(glob.glob(os.path.join(folder, '*_img.npy')))
        self.size = size

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = np.load(self.images[i]).astype(np.float32)
        mask = np.load(self.images[i].replace('_img', '_mask'))
        return img, mask.astype(np.float32)

    def get_filename(self, i):
        return os.path.basename(self.images[i])

    @staticmethod
    def save_mask(mask, output_path, fname):
        np.save(os.path.join(output_path, fname + '.npy'),
                np.asarray(mask))

    def get_image(self, i):
        return np.load(self.images[i]).astype(np.float32)
'''


@pytest.fixture
def plugin_cwd(tmp_path, monkeypatch, rng):
    (tmp_path / 'io.py').write_text(PLUGIN_IO)
    data = tmp_path / 'data'
    data.mkdir()
    for i in range(6):
        img = rng.uniform(size=(128, 128, 3)).astype(np.float32)
        mask = (rng.uniform(size=(128, 128, 2)) > 0.5).astype(np.float32)
        np.save(data / f'{i}_img.npy', img)
        np.save(data / f'{i}_mask.npy', mask)
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_plugin_loader_resolves_class(plugin_cwd):
    from patchgan_tpu.data import load_dataset_class
    cls = load_dataset_class('NpyPairDataset')
    ds = cls(str(plugin_cwd / 'data'))
    assert len(ds) == 6
    img, mask = ds[0]
    assert img.shape == (128, 128, 3) and mask.shape == (128, 128, 2)


def test_plugin_loader_missing_class(plugin_cwd):
    from patchgan_tpu.data import load_dataset_class
    with pytest.raises(ImportError):
        load_dataset_class('NoSuchDataset')


def test_train_and_infer_cli_with_plugin(plugin_cwd):
    from patchgan_tpu.cli.infer import patchgan_infer
    from patchgan_tpu.cli.train import patchgan_train

    cfg = {
        'dataset': {
            'type': 'NpyPairDataset',
            'size': 128,
            'in_channels': 3,
            'out_channels': 2,
            'train_data': {'images': 'data', 'masks': 'data'},
            'validation_data': {'images': 'data', 'masks': 'data'},
        },
        'model_params': {
            'generator': {'filters': 4, 'activation': 'relu',
                          'final_activation': 'softmax'},
            'discriminator': {'filters': 4, 'n_layers': 2},
        },
        'checkpoint_path': 'ck',
        'train_params': {
            'loss_type': 'tversky', 'seg_alpha': 200,
            'gen_learning_rate': 1.e-3, 'disc_learning_rate': 1.e-3,
            'save_freq': 1,
        },
    }
    with open('train.yaml', 'w') as f:
        yaml.safe_dump(cfg, f)
    patchgan_train(['-c', 'train.yaml', '-n', '1', '-b', '2',
                    '--dtype', 'float32'])
    assert os.path.exists('ck/generator_ep_001.npz')

    infer_cfg = {
        'dataset': {
            'type': 'NpyPairDataset', 'size': 128,
            'in_channels': 3, 'out_channels': 2,
            'dataset_path': 'data',
        },
        'model_params': {
            'gen_filts': 4, 'disc_filts': 4, 'activation': 'relu',
            'final_activation': 'softmax', 'n_disc_layers': 2,
        },
        'checkpoint_paths': {
            'generator': 'ck/generator_ep_001.npz',
            'discriminator': 'ck/discriminator_ep_001.npz',
        },
        'infer_params': {'output_path': 'preds', 'overlap': 0.9},
    }
    with open('infer.yaml', 'w') as f:
        yaml.safe_dump(infer_cfg, f)
    patchgan_infer(['-c', 'infer.yaml', '--dtype', 'float32'])
    preds = sorted(os.listdir('preds'))
    assert len(preds) == 6
    mask = np.load(os.path.join('preds', preds[0]))
    assert mask.shape == (128, 128)  # argmax labels (2 classes)