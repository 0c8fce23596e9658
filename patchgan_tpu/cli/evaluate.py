"""``patchgan_eval`` console entry point (extension).

The reference has no way to MEASURE segmentation quality; the driver's
north star requires IoU parity (BASELINE.json). This tool evaluates a
generator checkpoint over a labelled dataset and prints one JSON line
with mean IoU and per-class IoU, so quality comparisons (e.g. against a
PyTorch-trained checkpoint loaded through the transfer layer) are one
command.

Config: the train-CLI dataset schema (validation_data or dataset_path +
masks), model_params (either schema), and checkpoint_paths.generator.
"""

import argparse
import json

import numpy as np

from ..data import DataLoader
from ..models import UNet
from ..utils import checkpoint as ckpt
from ..utils.config import load_config, model_params
from ..utils.transfer import load_transfer_data, unet_key_map
from .common import build_dataset_factory, compute_dtype, select_device


def patchgan_eval(argv=None):
    parser = argparse.ArgumentParser(
        prog='PatchGAN',
        description='Evaluate a generator checkpoint (mean IoU)'
    )
    parser.add_argument('-c', '--config_file', required=True, type=str)
    parser.add_argument('-b', '--batch_size', default=16, type=int)
    parser.add_argument('--dataloader_workers', default=4, type=int)
    parser.add_argument('-d', '--device', default='auto')
    parser.add_argument('--dtype', default='auto',
                        choices=['auto', 'float32', 'bfloat16'])
    args = parser.parse_args(argv)

    platform = select_device(args.device)
    dtype = compute_dtype(args.dtype, platform)

    config = load_config(args.config_file)
    dataset_params = config['dataset']
    size = dataset_params.get('size', 256)

    Dataset, in_channels, out_channels, ds_kwargs = \
        build_dataset_factory(dataset_params)

    # 'randomcrop' == resize-to-size (reference vocabulary, quirk Q3);
    # evaluation wants deterministic resize, never flips
    augmentation = dataset_params.get('augmentation', 'randomcrop')
    data = dataset_params.get('validation_data',
                              config.get('validation_data'))
    if data is not None:
        datagen = Dataset(data['images'], data['masks'], size=size,
                          augmentation=augmentation, **ds_kwargs)
    else:
        datagen = Dataset(dataset_params['dataset_path'], size=size,
                          augmentation=augmentation, **ds_kwargs)

    gen_cfg, _ = model_params(config)
    generator = UNet(input_nc=in_channels, output_nc=out_channels,
                     nf=gen_cfg['filters'],
                     activation=gen_cfg['activation'],
                     final_act=gen_cfg['final_activation'], dtype=dtype)

    import jax
    import jax.numpy as jnp
    g_params = generator.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 128, 128, in_channels)))['params']
    gen_sd = ckpt.load_state_dict(config['checkpoint_paths']['generator'])
    g_params, count = load_transfer_data(
        jax.device_get(g_params), gen_sd, unet_key_map(), verbose=False)
    if count < len(unet_key_map()):
        raise ValueError(
            f"Generator checkpoint mismatch: {count}/"
            f"{len(unet_key_map())} weights loaded")

    from ..utils.metrics import iou

    @jax.jit
    def batch_iou(params, x, y):
        pred = generator.apply({'params': params}, x, train=False)
        return iou(y, pred)

    loader = DataLoader(datagen, batch_size=args.batch_size,
                        shuffle=False, drop_last=False,
                        num_workers=max(args.dataloader_workers, 1),
                        dtype=dtype)
    scores, weights = [], []
    for x, y in loader:
        scores.append(float(batch_iou(g_params, x, y)))
        weights.append(int(np.shape(x)[0]))
    mean_iou = float(np.average(scores, weights=weights)) if scores \
        else float('nan')

    result = {
        'metric': 'mean_iou',
        'value': round(mean_iou, 5),
        'n_images': int(sum(weights)),
        'checkpoint': config['checkpoint_paths']['generator'],
    }
    print(json.dumps(result))
    return result


if __name__ == '__main__':
    patchgan_eval()
