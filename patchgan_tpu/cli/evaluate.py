"""``patchgan_eval`` console entry point (extension).

The reference has no way to MEASURE segmentation quality; the driver's
north star requires IoU parity (BASELINE.json). This tool evaluates a
generator checkpoint over a labelled dataset and prints one JSON line
with mean IoU and per-class IoU, so quality comparisons (e.g. against a
PyTorch-trained checkpoint loaded through the transfer layer) are one
command.

Config: the train-CLI dataset schema (validation_data or dataset_path +
masks), model_params (either schema), and checkpoint_paths.generator
(or checkpoint_path, whose newest generator_ep_*.npz is evaluated --
so one config drives train-then-eval, examples/coco_real.md).
"""

import argparse
import json
import os

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
    parser.add_argument('--metrics', default='iou',
                        help="Comma list from {iou, dice, bf1} "
                             "(boundary F1, 2px tolerance)")
    args = parser.parse_args(argv)

    platform = select_device(args.device)
    dtype = compute_dtype(args.dtype, platform)

    config = load_config(args.config_file)
    dataset_params = config['dataset']
    size = dataset_params.get('size', 256)

    Dataset, in_channels, out_channels, ds_kwargs = \
        build_dataset_factory(dataset_params)

    # 'randomcrop' == resize-to-size (reference vocabulary, quirk Q3);
    # evaluation wants deterministic resize, NEVER flips -- strip the
    # '+flip' suffix a shared train config carries so random flips
    # cannot leak into the reported metrics
    augmentation = dataset_params.get('augmentation', 'randomcrop')
    if isinstance(augmentation, str) and augmentation.endswith('+flip'):
        augmentation = augmentation[:-len('+flip')]
    data = dataset_params.get('validation_data',
                              config.get('validation_data'))
    if data is not None:
        datagen = Dataset(data['images'], data['masks'], size=size,
                          augmentation=augmentation, **ds_kwargs)
    else:
        datagen = Dataset(dataset_params['dataset_path'], size=size,
                          augmentation=augmentation, **ds_kwargs)
    if not getattr(datagen, 'masks', True):
        raise ValueError(
            "Evaluation needs ground-truth masks: point "
            "dataset.validation_data at {images, masks} folders (the "
            "single dataset.dataset_path form found no *.png masks)")

    gen_cfg, _ = model_params(config)
    generator = UNet(input_nc=in_channels, output_nc=out_channels,
                     nf=gen_cfg['filters'],
                     activation=gen_cfg['activation'],
                     final_act=gen_cfg['final_activation'], dtype=dtype)

    import jax
    import jax.numpy as jnp
    # ONE jitted init program: eager flax init pays ~130 per-op
    # compile/dispatch round trips (~80 s on a remote-TPU relay vs
    # seconds jitted, cached across process starts; train/steps.py
    # init_train_state has the same treatment)
    g_params = jax.jit(lambda k: generator.init(
        k, jnp.zeros((1, 128, 128, in_channels))))(
            jax.random.PRNGKey(0))['params']
    # `or {}`: a present-but-empty `checkpoint_paths:` YAML key parses
    # to None and must take the fallback, not crash
    gen_ckpt = (config.get('checkpoint_paths') or {}).get('generator')
    if gen_ckpt is None:
        # train->eval with ONE config (examples/coco_real.md): fall
        # back to the newest epoch checkpoint the training run saved
        # under checkpoint_path
        import glob
        import re
        folder = config.get('checkpoint_path')
        cands = glob.glob(os.path.join(folder or '',
                                       'generator_ep_*.npz'))
        if not cands:
            raise ValueError(
                "No generator checkpoint: set "
                "checkpoint_paths.generator, or point checkpoint_path "
                "at a folder containing generator_ep_*.npz")

        def epoch_of(path):  # numeric, not lexicographic: ep_1000 > 999
            m = re.search(r'generator_ep_(\d+)\.npz$', path)
            return int(m.group(1)) if m else -1

        gen_ckpt = max(cands, key=epoch_of)
        print(f"Evaluating newest checkpoint: {gen_ckpt}")
    gen_sd = ckpt.load_state_dict(gen_ckpt)
    g_params, count = load_transfer_data(
        jax.device_get(g_params), gen_sd, unet_key_map(), verbose=False)
    if count < len(unet_key_map()):
        raise ValueError(
            f"Generator checkpoint mismatch: {count}/"
            f"{len(unet_key_map())} weights loaded")
    # on device ONCE: numpy jit arguments re-upload the whole weight
    # tree every batch (see inference/engine.py for the measured cost)
    g_params = jax.device_put(g_params)

    from ..utils.metrics import boundary_f1, dice, iou

    metric_fns = {'iou': iou, 'dice': dice, 'bf1': boundary_f1}
    wanted = [m.strip() for m in args.metrics.split(',') if m.strip()]
    unknown = [m for m in wanted if m not in metric_fns]
    if unknown or 'iou' not in wanted:
        # iou is the north-star metric and the output's primary key
        wanted = ['iou'] + [m for m in wanted if m in metric_fns
                            and m != 'iou']
    if unknown:
        print(f"Ignoring unknown metrics: {', '.join(unknown)}")

    @jax.jit
    def batch_metrics(params, x, y):
        pred = generator.apply({'params': params}, x, train=False)
        return {m: metric_fns[m](y, pred) for m in wanted}

    loader = DataLoader(datagen, batch_size=args.batch_size,
                        shuffle=False, drop_last=False,
                        num_workers=max(args.dataloader_workers, 1),
                        dtype=dtype)
    scores, weights = {m: [] for m in wanted}, []
    for x, y in loader:
        vals = batch_metrics(g_params, x, y)
        for m in wanted:
            scores[m].append(float(vals[m]))
        weights.append(int(np.shape(x)[0]))
    if not weights:
        raise ValueError(
            "Evaluation dataset is empty: the configured data "
            "folders/shards yielded zero image/mask pairs, so no "
            "metrics can be computed")
    means = {m: float(np.average(scores[m], weights=weights))
             for m in wanted}

    result = {
        'metric': 'mean_iou',
        'value': round(means['iou'], 5),
        'n_images': int(sum(weights)),
        'checkpoint': gen_ckpt,
    }
    long_names = {'dice': 'mean_dice', 'bf1': 'mean_boundary_f1'}
    for m in wanted:
        if m != 'iou':
            result[long_names[m]] = round(means[m], 5)
    print(json.dumps(result))
    return result


if __name__ == '__main__':
    patchgan_eval()
