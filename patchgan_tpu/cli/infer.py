"""``patchgan_infer`` console entry point.

Public surface parity with the reference CLI
(/root/reference/patchgan/infer.py:71-174): same flags, flat
``model_params`` schema (gen_filts / disc_filts / n_disc_layers /
activation / final_activation — the nested schema is accepted too),
``checkpoint_paths.{generator,discriminator}``, ``infer_params``
(output_path / threshold default 0 / overlap default 0.9), the
``get_filename`` / ``save_mask`` dataset protocol, overlap tiling with
averaging stitch and argmax/threshold postprocessing.

Differences (deliberate): the built-in COCOStuffDataset supports
inference out of the box (reference quirk Q5); the discriminator
checkpoint key is accepted but the discriminator is not loaded since
inference never uses it (quirk Q7); tiles run through a fixed-bucket
jitted forward instead of one variable-size batch per image.
"""

import argparse
import os

import tqdm

from ..inference import InferenceEngine
from ..inference.engine import _ReadyMask
from ..models import UNet
from ..utils import checkpoint as ckpt
from ..utils.config import load_config, model_params
from ..utils.summary import summarize
from ..utils.transfer import load_transfer_data, unet_key_map
from .common import build_dataset_factory, compute_dtype, select_device


def patchgan_infer(argv=None):
    parser = argparse.ArgumentParser(
        prog='PatchGAN',
        description='Run tiled PatchGAN inference'
    )
    parser.add_argument('-c', '--config_file', required=True, type=str,
                        help='Location of the config YAML file')
    parser.add_argument('--dataloader_workers', default=4, type=int,
                        help='Decode threads prefetching images ahead of '
                             'the device (PIL/libjpeg release the GIL)')
    parser.add_argument('-d', '--device', default='auto',
                        help="Device to use: 'auto', 'tpu' or 'cpu'")
    parser.add_argument('--summary', default=True, action='store_true',
                        help='Print summary of the models')
    parser.add_argument('--dtype', default='auto',
                        choices=['auto', 'float32', 'bfloat16'])
    args = parser.parse_args(argv)

    platform = select_device(args.device)
    dtype = compute_dtype(args.dtype, platform)
    print(f"Running with {platform}")

    config = load_config(args.config_file)

    dataset_params = config['dataset']
    dataset_path = dataset_params['dataset_path']
    size = dataset_params.get('size', 256)

    Dataset, in_channels, out_channels, ds_kwargs = \
        build_dataset_factory(dataset_params)

    assert hasattr(Dataset, 'get_filename') and \
        callable(Dataset.get_filename), \
        f"Dataset class {Dataset.__name__} must have the get_filename " \
        "method which returns the image filename for a given index"
    assert hasattr(Dataset, 'save_mask') and callable(Dataset.save_mask), \
        f"Dataset class {Dataset.__name__} must have the save_mask " \
        "method to save a mask cube for a given filename"

    datagen = Dataset(dataset_path, **ds_kwargs)

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

    checkpoint_paths = config['checkpoint_paths']
    gen_sd = ckpt.load_state_dict(checkpoint_paths['generator'])
    g_params, count = load_transfer_data(
        jax.device_get(g_params), gen_sd, unet_key_map(), verbose=False)
    keymap_size = len(unet_key_map())
    if count < keymap_size:
        raise ValueError(
            f"Generator checkpoint mismatch: {count}/{keymap_size} "
            "weights loaded")
    # quirk Q7: the discriminator checkpoint key is accepted but never
    # used at inference; skip the load entirely.

    if args.summary:
        summarize('UNet generator', g_params, (1, size, size, in_channels))

    infer_params = config.get('infer_params', {})
    output_path = infer_params.get('output_path', 'predictions/')
    if not os.path.exists(output_path):
        os.makedirs(output_path)
        print(f"Created folder {output_path}")

    threshold = infer_params.get('threshold', 0)
    overlap = infer_params.get('overlap', 0.9)
    mode = infer_params.get('mode', 'tiled')  # tiled | spatial

    from ..parallel.mesh import default_mesh
    engine = InferenceEngine(generator, g_params, size=size,
                             overlap=overlap, threshold=threshold,
                             batch_size=infer_params.get('batch_size',
                                                         128),
                             mesh=default_mesh())

    def fetch(i):
        if hasattr(datagen, 'get_image'):
            image = datagen.get_image(i)
        else:
            item = datagen[i]
            image = item[0] if isinstance(item, tuple) else item
        return image

    # decode runs in a thread pool with a bounded look-ahead window so
    # the device never waits on the host decoder but memory stays flat;
    # the mask fetch+save of image i-1 happens AFTER image i's whole
    # tiled pipeline is dispatched (predict_image_async), so host
    # decode/PNG-encode and the device forward/stitch overlap
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    n = len(datagen)
    workers = max(args.dataloader_workers, 1)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = deque(pool.submit(fetch, i)
                        for i in range(min(2 * workers, n)))
        next_submit = len(pending)
        prev = None  # (mask handle, output filename) of image i-1
        for i in tqdm.tqdm(range(n), desc='Predicting',
                           dynamic_ncols=True, ascii=True):
            image = pending.popleft().result()
            if next_submit < n:
                pending.append(pool.submit(fetch, next_submit))
                next_submit += 1
            out_fname, _ = os.path.splitext(datagen.get_filename(i))
            if mode == 'tiled':
                handle = engine.predict_image_async(image)
            else:
                handle = _ReadyMask(
                    engine.predict_image(image, mode=mode))
            if prev is not None:
                Dataset.save_mask(prev[0].result(), output_path, prev[1])
            prev = (handle, out_fname)
        if prev is not None:
            Dataset.save_mask(prev[0].result(), output_path, prev[1])


if __name__ == '__main__':
    patchgan_infer()
