"""``patchgan_serve`` console entry point (extension).

A long-running inference service the reference has no analog for
(its infer CLI, /root/reference/patchgan/infer.py:71-174, is a one-shot
batch job): the generator is loaded ONCE, the tiled/spatial forward is
compiled ONCE, and the process then serves images either by

- watching a directory (``--watch DIR``): new images are picked up each
  poll, masks written next to ``serve_params.output_path``, already-
  processed images (an output PNG exists) are skipped, so the service
  is restart-safe and idempotent; or
- a line protocol on stdin (``--stdin``): one input path per line,
  the written mask path echoed on stdout per line ("ERROR <msg>" on
  failure) -- composable with any external queue/orchestrator.

Config: the infer-CLI schema (flat or nested ``model_params``,
``checkpoint_paths.generator``), plus ``infer_params`` (size via
``dataset.size``, ``output_path``, ``threshold``, ``overlap``,
``mode: tiled|spatial``).
"""

import argparse
import os
import sys
import time


IMAGE_EXTS = ('.jpg', '.jpeg', '.png')


def _build_engine(config, dtype):
    import jax
    import jax.numpy as jnp

    from ..inference import InferenceEngine
    from ..models import UNet
    from ..parallel.mesh import default_mesh
    from ..utils import checkpoint as ckpt
    from ..utils.config import model_params
    from ..utils.transfer import load_transfer_data, unet_key_map

    dataset_params = config.get('dataset', {})
    size = dataset_params.get('size', 256)
    in_channels = dataset_params.get('in_channels', 3)
    labels = dataset_params.get('labels')
    out_channels = len(labels) if labels else \
        dataset_params.get('out_channels', 1)

    gen_cfg, _ = model_params(config)
    generator = UNet(input_nc=in_channels, output_nc=out_channels,
                     nf=gen_cfg['filters'],
                     activation=gen_cfg['activation'],
                     final_act=gen_cfg['final_activation'], dtype=dtype)
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

    infer_params = config.get('infer_params', {})
    engine = InferenceEngine(
        generator, g_params, size=size,
        overlap=infer_params.get('overlap', 0.9),
        threshold=infer_params.get('threshold', 0),
        mesh=default_mesh())
    mode = infer_params.get('mode', 'tiled')
    output_path = infer_params.get('output_path', 'predictions/')
    os.makedirs(output_path, exist_ok=True)
    return engine, mode, output_path


def _decode(path):
    from ..data import native
    if path.lower().endswith(('.jpg', '.jpeg')):
        return native.decode_jpeg_rgb(path, None)
    import numpy as np
    from PIL import Image
    return (np.asarray(Image.open(path).convert('RGB'), np.float32)
            / 255.0)


def _serve_one(engine, mode, output_path, path):
    from ..data.coco import COCOStuffDataset
    image = _decode(path)
    mask = engine.predict_image(image, mode=mode)
    fname = os.path.splitext(os.path.basename(path))[0]
    COCOStuffDataset.save_mask(mask, output_path, fname)
    return os.path.join(output_path, f'{fname}.png')


def _watch_loop(engine, mode, output_path, watch_dir, poll, once):
    served = 0
    while True:
        todo = []
        for name in sorted(os.listdir(watch_dir)):
            if not name.lower().endswith(IMAGE_EXTS):
                continue
            out = os.path.join(
                output_path, os.path.splitext(name)[0] + '.png')
            if not os.path.exists(out):
                todo.append(os.path.join(watch_dir, name))
        for path in todo:
            t0 = time.perf_counter()
            out = _serve_one(engine, mode, output_path, path)
            served += 1
            print(f"{out}  ({(time.perf_counter() - t0) * 1e3:.0f} ms)",
                  flush=True)
        if once:
            print(f"served {served} images", flush=True)
            return served
        time.sleep(poll)


def _stdin_loop(engine, mode, output_path):
    for line in sys.stdin:
        path = line.strip()
        if not path:
            continue
        try:
            print(_serve_one(engine, mode, output_path, path),
                  flush=True)
        except Exception as e:
            print(f"ERROR {e}", flush=True)


def patchgan_serve(argv=None):
    parser = argparse.ArgumentParser(
        prog='PatchGAN',
        description='Long-running PatchGAN inference service')
    parser.add_argument('-c', '--config_file', required=True, type=str)
    parser.add_argument('--watch', default=None,
                        help='Directory to watch for new images')
    parser.add_argument('--stdin', action='store_true',
                        help='Serve paths read line-by-line from stdin')
    parser.add_argument('--poll', default=2.0, type=float,
                        help='Watch-mode poll interval (seconds)')
    parser.add_argument('--once', action='store_true',
                        help='Watch mode: process the backlog and exit')
    parser.add_argument('-d', '--device', default='auto')
    parser.add_argument('--dtype', default='auto',
                        choices=['auto', 'float32', 'bfloat16'])
    args = parser.parse_args(argv)

    if bool(args.watch) == bool(args.stdin):
        parser.error('exactly one of --watch / --stdin is required')

    from .common import compute_dtype, select_device
    from ..utils.config import load_config

    platform = select_device(args.device)
    dtype = compute_dtype(args.dtype, platform)
    config = load_config(args.config_file)
    engine, mode, output_path = _build_engine(config, dtype)
    print(f"Serving with {platform} ({mode} mode) -> {output_path}",
          flush=True)

    if args.stdin:
        _stdin_loop(engine, mode, output_path)
    else:
        return _watch_loop(engine, mode, output_path, args.watch,
                           args.poll, args.once)


if __name__ == '__main__':
    patchgan_serve()
