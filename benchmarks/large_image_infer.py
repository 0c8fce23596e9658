"""BASELINE config 4: large-image tiled inference, end to end.

Measures masks/s for 1280x960 JPEGs through the full ``patchgan_infer``
pipeline — decode -> tile -> forward -> stitch -> postprocess -> PNG
save — with the CLI's exact overlap structure (thread-pool decode
look-ahead; the mask of image i-1 is fetched+saved after image i's
pipeline is dispatched). Reference semantics: 256px tiles, overlap 0.9,
averaging stitch (/root/reference/patchgan/infer.py:37-68).

Modes (A/B the round-4 on-device stitch):
  --mode device   one compiled gather+forward+stitch program per image,
                  ONE dispatch + ONE (H, W) fetch per image (default)
  --mode host     round-3 path: per-bucket tile fetch + host numpy stitch
  --mode spatial  whole-image forward (no tiles, mesh-shardable)

Usage:  timeout 580 python benchmarks/large_image_infer.py [--mode ...]
Prints one JSON line: {"metric": "large_image_masks_per_s", ...}
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from collections import deque
from concurrent.futures import ThreadPoolExecutor


def make_jpegs(root, n, w, h):
    """Synthetic 1280x960 JPEGs (content irrelevant to timing: decode
    cost is resolution-bound, forward input is whatever decodes)."""
    import numpy as np
    from PIL import Image
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = os.path.join(root, f"img_{i:03d}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', default='device',
                    choices=['device', 'host', 'spatial'])
    ap.add_argument('--images', type=int, default=12)
    ap.add_argument('--width', type=int, default=1280)
    ap.add_argument('--height', type=int, default=960)
    ap.add_argument('--nf', type=int, default=64)
    ap.add_argument('--workers', type=int, default=4)
    ap.add_argument('--batch_size', type=int, default=128,
                    help='engine bucket cap (128 = #23 cost-model '
                         'default; 16 = pre-#23 behavior for A/B)')
    args = ap.parse_args()

    # engine reads the gate at construction; set before building it
    os.environ['PATCHGAN_DEVICE_STITCH'] = (
        'on' if args.mode == 'device' else 'off')

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from patchgan_tpu.inference import InferenceEngine
    from patchgan_tpu.models import UNet

    dtype = (jnp.bfloat16 if jax.devices()[0].platform != 'cpu'
             else jnp.float32)
    gen = UNet(input_nc=3, output_nc=1, nf=args.nf, dtype=dtype)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 128, 3)))['params']
    engine = InferenceEngine(gen, params, size=256, overlap=0.9,
                             threshold=0.5, batch_size=args.batch_size)

    with tempfile.TemporaryDirectory() as tmp:
        paths = make_jpegs(tmp, args.images, args.width, args.height)
        outdir = os.path.join(tmp, 'out')
        os.makedirs(outdir)

        def fetch(p):
            # uint8 through to the device (the CLI's get_image path):
            # /255 runs inside the jitted program
            return np.asarray(Image.open(p).convert('RGB'),
                              dtype=np.uint8)

        def predict(image):
            if args.mode == 'spatial':
                class _R:  # same handle interface as the async path
                    def __init__(s, m):
                        s._m = m

                    def result(s):
                        return s._m
                return _R(engine.predict_image(image, mode='spatial'))
            return engine.predict_image_async(image)

        def save(mask, path):
            Image.fromarray((np.asarray(mask) * 255).astype(np.uint8)) \
                .save(path)

        # warmup: compile every program the loop will hit
        predict(fetch(paths[0])).result()

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            pending = deque(pool.submit(fetch, p)
                            for p in paths[:2 * args.workers])
            nxt = len(pending)
            prev = None
            for i in range(len(paths)):
                image = pending.popleft().result()
                if nxt < len(paths):
                    pending.append(pool.submit(fetch, paths[nxt]))
                    nxt += 1
                handle = predict(image)
                if prev is not None:
                    save(prev[0].result(),
                         os.path.join(outdir, f"{prev[1]:03d}.png"))
                prev = (handle, i)
            save(prev[0].result(),
                 os.path.join(outdir, f"{prev[1]:03d}.png"))
        dt = time.perf_counter() - t0

    masks_per_s = args.images / dt
    print(json.dumps({
        'metric': 'large_image_masks_per_s',
        'value': round(masks_per_s, 3),
        'unit': 'masks/s',
        'mode': args.mode,
        'images': args.images,
        'resolution': f"{args.width}x{args.height}",
        'seconds': round(dt, 2),
    }))


if __name__ == '__main__':
    main()
