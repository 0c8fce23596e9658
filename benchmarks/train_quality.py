"""End-task quality on the shipping TPU stack: train the GAN on a
synthetic shapes-segmentation task and report held-out mean IoU.

Numerics parity with the torch reference is pinned by tests; this
measures the other half of the north star ("equal IoU") on the real
device in bf16: random-init training must actually converge to a
high-IoU segmenter with the default hyperparameters. Images are
device-resident (the 1-vCPU host cannot feed the chip for a quality
run; pipeline throughput is measured separately in BENCHMARKS.md).

Task: 128x128 images containing 1-3 anti-aliased bright ellipses on a
noisy dark background; the mask is the ellipse support. Train
UNet(nf=16) + Discriminator(ndf=16) with fc_tversky + adversarial loss
(defaults), steps configurable; eval is thresholded IoU on 64 unseen
images.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SIZE = 128


def make_data(rng, n, size=SIZE):
    yy, xx = np.mgrid[0:size, 0:size]
    imgs = np.empty((n, size, size, 3), np.float32)
    masks = np.empty((n, size, size, 1), np.float32)
    scale = size / SIZE
    for i in range(n):
        img = rng.uniform(0.0, 0.25, size=(size, size, 3))
        mask = np.zeros((size, size), bool)
        for _ in range(rng.integers(1, 4)):
            cy, cx = rng.uniform(12 * scale, size - 12 * scale, 2)
            ry, rx = rng.uniform(6 * scale, 16 * scale, 2)
            e = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            mask |= e
            color = rng.uniform(0.6, 1.0, 3)
            img[e] = color * rng.uniform(0.85, 1.0)
        img += rng.normal(0, 0.05, img.shape)
        imgs[i] = np.clip(img, 0, 1)
        masks[i] = mask[..., None]
    return imgs, masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--nf', type=int, default=16)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--s2d', action='store_true',
                    help='train through the space-to-depth boundary '
                         'form (the Trainer default; ops/s2d.py)')
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)
    from patchgan_tpu.utils.metrics import iou

    gen = UNet(input_nc=3, output_nc=1, nf=args.nf, final_act='sigmoid',
               dtype=dtype, s2d=args.s2d)
    disc = Discriminator(input_nc=4, ndf=args.nf, n_layers=2, dtype=dtype,
                         s2d=args.s2d)
    gen_tx = make_optimizer(2e-3)
    disc_tx = make_optimizer(2e-3)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gen_tx,
                             disc_tx, seed=args.seed)
    step = make_train_step(gen, disc, gen_tx, disc_tx,
                           loss_type='tversky', seg_alpha=200.0)

    rng = np.random.default_rng(args.seed)
    pool = 512  # distinct training images, cycled in shuffled batches
    xs, ys = make_data(rng, pool)
    xs_d, ys_d = jax.device_put(xs), jax.device_put(ys)
    x_ev, y_ev = make_data(rng, 64)

    # whole training run as jitted scans over device-resident batches
    @jax.jit
    def run_epoch(state, order):
        def body(st, idx):
            st, losses = step(st, xs_d[idx], ys_d[idx])
            return st, losses['gen']
        return jax.lax.scan(body, state, order)

    bpe = pool // args.batch
    t0 = time.time()
    gen_first = gen_last = None
    done = 0
    while done < args.steps:
        order = rng.permutation(pool)[:bpe * args.batch] \
            .reshape(bpe, args.batch)
        n_take = min(bpe, args.steps - done)
        state, gens = run_epoch(state, jnp.asarray(order[:n_take]))
        gens = np.asarray(gens, np.float32)
        if gen_first is None:
            gen_first = float(gens[0])
        gen_last = float(gens[-1])
        done += n_take
    train_s = time.time() - t0

    # identical parameter tree: eval through the plain form either way
    gen_eval = gen.clone(s2d=False) if args.s2d else gen

    @jax.jit
    def predict(params, x):
        return gen_eval.apply({'params': params}, x.astype(dtype),
                              train=False)

    pred = np.asarray(predict(state.g_params, jnp.asarray(x_ev)),
                      np.float32)
    miou = float(iou(jnp.asarray(y_ev), jnp.asarray(pred)))
    print(json.dumps({
        'metric': 'shapes_task_mean_iou',
        'value': round(miou, 4),
        'steps': args.steps, 'batch': args.batch, 'nf': args.nf,
        'dtype': str(dtype),
        'gen_loss_first': round(gen_first, 2),
        'gen_loss_last': round(gen_last, 2),
        'train_seconds': round(train_s, 1),
    }))


if __name__ == '__main__':
    main()
