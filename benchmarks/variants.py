"""A/B harness for train-step perf levers on real TPU hardware.

Measures the headline workload (bench.py: 256px, batch 16, bf16,
tversky+adv) under each lever combination and prints one line per
variant. Timing forces the dispatch chain by fetching a loss scalar
(through the axon relay, block_until_ready alone can return early).

Usage: python benchmarks/variants.py [--iters 30] [--variants a,b,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp
import numpy as np

SIZE = 256
WARMUP = 5

DEEP = ('enc4', 'enc5', 'enc6', 'dec0', 'dec1', 'dec2')
DEEP2 = DEEP + ('enc3', 'dec3')

VARIANTS = {
    # name: (batch, remat, grad_dtype, merged_disc)
    'base': (16, False, None, False),
    'merged_disc': (16, False, None, True),
    'remat': (16, True, None, False),
    'remat_deep': (16, DEEP, None, False),
    'remat_deep2': (16, DEEP2, None, False),
    'gradbf16': (16, False, 'bf16', False),
    'base_b32': (32, False, None, False),
    'remat_deep_b32': (32, DEEP, None, False),
}


def measure(batch, remat, grad_dtype, merged_disc, iters):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16, remat=remat)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3, dtype=jnp.bfloat16)
    gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gen_tx,
                             disc_tx, seed=0)
    gd = jnp.bfloat16 if grad_dtype == 'bf16' else None
    step = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                   loss_type='tversky', seg_alpha=200.0,
                                   grad_dtype=gd, merged_disc=merged_disc),
                   donate_argnums=(0,))

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(batch, SIZE, SIZE, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(batch, SIZE, SIZE, 1)) > 0.5)
                       .astype(np.float32))

    for _ in range(WARMUP):
        state, losses = step(state, x, y)
    float(losses['gen'])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, x, y)
    g_final = float(losses['gen'])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(g_final)
    return batch * iters / elapsed, elapsed / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--variants', default=','.join(VARIANTS))
    args = ap.parse_args()

    for name in args.variants.split(','):
        batch, remat, gd, md = VARIANTS[name]
        best = 0.0
        for _ in range(args.reps):
            img_s, ms = measure(batch, remat, gd, md, args.iters)
            best = max(best, img_s)
        print(json.dumps({'variant': name, 'img_s': round(best, 1),
                          'batch': batch}), flush=True)


if __name__ == '__main__':
    main()
