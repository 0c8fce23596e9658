"""A/B the paired-discriminator D loss (models/disc.py tuple form).

The D update evaluates the critic on (x, y_real) and (x, y_fake); the
paired form shares conv0's image-part forward VALUE between the two
branches so autodiff emits ONE image-part weight-gradient contraction
of the summed cotangents instead of two (reference hot loop:
/root/reference/patchgan/trainer.py:96-103 runs two separate
discriminator calls). Forward bit-identical (tests/test_paired_disc.py).

Measured in the SHIPPING regime (s2d + resident bf16 shadow + AUTO
boundary layouts, eager Trainer-style dispatch): both arms built in one
process, per-rep paired differentials, arms interleaved within each rep
so drift hits both equally (benchmarks/_timing.py rules).

Usage: python benchmarks/paired_disc_probe.py [--batch 16] [--reps 4]
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

SIZE = 256
SHORT, LONG = 10, 70


def build_arm(paired, batch):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.auto_layout import AutoLayoutStep
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16, s2d=True)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3,
                         dtype=jnp.bfloat16, s2d=True)
    gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gen_tx,
                             disc_tx, seed=0)
    step = make_train_step(gen, disc, gen_tx, disc_tx,
                           loss_type='tversky', seg_alpha=200.0,
                           paired_disc=paired)
    shadow_fn = make_train_step(gen, disc, gen_tx, disc_tx,
                                loss_type='tversky', seg_alpha=200.0,
                                shadow_dtype=jnp.bfloat16,
                                paired_disc=paired)
    auto = AutoLayoutStep(step, jax.jit(step, donate_argnums=(0,)),
                          shadow_fn=shadow_fn, shadow_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(batch, SIZE, SIZE, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(batch, SIZE, SIZE, 1)) > 0.5)
                       .astype(np.float32))

    def run(n):
        nonlocal state
        losses = None
        for _ in range(n):
            state, losses = auto(state, x, y)
        g = float(losses['gen'])
        assert np.isfinite(g), g
        return g

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--reps', type=int, default=4)
    args = ap.parse_args()

    arms = {}
    for name, paired in (('default', False), ('paired', True)):
        run = build_arm(paired, args.batch)
        run(2)  # compile + settle AUTO formats
        arms[name] = run

    dts = {n: [] for n in arms}
    for _ in range(args.reps):
        for n, run in arms.items():
            wall = []
            for length in (SHORT, LONG):
                t0 = time.perf_counter()
                run(length)
                wall.append(time.perf_counter() - t0)
            dts[n].append((wall[1] - wall[0]) / (LONG - SHORT))

    out = {}
    for n, vals in dts.items():
        pos = [v for v in vals if v > 0]
        assert pos, (n, vals)
        out[n] = pos
        print(json.dumps({
            'arm': n,
            'step_ms_best': round(min(pos) * 1e3, 3),
            'step_ms_all': [round(v * 1e3, 3) for v in pos],
            'img_s_best': round(args.batch / min(pos), 1),
        }), flush=True)
    speedup = min(out['default']) / min(out['paired'])
    print(json.dumps({'paired_speedup_best': round(speedup, 4)}),
          flush=True)


if __name__ == '__main__':
    main()
