"""Headline benchmark: full GAN train-step throughput (images/sec/chip).

Measures the BASELINE.json config-2 workload -- COCO-stuff-shaped 256px
training, batch 16, Tversky + adversarial loss, bf16 compute -- as one
jitted generator+discriminator update with donated state, dispatched
exactly the way `patchgan_train` ships it: eager back-to-back steps
through the Trainer's AUTO-boundary-layout wrapper
(patchgan_tpu/train/auto_layout.py, PATCHGAN_AUTO_LAYOUT=on default),
losses fetched with a one-step delay. Synthetic device-resident data
isolates compute throughput from host IO.

Timing is DIFFERENTIAL: time(LONG back-to-back dispatches) -
time(SHORT dispatches) over the same compiled step, divided by
(LONG - SHORT), best-of-reps interleaved. Fixed costs (final loss
fetch, first-dispatch sync) cancel; per-dispatch host work overlaps
device compute because dispatches are asynchronous, so the reading is
device-bound -- cross-checked against the scan-based variant
(`--mode scan`, one dispatch running the whole chain on device, which
cancels the axon relay exactly but pays lax.scan's carry-boundary
relayouts that the shipping eager path avoids; BENCHMARKS.md round-3
"AUTO boundary layouts").

vs_baseline compares against a DERIVED PyTorch-on-A100 anchor of
550 img/s (the reference publishes no numbers and no GPU exists here to
measure it, BASELINE.md). Derivation -- reproducible via
benchmarks/a100_anchor.py and written out in BENCHMARKS.md "A100 anchor
derivation": the instrumented reference models cost 1131 GFLOP per
batch-16 Trainer.batch step, giving a 2206 img/s A100 roofline ceiling
at the 156 TFLOP/s TF32 tensor-core peak (compute-bound; eager fp32
bytes 10.9 GB sit below the HBM roof), and eager fp32/NCHW training of
conv+InstanceNorm stacks measures 20-30% of tensor-core peak in
practice (NGC eager ResNet-50 MFU; our torch-CPU cross-check hits 34%
of core peak WITH zero launch overhead) -> 440-660 img/s band, midpoint
550. Replaced by a measured number if GPU hardware ever materialises.

Prints exactly ONE JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
SIZE = 256
SHORT = 10
LONG = 70
REPS = 3
A100_TORCH_ANCHOR_IMG_S = 550.0  # derived; see module docstring


def build(batch=BATCH):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    # s2d=True: the space-to-depth boundary form the Trainer ships by
    # default (PATCHGAN_S2D=on; trainer.py _use_s2d) -- numerically
    # exact, identical parameter tree (ops/s2d.py, tests/test_s2d.py)
    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16, s2d=True)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3,
                         dtype=jnp.bfloat16, s2d=True)
    gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gen_tx,
                             disc_tx, seed=0)
    step = make_train_step(gen, disc, gen_tx, disc_tx,
                           loss_type='tversky', seg_alpha=200.0)
    # resident bf16 generator shadow, the Trainer's AUTO-path default
    # (PATCHGAN_SHADOW_PARAMS=on; trainer.py _shadow_params) --
    # bit-exact (tests/test_shadow_step.py)
    import os
    shadow_fn = None
    if os.environ.get('PATCHGAN_SHADOW_PARAMS', 'on').lower() not in \
            ('off', '0', 'false'):
        shadow_fn = make_train_step(gen, disc, gen_tx, disc_tx,
                                    loss_type='tversky', seg_alpha=200.0,
                                    shadow_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # x/y are jit ARGUMENTS: captured device arrays would be baked into
    # the program as constants, which the remote-compile path serialises
    # and constant-folds at a large compile-time cost
    x = jax.device_put(rng.uniform(size=(batch, SIZE, SIZE, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(batch, SIZE, SIZE, 1)) > 0.5)
                       .astype(np.float32))
    return state, step, shadow_fn, x, y


def fetch(v):
    v = float(v)
    assert np.isfinite(v), "non-finite generator loss in benchmark"
    return v


def eager_step_time(state, step, x, y, shadow_fn=None):
    """The shipping dispatch mode: Trainer-style eager steps through
    AutoLayoutStep (AUTO boundary layouts, donated state)."""
    from patchgan_tpu.train.auto_layout import AutoLayoutStep
    auto = AutoLayoutStep(
        step, jax.jit(step, donate_argnums=(0,)), shadow_fn=shadow_fn,
        shadow_dtype=jnp.bfloat16 if shadow_fn is not None else None)

    def run(state, n):
        for _ in range(n):
            state, losses = auto(state, x, y)
        fetch(losses['gen'])
        return state

    state = run(state, 2)  # compile + settle formats
    # per-rep differentials: pairing each rep's SHORT with ITS OWN LONG
    # keeps the estimate an actual (noisy) measurement of step time;
    # independently-minimized SHORT and LONG from different reps bias
    # low under relay jitter and can even go negative (ADVICE round 3)
    dts = []
    for _ in range(REPS):
        wall = []
        for n in (SHORT, LONG):
            t0 = time.perf_counter()
            state = run(state, n)
            wall.append(time.perf_counter() - t0)
        dts.append((wall[1] - wall[0]) / (LONG - SHORT))
    dt = min(d for d in dts if d > 0) if any(d > 0 for d in dts) else None
    assert dt is not None, f"all differential reps non-positive: {dts}"
    return dt


def scan_step_time(state, step, x, y):
    """Cross-check mode: the whole chain as ONE on-device lax.scan
    dispatch (cancels the axon relay exactly, but lax.scan pins its
    carry to default layouts, adding the relayouts the eager path
    avoids)."""
    from benchmarks._timing import diff_time_one

    def scan_of(length):
        @jax.jit
        def run(st, x, y):
            def body(s, _):
                s, losses = step(s, x, y)
                return s, losses['gen']
            s, gens = jax.lax.scan(body, st, length=length)
            return gens[-1]
        return run

    def runner(length):
        run = scan_of(length)
        return lambda: run(state, x, y)

    return diff_time_one(runner, 3, 18, REPS + 1, fetch=fetch)


def main():
    mode = 'scan' if '--mode' in sys.argv and \
        sys.argv[sys.argv.index('--mode') + 1] == 'scan' else 'eager'
    batch = int(sys.argv[sys.argv.index('--batch') + 1]) \
        if '--batch' in sys.argv else BATCH  # e.g. --batch 32, the
    #   documented recommended throughput config (BENCHMARKS.md)
    state, step, shadow_fn, x, y = build(batch)
    dt = (scan_step_time(state, step, x, y) if mode == 'scan'
          else eager_step_time(state, step, x, y, shadow_fn))
    img_s = batch / dt
    print(json.dumps({
        'metric': 'train_images_per_sec_per_chip',
        'value': round(img_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_s / A100_TORCH_ANCHOR_IMG_S, 3),
    }))


if __name__ == '__main__':
    main()
