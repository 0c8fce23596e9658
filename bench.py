"""Headline benchmark: full GAN train-step throughput (images/sec/chip).

Measures the BASELINE.json config-2 workload -- COCO-stuff-shaped 256px
training, batch 16, Tversky + adversarial loss, bf16 compute -- as one
jitted generator+discriminator update with donated state (the same step
patchgan_train runs). Synthetic device-resident data isolates compute
throughput from host IO.

Timing is DIFFERENTIAL: time(scan of 18 steps) - time(scan of 3 steps),
divided by 15, inside jitted lax.scan programs. This is how the Trainer
actually drives the chip (steps dispatched back-to-back, losses fetched
with a one-step delay) and it cancels this dev environment's axon-relay
dispatch round-trip (~0.7 ms/step, an artifact of the TPU tunnel, not
of the framework; measured: naive per-dispatch timing reads ~950 img/s
where the device step time is 15.1 ms = 1061 img/s). The long-scan
result is still end-to-end real: one dispatch executes 18 full G+D
updates on device.

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

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks._timing import diff_time_one

BATCH = 16
SIZE = 256
SHORT = 3
LONG = 18
REPS = 4
A100_TORCH_ANCHOR_IMG_S = 550.0  # derived; see module docstring


def main():
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3,
                         dtype=jnp.bfloat16)
    gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gen_tx,
                             disc_tx, seed=0)
    step = make_train_step(gen, disc, gen_tx, disc_tx,
                           loss_type='tversky', seg_alpha=200.0)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(BATCH, SIZE, SIZE, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(BATCH, SIZE, SIZE, 1)) > 0.5)
                       .astype(np.float32))

    # x/y are jit ARGUMENTS: captured device arrays would be baked into
    # the program as constants, which the remote-compile path serialises
    # and constant-folds at a large compile-time cost
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

    def fetch(v):
        v = float(v)
        assert np.isfinite(v), "non-finite generator loss in benchmark"
        return v

    dt = diff_time_one(runner, SHORT, LONG, REPS, fetch=fetch)
    img_s = BATCH / dt
    print(json.dumps({
        'metric': 'train_images_per_sec_per_chip',
        'value': round(img_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_s / A100_TORCH_ANCHOR_IMG_S, 3),
    }))


if __name__ == '__main__':
    main()
