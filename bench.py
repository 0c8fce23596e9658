"""Headline benchmark: full GAN train-step throughput (images/sec/chip).

Measures the BASELINE.json config-2 workload -- COCO-stuff-shaped 256px
training, batch 16, Tversky + adversarial loss, bf16 compute -- as one
jitted generator+discriminator update with donated state (the same step
patchgan_train runs). Synthetic device-resident data isolates compute
throughput from host IO.

vs_baseline compares against an ESTIMATED PyTorch-on-A100 reference of
400 img/s for this model/batch (the reference publishes no numbers,
BASELINE.md; pix2pix-class 256px GAN training with cuDNN benchmark mode
lands in the 300-500 img/s band on A100). This anchor is replaced by a
measured torch number when hardware to measure it exists.

Prints exactly ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
SIZE = 256
WARMUP = 5
ITERS = 30
A100_TORCH_EST_IMG_S = 400.0


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

    step = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                   loss_type='tversky', seg_alpha=200.0),
                   donate_argnums=(0,))

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(BATCH, SIZE, SIZE, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(BATCH, SIZE, SIZE, 1)) > 0.5)
                       .astype(np.float32))

    for _ in range(WARMUP):
        state, losses = step(state, x, y)
    # force the dependency chain by fetching a loss scalar: through the
    # axon tunnel, block_until_ready alone has been observed to return
    # before the dispatched chain actually finishes
    float(losses['gen'])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, losses = step(state, x, y)
    g_final = float(losses['gen'])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(g_final), "non-finite generator loss in benchmark"

    img_s = BATCH * ITERS / elapsed
    print(json.dumps({
        'metric': 'train_images_per_sec_per_chip',
        'value': round(img_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_s / A100_TORCH_EST_IMG_S, 3),
    }))


if __name__ == '__main__':
    main()
