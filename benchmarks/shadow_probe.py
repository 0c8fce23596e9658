"""Does carrying a bf16 generator shadow in the train state delete the
per-step f32 kernel relayout copies?

Round-4 context (BENCHMARKS.md): the op-level trace shows ~1.9 ms/step
of f32 kernel-shaped copies ({3,2,1,0} and the IO-swapped {2,3,1,0}) --
the f32 masters are consumed by the forward casts AND the optimizer in
conflicting layouts. steps.make_train_step(shadow_dtype=bf16) hoists
the model's internal casts into the boundary: masters are then touched
only by elementwise (layout-agnostic) optimizer ops, shadows carry the
forward-layout kernels at half width. Bit-exact by construction
(tests/test_shadow_step.py).

Both arms run the shipping single-chip regime (s2d boundary form, AUTO
boundary layouts, donated state) and are timed interleaved with
back-to-back eager dispatches (the Trainer's dispatch pattern).

Usage: timeout 590 python benchmarks/shadow_probe.py [--steps 60]
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
from jax.experimental.layout import Format, Layout  # noqa: E402

SIZE = 256


def build(batch):
    from patchgan_tpu.models import Discriminator, UNet
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
    plain = make_train_step(gen, disc, gen_tx, disc_tx,
                            loss_type='tversky', seg_alpha=200.0)
    shadow = make_train_step(gen, disc, gen_tx, disc_tx,
                             loss_type='tversky', seg_alpha=200.0,
                             shadow_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(batch, SIZE, SIZE, 3)).astype(np.float32)
    y = (rng.uniform(size=(batch, SIZE, SIZE, 1)) > 0.5) \
        .astype(np.float32)
    return state, plain, shadow, x, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--steps', type=int, default=60)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    from patchgan_tpu.train.steps import make_shadows
    state, plain, shadow, x, y = build(args.batch)
    state_host = jax.tree.map(np.asarray, state)

    auto = Format(Layout.AUTO)
    plain_c = jax.jit(plain, donate_argnums=(0,),
                      in_shardings=(auto,) * 3,
                      out_shardings=auto).lower(state, x, y).compile()
    g16 = make_shadows(state, jnp.bfloat16)
    shadow_c = jax.jit(shadow, donate_argnums=(0, 1),
                       in_shardings=(auto,) * 4,
                       out_shardings=auto).lower(state, g16, x,
                                                 y).compile()

    arms = {}
    st = jax.device_put(state_host, plain_c.input_formats[0][0])
    xa = jax.device_put(x, plain_c.input_formats[0][1])
    ya = jax.device_put(y, plain_c.input_formats[0][2])
    arms['plain'] = [plain_c, [st], xa, ya]
    st2 = jax.device_put(state_host, shadow_c.input_formats[0][0])
    g16h = jax.tree.map(np.asarray, g16)
    g16d = jax.device_put(g16h, shadow_c.input_formats[0][1])
    xb = jax.device_put(x, shadow_c.input_formats[0][2])
    yb = jax.device_put(y, shadow_c.input_formats[0][3])
    arms['shadow'] = [shadow_c, [st2, g16d], xb, yb]

    def run(entry, steps):
        fn, carry, xx, yy = entry
        out = fn(*carry, xx, yy)  # warm / first dispatch
        carry[:] = out[:-1]
        losses = out[-1]
        jax.block_until_ready(losses['gen'])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*carry, xx, yy)
            carry[:] = out[:-1]
        g = float(out[-1]['gen'])
        dt = (time.perf_counter() - t0) / steps
        assert np.isfinite(g)
        return dt

    for rep in range(args.reps):
        res = {'rep': rep}
        for name, entry in arms.items():
            dt = run(entry, args.steps)
            res[name + '_ms'] = round(dt * 1e3, 3)
            res[name + '_img_s'] = round(args.batch / dt, 1)
        print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
