"""BASELINE config 3: transfer fine-tune step cost (freeze encoder,
retrain decoder).

Three arms, all in the shipping single-chip regime (s2d boundary form,
AUTO boundary layouts, bf16 generator shadow, donated state), timed
interleaved with back-to-back eager dispatches:

- ``full``: the ordinary train step (no freezing) -- context;
- ``mask_only``: encoder frozen ONLY via the optimizer-side
  optax.set_to_zero mask;
- ``frozen``: the shipping config-3 path -- the same optimizer mask
  PLUS steps.freeze_stop_gradients (trace-level cotangent cut).

EXPECTED at every_k=1 (measured, tests/test_freeze_step.py): mask_only
compiles IDENTICALLY to frozen -- set_to_zero's zeros_like updates
sever the grads' data dependency, so XLA DCEs the encoder backward
either way; the stop_gradient matters under gradient accumulation,
where the MultiSteps accumulator keeps raw grads live. So the probe's
headline is frozen vs full (the config-3 fine-tune speedup), with
mask_only as the compiled-equivalence check on real hardware.

The reference cannot freeze anything (no trainable-subset flag in
/root/reference/patchgan/trainer.py), so config 3's comparison is
internal: frozen vs full.

Each AOT compile of the shadow step takes 2-4+ min through the axon
relay, so ``--arms`` runs a subset per invocation (e.g. ``--arms
full,frozen``); compile completions are flushed line-by-line.

Usage: timeout 590 python benchmarks/finetune_probe.py \
           [--steps 60] [--arms full,frozen]
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
FREEZE = ('enc',)


ARM_SPECS = {
    'full': ((), False),
    'mask_only': (FREEZE, False),
    'frozen': (FREEZE, True),
}


def build(batch, arms):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16, s2d=True)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3,
                         dtype=jnp.bfloat16, s2d=True)

    def mk(freeze, stop_grad):
        gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16,
                                freeze_patterns=freeze)
        disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
        state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1,
                                 gen_tx, disc_tx, seed=0)
        fn = make_train_step(
            gen, disc, gen_tx, disc_tx, loss_type='tversky',
            seg_alpha=200.0, shadow_dtype=jnp.bfloat16,
            freeze_patterns=freeze if stop_grad else ())
        return state, fn

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(batch, SIZE, SIZE, 3)).astype(np.float32)
    y = (rng.uniform(size=(batch, SIZE, SIZE, 1)) > 0.5) \
        .astype(np.float32)
    return {name: mk(*ARM_SPECS[name]) for name in arms}, x, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--steps', type=int, default=60)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--arms', default='full,mask_only,frozen',
                    help='comma list from {full,mask_only,frozen}')
    args = ap.parse_args()
    names = [a.strip() for a in args.arms.split(',') if a.strip()]
    assert all(n in ARM_SPECS for n in names), names

    from patchgan_tpu.train.steps import make_shadows
    specs, x, y = build(args.batch, names)

    auto = Format(Layout.AUTO)
    arms = {}
    for name, (state, fn) in specs.items():
        t0 = time.perf_counter()
        g16 = make_shadows(state, jnp.bfloat16)
        compiled = jax.jit(fn, donate_argnums=(0, 1),
                           in_shardings=(auto,) * 4,
                           out_shardings=auto).lower(state, g16, x,
                                                     y).compile()
        fmts = compiled.input_formats[0]
        st = jax.device_put(jax.tree.map(np.asarray, state), fmts[0])
        gd = jax.device_put(jax.tree.map(np.asarray, g16), fmts[1])
        xa = jax.device_put(x, fmts[2])
        ya = jax.device_put(y, fmts[3])
        flops = compiled.cost_analysis()
        if isinstance(flops, (list, tuple)):
            flops = flops[0]
        arms[name] = [compiled, [st, gd], xa, ya,
                      float(flops.get('flops', 0.0))]
        print(json.dumps({'compiled': name,
                          'secs': round(time.perf_counter() - t0, 1)}),
              flush=True)

    def run(entry, steps):
        fn, carry, xx, yy, _ = entry
        out = fn(*carry, xx, yy)  # warm / first dispatch
        carry[:] = out[:-1]
        jax.block_until_ready(out[-1]['gen'])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*carry, xx, yy)
            carry[:] = out[:-1]
        g = float(out[-1]['gen'])
        dt = (time.perf_counter() - t0) / steps
        assert np.isfinite(g)
        return dt

    print(json.dumps({k: {'gflop_step': round(v[-1] / 1e9, 1)}
                      for k, v in arms.items()}), flush=True)
    for rep in range(args.reps):
        res = {'rep': rep}
        for name, entry in arms.items():
            dt = run(entry, args.steps)
            res[name + '_ms'] = round(dt * 1e3, 3)
            res[name + '_img_s'] = round(args.batch / dt, 1)
        print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
