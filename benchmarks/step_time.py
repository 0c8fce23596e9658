"""Differential-scan timing of the FULL train step (noise-proof).

Variants of the headline step (256px, batch 16, bf16) are timed as
time(scan of L steps) - time(scan of S steps) over (L-S) steps, inside
one jitted program, so the axon relay's ~1 ms dispatch round-trip and
host jitter cancel. Variants are interleaved across reps so slow drift
(thermal, host load) hits all arms equally.

Usage: python benchmarks/step_time.py --variants xla,fused,remat_deep
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks._timing import diff_time  # noqa: E402

SIZE = 256
DEEP = ('enc4', 'enc5', 'enc6', 'dec0', 'dec1', 'dec2')

# name: (fused_conv_mode, remat, grad_dtype, dot_wgrad, auto_layout,
#        unroll)
VARIANTS = {
    'xla': ('off', False, None, 'off', False, 1),
    'fused': ('auto', False, None, 'off', False, 1),
    'remat_deep': ('off', DEEP, None, 'off', False, 1),
    'fused+remat_deep': ('auto', DEEP, None, 'off', False, 1),
    'gradbf16': ('off', False, 'bf16', 'off', False, 1),
    'all': ('auto', DEEP, 'bf16', 'off', False, 1),
    # transpose-free tap-dot conv weight gradients (ops/wgrad.py)
    'dot_wgrad': ('off', False, None, 'on', False, 1),
    # XLA-chosen boundary layouts for the train state (AUTO): does the
    # eager-dispatch win (benchmarks/layout_probe.py, ~9%) survive the
    # scan carry, i.e. does layout assignment propagate the parameter
    # layouts into the while-loop body? (Measured: NO — 15.09 vs
    # 15.11 ms, the carry pins the loop-boundary layouts either way.)
    'auto_layout': ('off', False, None, 'off', True, 1),
    # lax.scan unroll: N step bodies per while-loop iteration, so the
    # carry-boundary relayouts (the scan-mode analogue of the eager
    # boundary copies layout_probe kills) amortise over N steps and
    # XLA can chain step i's param layouts straight into step i+1
    'unroll2': ('off', False, None, 'off', False, 2),
    'unroll3': ('off', False, None, 'off', False, 3),
    'unroll6': ('off', False, None, 'off', False, 6),
}


def build(fused_mode, remat, grad_dtype, batch, dot_wgrad='off',
          auto_layout=False, unroll=1):
    os.environ['PATCHGAN_FUSED_CONV'] = fused_mode
    os.environ['PATCHGAN_DOT_WGRAD'] = dot_wgrad
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
    step = make_train_step(gen, disc, gen_tx, disc_tx,
                           loss_type='tversky', seg_alpha=200.0,
                           grad_dtype=gd)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(batch, SIZE, SIZE, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(batch, SIZE, SIZE, 1)) > 0.5)
                       .astype(np.float32))

    def scan_of(length):
        def run(state):
            def body(st, _):
                st, losses = step(st, x, y)
                return st, losses['gen']
            st, gens = jax.lax.scan(body, state, length=length,
                                    unroll=unroll)
            return gens[-1]
        if not auto_layout:
            return jax.jit(run)
        from jax.experimental.layout import Format, Layout
        jitted = jax.jit(run, in_shardings=Format(Layout.AUTO))
        compiled = jitted.lower(state).compile()
        fmt = compiled.input_formats[0][0]
        st_auto = jax.device_put(jax.tree.map(np.asarray, state), fmt)
        return lambda st: compiled(st_auto)
    return state, scan_of


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--short', type=int, default=3)
    ap.add_argument('--long', type=int, default=18)
    ap.add_argument('--reps', type=int, default=4)
    ap.add_argument('--variants', default='xla,fused,remat_deep')
    args = ap.parse_args()
    names = args.variants.split(',')

    arms = {}
    for name in names:
        fused_mode, remat, gd, dwg, auto, unroll = VARIANTS[name]
        state, scan_of = build(fused_mode, remat, gd, args.batch, dwg,
                               auto, unroll)
        rs, rl = scan_of(args.short), scan_of(args.long)
        # trace + compile BOTH scans NOW, while this variant's env flags
        # (PATCHGAN_FUSED_CONV / PATCHGAN_DOT_WGRAD, read at trace time)
        # are still set: deferring the long scan's first call to
        # diff_time's warmup would trace it under the LAST variant's
        # env, silently corrupting cross-env A/Bs
        g = float(rs(state))
        assert np.isfinite(g), (name, 'short', g)
        g = float(rl(state))
        assert np.isfinite(g), (name, 'long', g)
        arms[name] = (lambda r=rs, s=state: r(s),
                      lambda r=rl, s=state: r(s))

    # arms interleave within each rep (benchmarks/_timing.py)
    times = diff_time(arms, args.short, args.long, args.reps)
    for n in names:
        dt = times[n]
        print(json.dumps({'variant': n,
                          'step_ms': round(dt * 1e3, 3),
                          'img_s': round(args.batch / dt, 1)}), flush=True)


if __name__ == '__main__':
    main()
