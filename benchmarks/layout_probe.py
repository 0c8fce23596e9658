"""Does letting XLA choose the jit-boundary layouts of the train state
(jax.experimental.layout, Layout.AUTO) remove the per-step weight
relayout copies?

Round-3 context: the op-level trace (BENCHMARKS.md) shows ~1.8 ms/step
of f32/bf16 WEIGHT copies (e.g. f32[4,4,512,512] in both {3,2,1,0} and
the IO-swapped {2,3,1,0}) inside the step. If those exist because the
boundary pins params to the default layout while the program wants
another, compiling with AUTO in/out layouts and keeping the state in
the chosen layouts across steps should delete them. If AUTO picks the
default layout for every param, the boundary is exonerated and the
copies are internal to XLA's conv lowering (documented negative).

Method: the step is compiled once with default layouts and once with
AUTO (donated state, same HLO otherwise). Timing is N back-to-back
eager dispatches with the loss fetched once at the end (the Trainer's
real dispatch pattern; the axon relay cost is identical in both arms).
Prints the non-default layouts AUTO chose, then the per-step times.
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


def build(batch, s2d=False):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16, s2d=s2d)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3,
                         dtype=jnp.bfloat16, s2d=s2d)
    gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gen_tx,
                             disc_tx, seed=0)
    step = make_train_step(gen, disc, gen_tx, disc_tx,
                           loss_type='tversky', seg_alpha=200.0)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(batch, SIZE, SIZE, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(batch, SIZE, SIZE, 1)) > 0.5)
                       .astype(np.float32))
    return state, step, x, y


def time_eager(step_fn, state, x, y, steps):
    """Times back-to-back donated dispatches; returns the final state
    so callers can keep driving the (donated-away) train state."""
    state, losses = step_fn(state, x, y)  # warm
    jax.block_until_ready(losses['gen'])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = step_fn(state, x, y)
    g = float(losses['gen'])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(g)
    return dt, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--steps', type=int, default=60)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--arms', default='default,auto',
                    help='comma list of default,auto,s2d,s2d_auto; '
                         'append +ENV=val (repeatable) to trace an arm '
                         'with a trace-time env override, e.g. '
                         's2d_auto+PATCHGAN_NORM_VJP=custom')
    args = ap.parse_args()
    names = args.arms.split(',')

    env_overrides = {}  # arm name -> {ENV: val}
    base_names = []
    for n in names:
        base, *ovr = n.split('+')
        env_overrides[n] = dict(kv.split('=', 1) for kv in ovr)
        base_names.append(base)

    def compile_with_env(jitted, operands, env):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            return jitted.lower(*operands).compile()
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    arms = {}  # name -> [compiled, state, x, y]
    for s2d in sorted({b.startswith('s2d') for b in base_names}):
        state, step, x, y = build(args.batch, s2d=s2d)
        state_host = jax.tree.map(np.asarray, state)
        prefix = 's2d_' if s2d else ''
        base_name = 's2d' if s2d else 'default'
        auto_name = prefix + 'auto'

        base_c = jax.jit(step, donate_argnums=(0,)) \
            .lower(state, x, y).compile()
        first_base = True
        for n in names:
            base, env = n.split('+')[0], env_overrides[n]
            if base == base_name:
                c = base_c if not env else compile_with_env(
                    jax.jit(step, donate_argnums=(0,)), (state, x, y),
                    env)
                # every arm needs its OWN state: dispatch donates it
                st = state if first_base else jax.device_put(state_host)
                first_base = False
                arms[n] = [c, st, x, y]
            elif base == auto_name:
                auto = jax.jit(step, donate_argnums=(0,),
                               in_shardings=(Format(Layout.AUTO),
                                             Format(Layout.AUTO),
                                             Format(Layout.AUTO)),
                               out_shardings=Format(Layout.AUTO))
                compiled = compile_with_env(auto, (state, x, y), env)

                # what did AUTO choose? count params whose layout
                # differs from the default compiled boundary layouts
                fmts = jax.tree.leaves(compiled.input_formats[0][0])
                base_fmts = jax.tree.leaves(base_c.input_formats[0][0])
                ndiff = sum(1 for a, b in zip(fmts, base_fmts)
                            if a != b)
                print(json.dumps(
                    {'arm': n, 'params_total': len(fmts),
                     'params_nondefault_layout': ndiff}), flush=True)

                # relay the state (and batch) into the AUTO layouts
                # once, outside timing
                state_auto = jax.device_put(
                    state_host, compiled.input_formats[0][0])
                x_auto = jax.device_put(np.asarray(x),
                                        compiled.input_formats[0][1])
                y_auto = jax.device_put(np.asarray(y),
                                        compiled.input_formats[0][2])
                arms[n] = [compiled, state_auto, x_auto, y_auto]

    for rep in range(args.reps):
        out = {'rep': rep}
        for name in names:
            entry = arms[name]
            dt, entry[1] = time_eager(entry[0], entry[1], entry[2],
                                      entry[3], args.steps)
            out[name + '_ms'] = round(dt * 1e3, 3)
            out[name + '_img_s'] = round(args.batch / dt, 1)
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
