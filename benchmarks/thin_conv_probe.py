"""Per-shape A/B of the Pallas thin-conv kernels vs XLA's conv emitter.

Shapes = the s2d boundary convs the round-4 trace showed at 3-12% MXU
(BENCHMARKS.md "per-conv-fusion efficiency"): generator enc0
(16x128x128x12->64), the discriminator split conv0 (12->64 and 4->64),
at 256px/batch-16. Fixed-duration differential scan timing (chain
length from the MXU floor, cf. fused_conv_table.py).

Regimes: infer (forward), train (forward + grads wrt x and w), and
wgrad (grad wrt w only — the enc0 case, where dx is DCE'd).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ.setdefault('PATCHGAN_THIN_CONV', 'on')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from benchmarks._timing import diff_time_one  # noqa: E402
from patchgan_tpu.ops.pallas.thin_conv import (  # noqa: E402
    thin_conv3x3, thin_conv_supported)

SHAPES = [
    ('enc0', 128, 128, 12, 64),
    ('disc0_img', 128, 128, 12, 64),
    ('disc0_mask', 128, 128, 4, 64),
    ('disc0_cat16', 128, 128, 16, 64),
]


def xla_op(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _diff_time(body, x, iters, reps):
    short, long_ = max(iters // 6, 2), iters

    def runner(length):
        @jax.jit
        def run():
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype),
                                length=length)
            return c
        return run

    diffs = diff_time_one(runner, short, long_, reps, full=True)
    t = min(diffs)
    return t, (max(diffs) - t) / t


def timed(fn, x, w, iters, reps):
    def body(c, _):
        out = fn(x + c, w)
        return jnp.mean(out).astype(x.dtype) * 1e-6, None
    return _diff_time(body, x, iters, reps)


def timed_grad(fn, x, w, iters, reps, argnums=(0, 1)):
    # QUADRATIC loss: the conv-output cotangent is then y itself, not
    # a constant — with a bare conv and sum(), dy == ones and XLA
    # constant-folds the "wgrad" into a plain reduction of x (observed:
    # train_xla < infer_xla). sum(y^2)/2 keeps the backward real at the
    # cost of one elementwise pass, identical for both arms.
    def loss(x_, w_):
        y = fn(x_, w_).astype(jnp.float32)
        return 0.5 * jnp.sum(y * y)
    vag = jax.value_and_grad(loss, argnums=argnums)

    def body(c, _):
        v, gs = vag(x + c, w)
        if not isinstance(gs, tuple):
            gs = (gs,)
        tot = sum(jnp.mean(g) for g in gs)
        return tot.astype(x.dtype) * 1e-6, None
    return _diff_time(body, x, iters, reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--chain-ms', type=float, default=60.0)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--only', default=None)
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    shapes = SHAPES
    if args.only:
        keep = set(args.only.split(','))
        shapes = [s for s in shapes if s[0] in keep]

    rng = np.random.default_rng(0)
    for name, h, w_, cin, cout in shapes:
        x = jnp.asarray(rng.normal(size=(args.batch, h, w_, cin))
                        .astype(np.float32), dtype)
        wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout))
                         .astype(np.float32) * 0.05, dtype)
        if not thin_conv_supported(x, wt):
            print(json.dumps({'layer': name, 'skipped': 'unsupported '
                              '(gate: thin_conv_supported)'}), flush=True)
            continue
        row = {'shape': f'{args.batch}x{h}x{w_}x{cin}->{cout}'}

        fwd_flops = 2 * args.batch * h * w_ * cout * 9 * cin
        floor = {'infer': fwd_flops / 197e12,
                 'train': 3 * fwd_flops / 197e12,
                 'wgrad': 2 * fwd_flops / 197e12}
        iters = {r: min(40000, max(30, int(args.chain_ms * 1e-3 / f)))
                 for r, f in floor.items()}

        regimes = [
            ('infer', lambda f, i: timed(f, x, wt, i, args.reps)),
            ('train', lambda f, i: timed_grad(f, x, wt, i, args.reps)),
            ('wgrad', lambda f, i: timed_grad(f, x, wt, i, args.reps,
                                              argnums=(1,))),
        ]
        for regime, timer in regimes:
            it = iters[regime]
            t_x, v_x = timer(xla_op, it)
            t_p, v_p = timer(thin_conv3x3, it)
            row[f'{regime}_xla_us'] = round(t_x * 1e6, 1)
            row[f'{regime}_pallas_us'] = round(t_p * 1e6, 1)
            row[f'{regime}_speedup'] = round(t_x / t_p, 3)
            row[f'{regime}_var'] = round(max(v_x, v_p), 3)
        print(json.dumps({'layer': name, **row}), flush=True)


if __name__ == '__main__':
    main()
