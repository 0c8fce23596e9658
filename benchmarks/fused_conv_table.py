"""Per-shape A/B of the fused Pallas conv+IN+act kernel vs XLA.

Round-1 per-dispatch timing through the axon relay had ~4x run-to-run
variance (BENCHMARKS.md), too noisy to gate on. This harness instead
runs K chained iterations of each op INSIDE one jitted lax.scan (data
dependency via the carry prevents CSE), so one dispatch covers K ops
and relay jitter amortizes to ~nothing.

Measures every generator DownBlock shape (UNet nf=64, 256px, batch 16)
in two regimes:
  infer: forward only
  train: forward + backward w.r.t. (x, w) (the fused kernel's backward
         is the XLA recompute via custom_vjp, so train measures
         fused-fwd+recompute-bwd vs XLA-fwd+saved-residual-bwd)

Prints one JSON line per (shape, regime) with img/s-equivalent times
and the fused/xla speedup; exits with a summary table suitable for
baking into ops/pallas/dispatch_table.py.

Round-4 hardening: a FIXED scan length was still noise-dominated for
the small shapes (a 10us op x 60 iters is a 0.6 ms chain vs ~1 ms
relay jitter -- three iters=60 runs disagreed 0.02x..5.8x on enc6).
The chain length is now derived PER SHAPE from the op's MXU floor so
every long chain is >= --chain-ms of device time (default 60 ms);
relay jitter then amortizes below ~2%, and each row carries its
per-rep spread as an explicit variance bound.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ.setdefault('PATCHGAN_FUSED_CONV', 'on')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks._timing import diff_time_one  # noqa: E402
from patchgan_tpu.ops.conv import conv2d  # noqa: E402
from patchgan_tpu.ops.norm import instance_norm  # noqa: E402
from patchgan_tpu.ops.pallas.conv_norm_act import (  # noqa: E402
    fused_conv_norm_act, fused_conv_supported)

# (H, W, Cin, Cout) of each UNet nf=64 DownBlock at 256px input;
# enc0 (3->64) is below the kernel's Cin>=16 gate
SHAPES = [
    ('enc1', 128, 128, 64, 128),
    ('enc2', 64, 64, 128, 256),
    ('enc3', 32, 32, 256, 512),
    ('enc4', 16, 16, 512, 512),
    ('enc5', 8, 8, 512, 512),
    ('enc6', 4, 4, 512, 512),
]

# UpBlock (input-side H, W, Cin_total incl. skip, Cout); dec5/dec6 are
# below the convT kernel's Cout>=128 lane gate
CONVT_SHAPES = [
    ('dec0', 2, 2, 512, 512),
    ('dec1', 4, 4, 1024, 512),
    ('dec2', 8, 8, 1024, 512),
    ('dec3', 16, 16, 1024, 256),
    ('dec4', 32, 32, 512, 128),
]

EPS = 1e-5
ACT = 'tanh'


def xla_op(x, w):
    return instance_norm(conv2d(x, w), eps=EPS, activation=ACT,
                         use_pallas=False)


def fused_op(x, w):
    return fused_conv_norm_act(x, w, EPS, ACT)


def xla_convt_op(x, w):
    from patchgan_tpu.ops.conv import conv_transpose2d
    return instance_norm(conv_transpose2d(x, w), eps=EPS, activation=ACT,
                         use_pallas=False)


def fused_convt_op(x, w):
    from patchgan_tpu.ops.pallas.convt_norm_act import fused_convt_norm_act
    return fused_convt_norm_act(x, w, EPS, ACT, None)


def _diff_time(body, x, iters, reps):
    """Differential scan timing via benchmarks/_timing.py: the fixed
    per-dispatch cost (the axon relay round-trip is ~1 ms, swamping
    sub-ms ops) cancels exactly; only true per-op device time remains.

    Returns (min positive per-rep diff, relative per-rep spread)."""
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


def timed_grad(fn, x, w, iters, reps):
    def loss(x_, w_):
        return jnp.sum(fn(x_, w_).astype(jnp.float32))

    vag = jax.value_and_grad(loss, argnums=(0, 1))

    def body(c, _):
        v, (dx, dw) = vag(x + c, w)
        return (jnp.mean(dx) + jnp.mean(dw)).astype(x.dtype) * 1e-6, None

    return _diff_time(body, x, iters, reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--chain-ms', type=float, default=60.0,
                    help='target device time of the LONG scan chain, '
                         'sized per shape from the MXU floor')
    ap.add_argument('--max-iters', type=int, default=40000)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--convt', action='store_true',
                    help='measure UpBlock convT shapes instead')
    ap.add_argument('--only', default=None,
                    help='comma-separated layer names to measure')
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    if args.convt:
        os.environ['PATCHGAN_FUSED_CONVT'] = 'on'
        shapes, ops = CONVT_SHAPES, (xla_convt_op, fused_convt_op)
    else:
        shapes, ops = SHAPES, (xla_op, fused_op)

    if args.only:
        keep = set(args.only.split(','))
        shapes = [s for s in shapes if s[0] in keep]

    rng = np.random.default_rng(0)
    table = {}
    for name, h, w_, cin, cout in shapes:
        # cast on device via jnp: numpy bf16 (ml_dtypes) silently promotes
        # under python-scalar math, which would hand the fused kernel f32
        # weights while conv2d downcasts -- an unfair (and VMEM-blowing)
        # comparison
        x = jnp.asarray(rng.normal(size=(args.batch, h, w_, cin))
                        .astype(np.float32), dtype)
        wt = jnp.asarray(rng.normal(size=(4, 4, cin, cout))
                         .astype(np.float32) * 0.05, dtype)
        if args.convt:
            from patchgan_tpu.ops.pallas.convt_norm_act import \
                fused_convt_supported
            assert fused_convt_supported(x, wt, ACT), name
        else:
            assert fused_conv_supported(x, wt, ACT), name
        row = {'shape': f'{args.batch}x{h}x{w_}x{cin}->{cout}'}

        # physical floor: the op's forward MACs at bf16 MXU peak
        # (197 TFLOP/s on v5e). A differential reading BELOW this is
        # impossible (observed once at iters=30: enc1 "8.6us" vs an
        # 87us floor) and marks the row unreliable rather than being
        # recorded. Train regime ~3x forward (fwd + dgrad + wgrad,
        # stride-2 so dilation zeros are skipped either way).
        if args.convt:
            out_elems = args.batch * (2 * h) * (2 * w_) * cout
            fwd_flops = 2 * out_elems * (16 // 4) * cin
        else:
            out_elems = args.batch * (h // 2) * (w_ // 2) * cout
            fwd_flops = 2 * out_elems * 16 * cin
        floor = {'infer': fwd_flops / 197e12,
                 'train': 3 * fwd_flops / 197e12}
        # chain length so the LONG arm is >= chain_ms of device time
        # even if the op ran AT the MXU floor (real ops are slower, so
        # real chains are longer); lax.scan is rolled, so length does
        # not grow the compiled program
        iters = {r: min(args.max_iters,
                        max(30, int(args.chain_ms * 1e-3 / floor[r])))
                 for r in floor}

        def measure(timer, op, regime):
            # one retry on an all-non-positive rep set (transient host
            # contention) or a sub-floor reading; a second failure
            # marks the row unreliable
            for attempt in (0, 1):
                try:
                    t, var = timer(op, x, wt, iters[regime], args.reps)
                    if t >= floor[regime] * 0.9:
                        return t, var
                    err = (f'{t * 1e6:.1f}us below the {regime} MXU '
                           f'floor {floor[regime] * 1e6:.1f}us')
                except ValueError as e:
                    err = str(e)[:160]
                if attempt:
                    print(json.dumps({'layer': name, 'unreliable': err}),
                          flush=True)
                    return None, None
        for regime, timer in (('infer', timed), ('train', timed_grad)):
            t_x, v_x = measure(timer, ops[0], regime)
            t_f, v_f = measure(timer, ops[1], regime)
            row[f'{regime}_xla_us'] = round(t_x * 1e6, 1) if t_x else None
            row[f'{regime}_fused_us'] = round(t_f * 1e6, 1) if t_f \
                else None
            row[f'{regime}_speedup'] = round(t_x / t_f, 3) \
                if t_x and t_f else None
            row[f'{regime}_var'] = round(max(v_x, v_f), 3) \
                if t_x and t_f else None
            row[f'{regime}_iters'] = iters[regime]
        table[name] = row
        print(json.dumps({'layer': name, **row}), flush=True)

    # a winner must BEAT XLA on inference, not lose training, and both
    # readings must be tight enough to trust (<10% per-rep spread)
    winners = [n for n, r in table.items()
               if (r['infer_speedup'] or 0) > 1.05
               and (r['train_speedup'] or 0) > 0.98
               and (r['infer_var'] or 1) < 0.10
               and (r['train_var'] or 1) < 0.10]
    print(json.dumps({'winners_infer_and_train_neutral': winners}))


if __name__ == '__main__':
    main()
