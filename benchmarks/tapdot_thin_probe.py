"""Pure-XLA tap-dot reformulations of the thin-channel boundary convs.

Round-4 context (BENCHMARKS.md #16-#18): the s2d boundary convs run at
3-12% MXU under XLA's per-tap conv emitter (contraction = Cin lanes),
and the Pallas im2col kernel that fixes them in isolation is NEUTRAL at
full-step level because the custom-call boundary costs the surrounding
program its layouts/fusions. These formulations attack the same sites
WITHOUT leaving XLA, so the compiler keeps layout/fusion control — the
same property that made the s2d rewrite a shipping win where Pallas
lost.

Candidates (all mathematically the same conv, autodiff-friendly):
- thin INPUT (enc0 / disc0: 3x3 s1 p1, Cin=12):
  `tapconcat` — concatenate the nine spatially-shifted input slabs
  along C and contract once with the [9*Cin, Cout] reshaped kernel:
  K = 108 of 128 lanes instead of 12.
- thin OUTPUT (dec6 head: 3x3 s1 p1, Cout=4):
  `tapmerge` — contract x [.., Cin] with the kernel reshaped to
  [Cin, 9*Cout] (taps moved to the OUTPUT dim: N = 36 instead of 4),
  then shift-add the nine tap planes of z. The backward is exactly the
  mirrored trick: dz = shift-gather(dy) (free), dx = dz @ w2^T with
  K = 36 instead of 4, dw2 full-spatial contraction — all three pieces
  escape the thin-lane regime via plain autodiff.

Per-shape A/B with fixed-duration differential chains (cf.
fused_conv_table.py); the full-step A/B is the deciding measurement.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from benchmarks._timing import diff_time_one  # noqa: E402


def conv3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def tapconcat(x, w):
    """Thin-Cin form: one dot contracting K = 9*Cin."""
    n, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    slabs = [xp[:, r:r + h, s:s + wd, :]
             for r in range(3) for s in range(3)]
    p = jnp.concatenate(slabs, axis=-1)                  # [N,H,W,9C]
    w9 = w.reshape(9 * c, w.shape[3])                    # tap-major
    return lax.dot_general(p, w9, (((3,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)


def tapmerge(x, w):
    """Thin-Cout form: one dot with N = 9*Cout, then shift-add."""
    n, h, wd, c = x.shape
    cout = w.shape[3]
    w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(c, 9 * cout)
    z = lax.dot_general(x, w2, (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    z = z.reshape(n, h, wd, 9, cout)
    # y[h, w] = sum_{r,s} z[h + r - 1, w + s - 1, (r, s)] with zero
    # padding outside: pad z by 1 (zp[i + 1] = z[i]) and slice at r, s
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    y = jnp.zeros((n, h, wd, cout), jnp.float32)
    for r in range(3):
        for s in range(3):
            y = y + zp[:, r:r + h, s:s + wd, 3 * r + s]
    return y.astype(x.dtype)


SHAPES = [
    # name, H, W, Cin, Cout, candidate
    ('enc0', 128, 128, 12, 64, tapconcat),
    ('disc0_mask', 128, 128, 4, 64, tapconcat),
    ('head', 128, 128, 64, 4, tapmerge),
    ('head16', 128, 128, 64, 16, tapmerge),   # 4-class COCO head in s2d
]


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


def timed_fwd(fn, x, w, iters, reps):
    def body(c, _):
        out = fn(x + c, w)
        return jnp.mean(out).astype(x.dtype) * 1e-6, None
    return _diff_time(body, x, iters, reps)


def timed_grad(fn, x, w, iters, reps, argnums):
    # quadratic loss so the cotangent is data-dependent (a sum() loss
    # lets XLA fold the backward — the thin_conv_probe lesson)
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
    for name, h, wd, cin, cout, cand in shapes:
        x = jnp.asarray(rng.normal(size=(args.batch, h, wd, cin))
                        .astype(np.float32), dtype)
        wt = jnp.asarray(rng.normal(size=(3, 3, cin, cout))
                         .astype(np.float32) * 0.05, dtype)

        ref = np.asarray(conv3(x, wt), np.float32)
        got = np.asarray(cand(x, wt), np.float32)
        err = float(np.max(np.abs(ref - got))
                    / max(1e-6, float(np.max(np.abs(ref)))))
        row = {'shape': f'{args.batch}x{h}x{wd}x{cin}->{cout}',
               'candidate': cand.__name__, 'rel_err': round(err, 6)}

        fwd_flops = 2 * args.batch * h * wd * cout * 9 * cin
        floor = {'infer': fwd_flops / 197e12,
                 'wgrad': 2 * fwd_flops / 197e12,
                 'train': 3 * fwd_flops / 197e12}
        iters = {r: min(40000, max(30, int(args.chain_ms * 1e-3 / f)))
                 for r, f in floor.items()}

        for regime, argn in (('infer', None), ('wgrad', (1,)),
                             ('train', (0, 1))):
            it = iters[regime]
            if argn is None:
                t_x, v_x = timed_fwd(conv3, x, wt, it, args.reps)
                t_c, v_c = timed_fwd(cand, x, wt, it, args.reps)
            else:
                t_x, v_x = timed_grad(conv3, x, wt, it, args.reps, argn)
                t_c, v_c = timed_grad(cand, x, wt, it, args.reps, argn)
            row[regime] = {
                'xla_us': round(t_x * 1e6, 1),
                'cand_us': round(t_c * 1e6, 1),
                'speedup': round(t_x / t_c, 3),
                'var': f'{max(v_x, v_c):.1%}', 'iters': it}
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
