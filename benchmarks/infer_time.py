"""Differential-scan timing of the generator inference forward.

Same methodology as step_time.py: time(scan of L fwds) - time(scan of
S fwds) over (L-S), cancelling the axon relay's per-dispatch cost, so
the number is true device throughput for back-to-back batches (what
the tiled inference engine's fixed-bucket loop dispatches).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks._timing import diff_time_one  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--short', type=int, default=5)
    ap.add_argument('--long', type=int, default=45)
    ap.add_argument('--reps', type=int, default=4)
    ap.add_argument('--s2d', action='store_true',
                    help='space-to-depth boundary form incl. the '
                         'to/from conversions inside the timed body')
    args = ap.parse_args()

    from patchgan_tpu.models import UNet
    from patchgan_tpu.ops.tapdot import set_tapdot_regime
    set_tapdot_regime('infer')   # forward-only, as the InferenceEngine
    model = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
                 dtype=jnp.bfloat16, s2d=args.s2d)
    if args.s2d:
        from patchgan_tpu.ops.s2d import depth_to_space, space_to_depth
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(args.batch, args.size,
                                         args.size, 3))
                       .astype(np.float32).astype(jnp.bfloat16))
    x0 = jnp.zeros((1, args.size, args.size, 3))
    params = model.init(jax.random.PRNGKey(0),
                        space_to_depth(x0) if args.s2d else x0)['params']

    # params/x must be jit ARGUMENTS: captured device arrays become
    # program constants, and serialising 25M-param constants through
    # the remote-compile path blows compile time up ~50x (measured
    # 253 s vs a few seconds for the same scan with arguments)
    def scan_of(length):
        @jax.jit
        def run(params, x):
            def body(c, _):
                xi = x + c
                if args.s2d:
                    out = depth_to_space(model.apply(
                        {'params': params}, space_to_depth(xi),
                        train=False))
                else:
                    out = model.apply({'params': params}, xi, train=False)
                return jnp.mean(out).astype(x.dtype) * 1e-6, None
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype),
                                length=length)
            return c
        return lambda: run(params, x)

    assert np.isfinite(float(scan_of(args.short)()))
    dt = diff_time_one(scan_of, args.short, args.long, args.reps)
    print(json.dumps({'metric': 'infer_images_per_sec_per_chip',
                      'batch': args.batch, 'size': args.size,
                      'fwd_ms': round(dt * 1e3, 3),
                      'img_s': round(args.batch / dt, 1)}))


if __name__ == '__main__':
    main()
