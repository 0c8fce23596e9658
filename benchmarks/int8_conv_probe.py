"""Probe: does XLA on TPU emit fast int8 MXU convs?

Differential-scan timing (long scan - short scan, relay cost cancels)
of ``lax.conv_general_dilated`` at representative UNet shapes in bf16
vs int8 x int8 -> int32 (``preferred_element_type``). The v5e MXU has
2x int8 peak (394 TOPS vs 197 TFLOP/s bf16); if XLA lowers the int8
conv natively this motivates an int8 inference path, if it falls back
to upcasting there is nothing to win.
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

DIMS = ('NHWC', 'HWIO', 'NHWC')

# (label, N, H, W, Cin, Cout): UNet encoder ladder at batch 16
SHAPES = [
    ('enc1', 16, 128, 128, 64, 128),
    ('enc2', 16, 64, 64, 128, 256),
    ('enc3', 16, 32, 32, 256, 512),
]


def time_fn(fn, x, w, short, long_, reps):
    # carry rules per benchmarks/_timing.py: input depends on the
    # carry (else XLA hoists the loop-invariant conv) and the carry
    # consumes ALL output elements (a single-element read lets XLA
    # narrow the conv to one output window -- measured 50x "too fast")
    def scan_of(length):
        @jax.jit
        def run():
            def body(c, _):
                y = fn(x + c.astype(x.dtype), w)
                return (jnp.sum(y).astype(jnp.int32) % 2), None
            c, _ = lax.scan(body, jnp.zeros((), jnp.int32),
                            length=length)
            return c
        return run

    return diff_time_one(scan_of, short, long_, reps)


def main():
    ap = argparse.ArgumentParser()
    # these ops are ~10 us on v5e; the relay's per-dispatch noise needs
    # multi-ms scans to cancel, hence the long chains
    ap.add_argument('--short', type=int, default=300)
    ap.add_argument('--long', type=int, default=1800)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for label, n, h, wd, cin, cout in SHAPES:
        xf = rng.normal(size=(n, h, wd, cin)).astype(np.float32)
        wf = rng.normal(size=(4, 4, cin, cout)).astype(np.float32) * 0.05
        xb = jax.device_put(jnp.asarray(xf, jnp.bfloat16))
        wb = jax.device_put(jnp.asarray(wf, jnp.bfloat16))
        xi = jax.device_put(jnp.asarray(
            np.clip(np.round(xf * 20), -127, 127), jnp.int8))
        wi = jax.device_put(jnp.asarray(
            np.clip(np.round(wf * 400), -127, 127), jnp.int8))

        def conv_bf16(x, w):
            return lax.conv_general_dilated(
                x, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=DIMS)

        def conv_int8(x, w):
            return lax.conv_general_dilated(
                x, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=DIMS,
                preferred_element_type=jnp.int32)

        dt_b = time_fn(conv_bf16, xb, wb, args.short, args.long,
                       args.reps)
        dt_i = time_fn(conv_int8, xi, wi, args.short, args.long,
                       args.reps)
        flops = 2 * n * (h // 2) * (wd // 2) * cout * 16 * cin
        print(json.dumps({
            'shape': label,
            'bf16_us': round(dt_b * 1e6, 1),
            'int8_us': round(dt_i * 1e6, 1),
            'speedup': round(dt_b / dt_i, 3),
            'bf16_tflops': round(flops / dt_b / 1e12, 1),
            'int8_tops': round(flops / dt_i / 1e12, 1),
        }))


if __name__ == '__main__':
    main()
