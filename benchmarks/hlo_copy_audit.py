"""Static copy/transpose/convert audit of the compiled train step.

Compiles the shipping step (s2d + AUTO boundary layouts, batch 16,
256px, bf16) for the real TPU and walks the OPTIMIZED HLO text for
data-movement ops -- `copy`, `transpose`, `convert`, `bitcast-convert`
-- both at top level and inside fusions, bucketing their output bytes
by (op, dtype, shape-class). This is the static complement to
benchmarks/profile_step.py's runtime attribution: it names WHICH
tensors are being copied (kernels vs activations vs norm stats) and in
which layouts, so copy-tail experiments (VERDICT r3 #2) can be aimed
instead of guessed.

Shape classes:
  kernel   -- 4D with two leading spatial dims of size <= 4 (HWIO-like)
  stat     -- total elements <= batch * 1024 (norm statistics & co)
  act      -- everything else 3/4-D (activations)

Usage: timeout 580 python benchmarks/hlo_copy_audit.py [--no-auto]
       [--batch 16] [--top 25]
Prints one JSON summary line last.
"""

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SIZE = 256

_DT_BYTES = {'f32': 4, 'bf16': 2, 'f16': 2, 's32': 4, 'u32': 4,
             's8': 1, 'u8': 1, 'pred': 1, 's64': 8, 'f64': 8}

# e.g.  %copy.5 = f32[4,4,512,512]{2,3,1,0:T(8,128)} copy(%p)
_OP_RE = re.compile(
    r'=\s*(\w+)\[([\d,]*)\]\s*(\{[^}]*\})?\s*'
    r'(copy|transpose|convert|bitcast-convert)\(')


def classify(shape, batch):
    if len(shape) == 4 and shape[0] <= 4 and shape[1] <= 4:
        return 'kernel'
    n = int(np.prod(shape)) if shape else 1
    if n <= batch * 1024:
        return 'stat'
    return 'act'


def audit(text, batch):
    rows = collections.Counter()
    counts = collections.Counter()
    for m in _OP_RE.finditer(text):
        dt, dims, layout, op = m.group(1), m.group(2), m.group(3), m.group(4)
        shape = tuple(int(d) for d in dims.split(',')) if dims else ()
        nbytes = int(np.prod(shape) if shape else 1) * _DT_BYTES.get(dt, 4)
        key = (op, classify(shape, batch), dt, shape,
               (layout or '').split(':')[0].strip('{'))
        rows[key] += nbytes
        counts[key] += 1
    return rows, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--no-auto', action='store_true')
    ap.add_argument('--no-s2d', action='store_true')
    ap.add_argument('--top', type=int, default=25)
    args = ap.parse_args()

    from benchmarks.layout_probe import build
    from jax.experimental.layout import Format, Layout

    state, step, x, y = build(args.batch, s2d=not args.no_s2d)
    if args.no_auto:
        compiled = jax.jit(step, donate_argnums=(0,)) \
            .lower(state, x, y).compile()
    else:
        compiled = jax.jit(
            step, donate_argnums=(0,),
            in_shardings=(Format(Layout.AUTO),) * 3,
            out_shardings=Format(Layout.AUTO)).lower(state, x, y).compile()
    text = compiled.as_text()

    rows, counts = audit(text, args.batch)
    total = collections.Counter()
    for (op, cls, dt, shape, layout), b in rows.items():
        total[(op, cls)] += b
    print('--- bytes by (op, class) ---')
    for (op, cls), b in total.most_common():
        print(f'{op:18s} {cls:7s} {b / 1e6:9.1f} MB')
    print(f'--- top {args.top} rows by bytes ---')
    for key, b in rows.most_common(args.top):
        op, cls, dt, shape, layout = key
        print(f'{b / 1e6:8.1f} MB  x{counts[key]:<3d} {op:10s} {cls:7s} '
              f'{dt}{list(shape)} {layout}')
    summary = {
        'metric': 'hlo_copy_bytes_mb',
        'value': round(sum(rows.values()) / 1e6, 1),
        'unit': 'MB/step',
        'auto': not args.no_auto, 's2d': not args.no_s2d,
        'batch': args.batch,
        'by_class': {f'{op}/{cls}': round(b / 1e6, 1)
                     for (op, cls), b in total.most_common()},
    }
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
