"""Capture a jax.profiler trace of the train step and print the
per-op device-time breakdown.

Parses the raw ``*.xplane.pb`` with tensorflow's bundled xplane proto
(no tensorboard_plugin_profile needed): sums event durations per line
of every device plane and prints the top ops plus a category rollup
(convolution / norm+elementwise / copy / optimizer / other), i.e. the
ground truth behind BENCHMARKS.md's MFU accounting.
"""

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def capture(steps, batch, size, auto_layout=False, s2d=False):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16, s2d=s2d)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3,
                         dtype=jnp.bfloat16, s2d=s2d)
    gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    state = init_train_state(gen, disc, (1, size, size, 3), 1, gen_tx,
                             disc_tx, seed=0)
    fn = make_train_step(gen, disc, gen_tx, disc_tx)
    step = jax.jit(fn, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(size=(batch, size, size, 3))
                       .astype(np.float32))
    y = jax.device_put((rng.uniform(size=(batch, size, size, 1)) > 0.5)
                       .astype(np.float32))

    if auto_layout:
        # the Trainer's shipping eager configuration (train/auto_layout)
        from patchgan_tpu.train.auto_layout import AutoLayoutStep
        step = AutoLayoutStep(fn, step)

    state, losses = step(state, x, y)  # compile + warm
    jax.block_until_ready(losses['gen'])

    outdir = tempfile.mkdtemp(prefix='patchgan_profile_')
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, losses = step(state, x, y)
        jax.block_until_ready(losses['gen'])
    return outdir


CATEGORIES = [
    # 'convolution' must NOT match 'convert' (dtype casts) -- that
    # would inflate the conv share this tool exists to isolate
    ('convolution', re.compile(r'convolution|\bdot\b', re.I)),
    # data movement, split three ways so the round-3 wgrad work can be
    # attributed: layout transposes vs dtype casts vs plain copies
    ('transpose', re.compile(r'transpose', re.I)),
    ('convert', re.compile(r'convert', re.I)),
    ('copy', re.compile(r'copy|bitcast', re.I)),
    ('all-reduce', re.compile(r'all-reduce|reduce-scatter|all-gather',
                              re.I)),
    ('fusion (norm/elementwise/opt)', re.compile(r'fusion|reduce', re.I)),
]


def categorize(name):
    for label, pat in CATEGORIES:
        if pat.search(name):
            return label
    return 'other'


def analyze(outdir, steps, top):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, '**', '*.xplane.pb'),
                      recursive=True)
    if not paths:
        print(json.dumps({'error': f'no xplane under {outdir}'}))
        return
    # events NEST across a plane's lines (a step marker spans the ops
    # inside it; async copy-start windows overlap compute), so sums are
    # only meaningful PER LINE -- report each device line separately
    # and break down ops on the busiest op line
    lines = {}
    n_events = collections.Counter()
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, 'rb') as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if 'TPU' not in plane.name and 'device' not in \
                    plane.name.lower():
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                key = f'{plane.name}/{line.name}'
                per_op = lines.setdefault(key, collections.Counter())
                for ev in line.events:
                    per_op[emeta[ev.metadata_id].name] += ev.duration_ps
                    n_events[key] += 1
    if not lines:
        names = [p.name for path in paths[:1]
                 for p in _planes(xplane_pb2, path)]
        print(json.dumps({'error': 'no device plane events',
                          'planes': names}))
        return
    # trust the trace's own step markers over the --steps flag (an
    # --analyze-only caller may not know the captured count)
    traced = [n_events[k] for k in lines if k.endswith('/Steps')]
    if traced and traced[0]:
        steps = traced[0]
    for key, per_op in sorted(lines.items()):
        print(json.dumps({'line': key,
                          'ms_per_step': round(
                              sum(per_op.values()) / 1e9 / steps, 3),
                          'events': n_events[key]}))
    # the exclusive execution timeline is the 'XLA Ops' line; 'Async
    # XLA Ops' records copy WINDOWS that overlap compute (their sum can
    # exceed wall time and only indicates overlap pressure)
    exec_lines = [c for k, c in lines.items()
                  if k.endswith('/XLA Ops')]
    busiest = exec_lines[0] if exec_lines else max(
        lines.values(), key=lambda c: sum(c.values()))
    total = sum(busiest.values())
    cats = collections.Counter()
    for name, ps in busiest.items():
        cats[categorize(name)] += ps
    for label, ps in cats.most_common():
        print(json.dumps({'category': label,
                          'ms_per_step': round(ps / 1e9 / steps, 3),
                          'share': round(ps / total, 3)}))
    for name, ps in busiest.most_common(top):
        print(json.dumps({'op': name[:100],
                          'us_per_step': round(ps / 1e6 / steps, 1)}))


def _planes(xplane_pb2, path):
    space = xplane_pb2.XSpace()
    with open(path, 'rb') as f:
        space.ParseFromString(f.read())
    return space.planes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--top', type=int, default=20)
    ap.add_argument('--analyze-only', default=None,
                    help='parse an existing trace dir instead')
    ap.add_argument('--auto_layout', action='store_true',
                    help='profile the AUTO-boundary-layout eager step '
                         '(the Trainer default, train/auto_layout.py)')
    ap.add_argument('--s2d', action='store_true',
                    help='space-to-depth boundary form (the Trainer '
                         'default; ops/s2d.py)')
    args = ap.parse_args()
    if args.analyze_only:
        analyze(args.analyze_only, args.steps, args.top)
        return
    outdir = capture(args.steps, args.batch, args.size, args.auto_layout,
                     args.s2d)
    print('trace dir:', outdir)
    analyze(outdir, args.steps, args.top)


if __name__ == '__main__':
    main()
