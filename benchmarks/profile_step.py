"""Capture a jax.profiler trace of the train step and print the
per-op device-time breakdown.

Parses the raw ``*.xplane.pb`` with tensorflow's bundled xplane proto
(no tensorboard_plugin_profile needed): sums event durations per line
of every device plane and prints the top ops plus a category rollup,
i.e. the ground truth behind BENCHMARKS.md's MFU accounting.

Categories are derived from each op's OWN opcode; fusion ops are
attributed by the contents of their fused computation, joined from the
optimized-HLO module text saved next to the trace (round-4 fix -- the
old regex-over-full-op-text categoriser counted any fusion with a
%copy-named OPERAND as a copy, which misattributed ~6 ms/step of conv
fusions as data movement; BENCHMARKS.md round-4 "corrected
attribution").
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
    # save the optimized HLO next to the trace so analyze() can
    # attribute fusion ops by their fused-computation contents
    try:
        if auto_layout:
            compiled = next(v[0] for v in step._cache.values()
                            if v is not None)
        else:
            compiled = step.lower(state, x, y).compile()
        with open(os.path.join(outdir, 'module.hlo.txt'), 'w') as f:
            f.write(compiled.as_text())
    except Exception as e:  # pragma: no cover - join is best-effort
        print(f'warning: no HLO join ({e})')

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, losses = step(state, x, y)
        jax.block_until_ready(losses['gen'])
    return outdir


# --- categorisation --------------------------------------------------
#
# ROUND-4 FIX (load-bearing): an event's metadata name is the op's FULL
# one-line HLO text INCLUDING ITS OPERAND LIST. The previous regex
# categoriser matched anywhere in that text, so a conv fusion like
#   %fusion.452 = bf16[...] fusion(bf16[...] %copy.123, ...)
# was counted as "copy" because an OPERAND was named %copy.123 -- which
# inflated the data-movement share to ~52% and drove two rounds of
# copy-tail hunting. The truth (this parser, cross-checked by hand):
# conv-containing fusions are ~80% of the v5e step, raw data movement
# ~10%. Ops are now categorised by their OWN opcode, and fusion ops by
# the contents of their called computation, joined from the HLO module
# text that capture() saves alongside the trace (module.hlo.txt).

_ENTRY_OP_RE = re.compile(
    r'^\s*%?([\w.\-]+) = \(?[\w\[\],\s]*.*?\s([a-z\-]+)\(')
_CALLS_RE = re.compile(r'(?:calls|to_apply)=%?([\w.\-]+)')
_BODY_OP_RE = re.compile(
    r'= \(?\w+\[[^\]]*\]\{[^}]*\}\s*([a-z\-]+)\(')

_DATA_MOVEMENT = ('copy', 'transpose', 'convert', 'reshape', 'reverse',
                  'slice', 'pad', 'concatenate', 'dynamic-slice',
                  'dynamic-update-slice', 'bitcast-convert')
_STRUCTURAL = ('parameter', 'tuple', 'get-tuple-element', 'constant',
               'bitcast')


def parse_hlo_computations(text):
    """{computation name: body text} plus {entry op: (opcode, calls)}."""
    bodies, cur = {}, None
    for ln in text.splitlines():
        if ln.startswith('ENTRY'):
            cur = 'ENTRY'
            bodies[cur] = []
            continue
        if not ln.startswith((' ', '}')) and ln.rstrip().endswith('{'):
            m = re.match(r'%?([\w.\-]+)', ln)
            cur = m.group(1) if m else None
            if cur:
                bodies[cur] = []
            continue
        if cur is not None:
            if ln.startswith('}'):
                cur = None
            else:
                bodies[cur].append(ln)
    entry_ops = {}
    for ln in bodies.get('ENTRY', []):
        m = _ENTRY_OP_RE.match(ln)
        if not m:
            continue
        calls = _CALLS_RE.search(ln)
        entry_ops[m.group(1)] = (m.group(2),
                                 calls.group(1) if calls else None)
    return bodies, entry_ops


def classify_fusion_body(body_text):
    if 'convolution(' in body_text or ' dot(' in body_text:
        return 'convolution (+fused epilogue)'
    ops = [o for o in _BODY_OP_RE.findall(body_text)
           if o not in _STRUCTURAL]
    if ops and all(o in _DATA_MOVEMENT for o in ops):
        return 'relayout/convert fusion'
    if any(o == 'reduce' for o in ops):
        return 'reduce/norm fusion'
    return 'elementwise/opt fusion'


def categorize(name, entry_ops=None, bodies=None):
    """Category of one traced op, by its own opcode (NOT by operand
    names -- see the round-4 fix note above)."""
    m = re.match(r'%?([\w.\-]+) = ', name)
    opname = m.group(1) if m else name
    opcode, calls = (entry_ops or {}).get(opname, (None, None))
    if opcode is None:
        m2 = _ENTRY_OP_RE.match(name)
        opcode = m2.group(2) if m2 else None
        calls = None
        if opcode == 'fusion':
            return 'fusion (unattributed: no HLO join)'
    if opcode == 'fusion':
        body = '\n'.join((bodies or {}).get(calls, []))
        if not body:
            return 'fusion (unattributed: no HLO join)'
        return classify_fusion_body(body)
    if opcode in ('convolution', 'dot'):
        return 'convolution (+fused epilogue)'
    if opcode in ('copy', 'copy-start', 'copy-done', 'transpose',
                  'reverse', 'reshape'):
        return 'copy/transpose'
    if opcode in ('convert', 'bitcast-convert'):
        return 'convert'
    if opcode in ('all-reduce', 'reduce-scatter', 'all-gather',
                  'collective-permute'):
        return 'collective'
    if opcode in ('async-start', 'async-done'):
        return 'async-dma'
    return f'other ({opcode})'


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
    bodies, entry_ops = {}, {}
    hlo_path = os.path.join(outdir, 'module.hlo.txt')
    if os.path.exists(hlo_path):
        with open(hlo_path) as f:
            bodies, entry_ops = parse_hlo_computations(f.read())
    cats = collections.Counter()
    for name, ps in busiest.items():
        cats[categorize(name, entry_ops, bodies)] += ps
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
