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
    r'^\s*(?:ROOT )?%?([\w.\-]+) = \(?[\w\[\],\s]*.*?\s([a-z\-]+)\(')
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


_SHAPE_RE = re.compile(r'(bf16|f32|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]')
_DTYPE_BYTES = {'bf16': 2, 'f16': 2, 'f32': 4, 's32': 4, 'u32': 4,
                's8': 1, 'u8': 1, 'pred': 1}
_DEF_RE = re.compile(r'^\s*(?:ROOT )?%?([\w.\-]+) = \w+\[([\d,]*)\]')
_CONV_LINE_RE = re.compile(
    r'= \w+\[([\d,]*)\]\S* convolution\(%?([\w.\-]+), %?([\w.\-]+)\)')
_DIM_LABELS_RE = re.compile(r'dim_labels=[\w?]+_([\w?]+)->')


def _elems(dims):
    n = 1
    for d in dims.split(','):
        if d:
            n *= int(d)
    return n


def collect_shapes(lines):
    """{op name: dims-string} for every op defined in these lines."""
    out = {}
    for ln in lines:
        m = _DEF_RE.match(ln)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def conv_flops_in_body(body_lines, shapes):
    """Sum MXU FLOPs of every convolution in an HLO computation.

    Optimized-HLO operands are name-only, so the rhs (kernel) shape is
    resolved through ``shapes`` (the computation's own defs overlaid on
    the module-global map). For a conv with output O and rhs R whose
    dim_labels rhs spec places the output-feature dim at index i, the
    contraction size is prod(R)/R[i], so FLOPs = 2*prod(O)*prod(R)/R[i]
    (exact for feature_group_count=1; wgrad convs relabel dims but the
    identity holds for every labeling since O carries the rhs
    output-feature dim exactly once).
    """
    total = 0
    local = {**shapes, **collect_shapes(body_lines)}
    for ln in body_lines:
        m = _CONV_LINE_RE.search(ln)
        if not m:
            continue
        out, _, rhs_name = m.groups()
        rhs = local.get(rhs_name)
        dl = _DIM_LABELS_RE.search(ln)
        if rhs is None or dl is None or 'o' not in dl.group(1):
            continue
        rhs_dims = [int(d) for d in rhs.split(',') if d]
        contraction = 1
        for pos, d in zip(dl.group(1), rhs_dims):
            if pos != 'o':
                contraction *= d
        flops = 2 * _elems(out) * contraction
        # lhs-dilated convs (convT forward, stride-2 dgrad): 1-1/d^2 of
        # the taps hit inserted zeros and the TPU conv emitter skips
        # them (measured: the segregated-convT rewrite is NOT faster),
        # so the effective MXU work is flops / prod(lhs_dilate)
        ld = re.search(r'lhs_dilate=(\d+)x(\d+)', ln)
        if ld:
            flops //= int(ld.group(1)) * int(ld.group(2))
        total += flops
    return total


def op_bytes(full_text):
    """Approximate HBM bytes touched by one entry op: sum of all shape
    literals in its one-line HLO text (output + operands)."""
    return sum(_elems(dims) * _DTYPE_BYTES[dt]
               for dt, dims in _SHAPE_RE.findall(full_text))


def fusion_efficiency_table(busiest, entry_ops, bodies, shapes, steps,
                            top, peak_tflops=197.0, peak_gbps=819.0):
    """Per-conv-fusion ranking: time, FLOPs, bytes, MXU%, HBM%.

    The two utilisation columns say which roof each fusion sits under:
    a fusion at 80% HBM / 20% MXU is bandwidth-bound (fewer bytes is
    the only lever); one at low/low has a lowering problem worth
    attacking.
    """
    rows = []
    for name, ps in busiest.items():
        m = re.match(r'%?([\w.\-]+) = ', name)
        opname = m.group(1) if m else name
        opcode, calls = entry_ops.get(opname, (None, None))
        if opcode is None:
            m2 = _ENTRY_OP_RE.match(name)
            opcode = m2.group(2) if m2 else None
            c2 = _CALLS_RE.search(name)
            calls = c2.group(1) if c2 else None
        if opcode == 'fusion' and calls:
            body = bodies.get(calls, [])
        elif opcode == 'convolution':
            body = [name]
        else:
            continue
        flops = conv_flops_in_body(body, shapes)
        if not flops:
            continue
        sec = ps / 1e12 / steps
        byts = op_bytes(name)
        rows.append({
            'op': opname,
            'us': round(sec * 1e6, 1),
            'gflop': round(flops / 1e9, 2),
            'mbytes': round(byts / 1e6, 1),
            'mxu_pct': round(flops / sec / 1e12 / peak_tflops * 100, 1),
            'hbm_pct': round(byts / sec / 1e9 / peak_gbps * 100, 1),
        })
    rows.sort(key=lambda r: -r['us'])
    tot_us = sum(r['us'] for r in rows)
    tot_gf = sum(r['gflop'] for r in rows)
    print(json.dumps({'conv_fusions': len(rows),
                      'total_us_per_step': round(tot_us, 1),
                      'total_gflop': round(tot_gf, 1),
                      'avg_mxu_pct': round(
                          tot_gf / (tot_us / 1e6) / 1e3 / 197.0 * 100, 1)
                      if tot_us else None}))
    for r in rows[:top]:
        print(json.dumps(r))


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
    shapes = {}
    if os.path.exists(hlo_path):
        with open(hlo_path) as f:
            shapes = collect_shapes(f.read().splitlines())
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
    if bodies or entry_ops:
        fusion_efficiency_table(busiest, entry_ops, bodies, shapes,
                                steps, top)


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
