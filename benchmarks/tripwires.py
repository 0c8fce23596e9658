"""One-command toolchain tripwire sweep (VERDICT round-4 item 6).

Runs every standing toolchain-bug reproducer and prints one PASS/FAIL
line each, so a jax/libtpu/axon bump re-checks all known bugs in one
go and the corresponding workarounds can be dropped the day upstream
fixes land. Conventions: each repro prints SUCCESS when the bug is
FIXED upstream; "FAILING" here therefore means "bug still present,
keep the shipped workaround" (the expected state on the current
toolchain), and "FIXED" means "go delete the listed gate".

    python benchmarks/tripwires.py            # all tripwires
    python benchmarks/tripwires.py shardy vmem  # a subset

The Pallas dispatch tables (benchmarks/fused_conv_table.py, +--convt)
are a separate, hour-long regeneration — re-run them on bumps too, but
they are a measurement, not a PASS/FAIL reproducer, so they are only
listed here as a reminder.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# name -> (script, args, 'success-marker' | callable(stdout)->bool,
#          action-when-fixed)
TRIPWIRES = {
    'shardy': (
        'repro_shardy_spatial.py', [],
        'SUCCESS',
        'drop the legacy-GSPMD fallback in parallel/spatial.py'),
    'vmem': (
        'repro_vmem_bug.py', [],
        'SUCCESS',
        'lift LIBTPU_INIT_ARGS scoped-vmem note; re-measure the Pallas '
        'norm backward (ops/pallas/norm_act.py)'),
    'tapdot_tiny': (
        'repro_tapdot_tiny.py', [],
        'SUCCESS',
        'drop _MIN_TAP_GRID gating in ops/tapdot.py'),
    'upload_leak': (
        'repro_axon_upload_leak.py', [],
        'SUCCESS',
        'uint8-ingest stays (it is also 4x less transfer), but long-'
        'training RSS recycling advice in CLAUDE.md can go'),
    'cache_layout': (
        'repro_cache_layout.py', [],
        'SUCCESS',
        'drop cache_bypass in utils/compilation_cache.py (and its use '
        'in train/auto_layout.py) and collapse bench.py to one stage'),
    'int8_mxu': (
        'int8_conv_probe.py', [],
        None,  # parses speedups from the JSON lines instead
        'revisit int8 quantized inference (ROADMAP: RESOLVED NEGATIVE '
        'round 2 because int8 convs ran at bf16 rates)'),
}


def _int8_fixed(stdout):
    """int8 path is 'fixed' when the MXU actually runs int8 convs
    meaningfully faster than bf16 (the probe prints one JSON per
    shape with a 'speedup' field; ~1.0 on the current toolchain)."""
    speedups = []
    for line in stdout.splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if 'speedup' in d:
            speedups.append(float(d['speedup']))
    return bool(speedups) and max(speedups) >= 1.5


def run_one(name, timeout):
    script, extra, marker, action = TRIPWIRES[name]
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, script), *extra],
            capture_output=True, text=True, timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return name, 'ERROR', f'timeout after {timeout}s', action
    dt = time.perf_counter() - t0
    text = out.stdout + out.stderr
    if marker is None:
        fixed = _int8_fixed(out.stdout)
    else:
        fixed = marker in text
    if fixed:
        return name, 'FIXED', f'{dt:.0f}s -- ACTION: {action}', action
    if out.returncode in (0, 1):
        return name, 'FAILING', f'{dt:.0f}s (bug present; workaround ' \
                                f'stays)', action
    # rc >= 2 is NOT the known-bug state: repro_cache_layout uses 2 for
    # "cold run already broken -- a DIFFERENT bug", argparse uses 2 for
    # usage errors -- surface those for investigation, never fold them
    # into "workaround stays"
    tail = text.strip().splitlines()[-1] if text.strip() else ''
    return name, 'ERROR', f'rc={out.returncode}: {tail[:120]}', action


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('names', nargs='*', default=[],
                    help=f"subset of {list(TRIPWIRES)}")
    ap.add_argument('--timeout', type=int,
                    default=int(os.environ.get('TRIPWIRE_TIMEOUT', 600)))
    args = ap.parse_args()
    names = args.names or list(TRIPWIRES)
    unknown = set(names) - set(TRIPWIRES)
    if unknown:
        ap.error(f"unknown tripwires {sorted(unknown)}")

    rows = []
    for name in names:
        print(f"running {name} ...", flush=True)
        rows.append(run_one(name, args.timeout))

    width = max(len(n) for n, *_ in rows)
    print()
    for name, status, detail, _ in rows:
        print(f"{name:<{width}}  {status:<8} {detail}")
    print(f"\n(reminder: also re-run benchmarks/fused_conv_table.py "
          f"[+--convt] after toolchain bumps -- regenerates the Pallas "
          f"dispatch tables, currently empty = XLA wins everywhere)")
    bad = [r for r in rows if r[1] == 'ERROR']
    return 2 if bad else 0


if __name__ == '__main__':
    sys.exit(main())
