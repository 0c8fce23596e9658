"""Shared differential scan-timing core for every benchmark harness.

Methodology (load-bearing, see BENCHMARKS.md): each measured arm is a
pair of jitted programs running S and L chained iterations of the op
inside one lax.scan dispatch. The reported per-iteration time is
(best_of_reps(L) - best_of_reps(S)) / (L - S), so any fixed
per-dispatch cost -- this environment's axon-relay round-trip is ~1 ms
and swamps sub-ms ops -- cancels exactly. Arms are interleaved within
each rep so slow drift (thermal, host load) hits all arms equally.

Rules every caller's scan body must follow (violations make timings
meaningless, both observed and documented in BENCHMARKS.md):
- the op's input must DEPEND on the scan carry, or XLA hoists the
  loop-invariant op out of the scan;
- the carry must consume ALL output elements (e.g. via a sum/mean) --
  a single-element read lets XLA narrow a conv to one output window;
- fetch the result to host (float()) to force the dependency chain;
  through the axon tunnel block_until_ready can return early.
"""

import time


def diff_time(arms, short, long_, reps=3, fetch=float, full=False):
    """Differential-time several arms, interleaved.

    arms: {name: (run_short, run_long)} of ZERO-ARG callables, each
      dispatching one jitted scan of the corresponding length and
      returning a fetchable scalar.
    Returns {name: seconds per iteration}.

    Each rep pairs its OWN short and long walls: independently
    minimized walls from different reps bias the differential low
    under host jitter and can go negative (the bench.py fix, ADVICE
    round 3, applied here round 4 after concurrent-host-load runs
    produced negative per-op times). The reported value is the
    smallest POSITIVE per-rep differential; if every rep is
    non-positive the measurement is meaningless (e.g. another process
    was timesharing the host) and a ValueError says so instead of
    returning garbage.

    full=True returns {name: [positive per-rep diffs]} instead, so the
    caller can report a variance bound alongside the estimate.
    """
    for run_s, run_l in arms.values():  # compile + warm every arm
        fetch(run_s())
        fetch(run_l())
    dts = {n: [] for n in arms}
    for _ in range(reps):
        for n, (run_s, run_l) in arms.items():
            t0 = time.perf_counter()
            fetch(run_s())
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(run_l())
            t_l = time.perf_counter() - t0
            dts[n].append((t_l - t_s) / (long_ - short))
    out = {}
    for n, vals in dts.items():
        pos = [v for v in vals if v > 0]
        if not pos:
            raise ValueError(
                f"arm {n!r}: all differential reps non-positive "
                f"({[round(v * 1e6, 1) for v in vals]} us) -- host "
                f"contention or the scan body got optimized away")
        out[n] = pos if full else min(pos)
    return out


def diff_time_one(run_of_length, short, long_, reps=3, fetch=float,
                  full=False):
    """Single-arm convenience: run_of_length(n) builds the jitted
    scan-of-n thunk; returns seconds per iteration."""
    arms = {'_': (run_of_length(short), run_of_length(long_))}
    return diff_time(arms, short, long_, reps, fetch, full)['_']
