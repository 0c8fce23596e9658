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


def diff_time(arms, short, long_, reps=3, fetch=float):
    """Differential-time several arms, interleaved.

    arms: {name: (run_short, run_long)} of ZERO-ARG callables, each
      dispatching one jitted scan of the corresponding length and
      returning a fetchable scalar.
    Returns {name: seconds per iteration}.
    """
    for run_s, run_l in arms.values():  # compile + warm every arm
        fetch(run_s())
        fetch(run_l())
    best = {n: [float('inf'), float('inf')] for n in arms}
    for _ in range(reps):
        for n, (run_s, run_l) in arms.items():
            t0 = time.perf_counter()
            fetch(run_s())
            best[n][0] = min(best[n][0], time.perf_counter() - t0)
            t0 = time.perf_counter()
            fetch(run_l())
            best[n][1] = min(best[n][1], time.perf_counter() - t0)
    return {n: (bl - bs) / (long_ - short)
            for n, (bs, bl) in best.items()}


def diff_time_one(run_of_length, short, long_, reps=3, fetch=float):
    """Single-arm convenience: run_of_length(n) builds the jitted
    scan-of-n thunk; returns seconds per iteration."""
    arms = {'_': (run_of_length(short), run_of_length(long_))}
    return diff_time(arms, short, long_, reps, fetch)['_']
