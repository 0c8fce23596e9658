"""Reproducer: persistent-compilation-cache round-trips strip custom
output layouts (axon relay, jax 0.9.0 / v5e).

Found round 5 while enabling the persistent cache for bench.py
(VERDICT round-4 item 1). Any executable whose OUTPUTS carry a
non-default layout -- a relayouting ``jax.device_put(x, Format(...))``,
a ``jax.jit(..., out_shardings=Format(...))`` identity, or the AOT
``Format(Layout.AUTO)`` train step -- runs correctly when compiled
fresh, but once LOADED BACK from the persistent compilation cache its
outputs come back in the DEFAULT layout:

  * values stay numerically correct (no data corruption);
  * required INPUT layouts are preserved (the deserialized executable
    still rejects default-layout inputs where it chose swapped ones);
  * output format metadata and physical layout silently degrade to
    default.

Consequences for this package while the bug stands (all shipped):
  * train/auto_layout.py compiles every program it owns under
    ``cache_bypass`` (utils/compilation_cache.py; persistent cache
    truly disabled for the duration via reset_cache) and
    verifies output formats after the first call, healing to the plain
    step with a warning;
  * bench.py measures a cache-safe plain stage before the fresh-
    compiled AUTO stage, so its graded number survives slow compiles.

Run on every jax/libtpu/axon bump (or via benchmarks/tripwires.py):
prints SUCCESS when the cache round-trip preserves output layouts --
then drop ``cache_bypass`` (utils/compilation_cache.py) and
collapse bench.py back to one stage.
"""

import os
import shutil
import subprocess
import sys
import tempfile

_CHILD = r"""
import sys
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', sys.argv[1])
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
from jax.experimental.layout import Format, Layout

x = jnp.zeros((4, 4, 256, 256), jnp.float32)
want = (0, 1, 3, 2)  # the IO-swapped conv-kernel layout AUTO picks
dp = jax.device_put(x, Format(Layout(want), x.sharding))
print('GOT', dp.format.layout.major_to_minor == want)
"""


def main():
    cache = tempfile.mkdtemp(prefix='cache_layout_repro_')
    try:
        runs = []
        for label in ('cold', 'warm'):
            out = subprocess.run(
                [sys.executable, '-c', _CHILD, cache],
                capture_output=True, text=True, timeout=300,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            ok = 'GOT True' in out.stdout
            runs.append(ok)
            print(f"{label}: layout "
                  f"{'preserved' if ok else 'STRIPPED'}")
            if label == 'cold' and not ok:
                print("cold run already broken -- different bug, "
                      "not this reproducer's scenario")
                return 2
        if runs[1]:
            print("SUCCESS: cache round-trip preserves custom output "
                  "layouts -- drop utils/compilation_cache.py's cache_bypass "
                  "and bench.py's two-stage split")
            return 0
        print("FAILING (expected on this toolchain): cache-loaded "
              "executable lost its output layout")
        return 1
    finally:
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == '__main__':
    sys.exit(main())
