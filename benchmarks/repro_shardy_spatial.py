"""Reproducer: Shardy partitioner miscompiles conv backward at
over-sharded tiny spatial dims (silent wrong gradients).

A stride-2 conv ladder 32 -> 16 -> 8 -> 4 -> 2 followed by the mirror
transposed-conv ladder, input height sharded 4-way over a 'spatial'
mesh axis, parameters replicated. Under the legacy GSPMD partitioner
(`jax.config.update('jax_use_shardy_partitioner', False)`) the
spatially-sharded gradients match the single-device run to ~1e-6;
under Shardy (the jax 0.9.0 default) the weight gradients of the
H=2-intermediate layers are wrong by O(1) RELATIVE error while the
forward stays exact -- i.e. silently corrupted training. Depths whose
smallest intermediate is 4, or 1, are fine; exactly H=2 over a 4-way
axis breaks (observed on the CPU backend, jax 0.9.0).

parallel/spatial.py therefore forces the legacy partitioner when a
spatial mesh with sp > 1 is built. Run this each toolchain bump; when
it prints SUCCESS, Shardy is fixed and the fallback can be dropped.
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# force 8 virtual CPU devices: APPEND/REPLACE in XLA_FLAGS (setdefault
# would be a no-op whenever XLA_FLAGS is already set)
_flag_re = r'--xla_force_host_platform_device_count=(\d+)'
_flags = os.environ.get('XLA_FLAGS', '')
_m = re.search(_flag_re, _flags)
if _m is None:
    _flags += ' --xla_force_host_platform_device_count=8'
elif int(_m.group(1)) < 8:
    _flags = re.sub(_flag_re,
                    '--xla_force_host_platform_device_count=8', _flags)
os.environ['XLA_FLAGS'] = _flags.strip()

import jax  # noqa: E402

# run on CPU with 8 virtual devices regardless of accelerator presence
# (the partitioner is backend-independent); MUST happen before the first
# backend initialisation -- this environment pins JAX_PLATFORMS
# externally and only the config update overrides it
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import (Mesh, NamedSharding,  # noqa: E402
                          PartitionSpec as P)

DIMS = ('NHWC', 'HWIO', 'NHWC')
DEPTH = 4   # smallest intermediate H = 32 >> 4 = 2: the failing case
H0 = 32


def conv(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                    dimension_numbers=DIMS)


def convt(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), [(2, 2), (2, 2)],
                                    lhs_dilation=(2, 2),
                                    dimension_numbers=DIMS)


def main():
    print('jax', jax.__version__, 'backend', jax.default_backend(),
          'shardy', jax.config.jax_use_shardy_partitioner)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ('data', 'spatial'))
    rng = np.random.default_rng(0)
    ws = [rng.normal(size=(4, 4, 8, 8)).astype(np.float32) * 0.2
          for _ in range(2 * DEPTH)]
    x = rng.normal(size=(8, H0, H0, 8)).astype(np.float32)

    def net(x, ws):
        for i in range(DEPTH):
            x = jnp.tanh(conv(x, ws[i]))
        for i in range(DEPTH):
            x = jnp.tanh(convt(x, ws[DEPTH + i]))
        return jnp.sum(x ** 2)

    g = jax.jit(jax.grad(net, argnums=1))
    g1 = g(jnp.asarray(x), [jnp.asarray(w) for w in ws])
    xs = jax.device_put(x, NamedSharding(mesh, P('data', 'spatial')))
    wr = [jax.device_put(w, NamedSharding(mesh, P())) for w in ws]
    g2 = g(xs, wr)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) /
        max(float(np.max(np.abs(np.asarray(a)))), 1e-9)
        for a, b in zip(g1, g2))
    print(f'worst relative weight-gradient diff: {worst:.3e}')
    if worst < 1e-4:
        print('SUCCESS: spatially-sharded gradients match -- the '
              'partitioner is fixed; consider dropping the legacy-GSPMD '
              'fallback in parallel/spatial.py')
    else:
        print('FAILED (expected under Shardy, jax 0.9.0): '
              'spatially-sharded conv gradients are silently wrong at '
              'over-sharded tiny dims')


if __name__ == '__main__':
    main()
