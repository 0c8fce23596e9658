"""Reproducer: strided-slice + dot_general tap-reduction miscompiles
(and can crash the TPU worker) at tiny tap grids on v5e.

The pattern is the transpose-free conv weight gradient
(patchgan_tpu/ops/wgrad.py): for each kernel tap, a strided
``lax.slice`` of the padded activation is contracted against the
cotangent over (N, Ho, Wo) with ``lax.dot_general``. Observed on the
round-3 toolchain (jax 0.6.x / current libtpu, TPU v5e):

- tap grid 8x8 and larger (batch 16): bit-exact vs the conv-lowered
  weight gradient;
- tap grid 2x2 (16x4x4x512->512 conv, s=2): silently WRONG result,
  max relerr ~6 vs the fp32 CPU reference;
- the same 16x4x4x512->512 case with other data: hard TPU worker
  crash ("TPU worker process crashed or restarted") — which can wedge
  the axon tunnel for several minutes afterwards. Run this standalone,
  never inside a shared session you care about.

Because of this, ops/wgrad.py gates the tap-dot path to grids
>= _MIN_TAP_GRID (8) per side. Re-run this after every jax/libtpu
bump; it prints SUCCESS when the default toolchain executes the tiny
grids correctly, at which point the gate can drop to cover all layers
(the tiny layers' transposes are cheap, so the win is hygiene, not
speed).
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def tap_dot(x, dy, k, s, p):
    n, _, _, ci = x.shape
    _, ho, wo, co = dy.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    taps = []
    for kh in range(k):
        for kw in range(k):
            xt = lax.slice(
                xp, (0, kh, kw, 0),
                (n, kh + s * (ho - 1) + 1, kw + s * (wo - 1) + 1, ci),
                (1, s, s, 1))
            taps.append(lax.dot_general(
                xt, dy, (((0, 1, 2), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(k, k, ci, co)


if __name__ == '__main__':
    rng = np.random.default_rng(1)
    k, s, p = 4, 2, 1
    ok = True
    for n, h, ci, co in ((16, 8, 512, 512), (16, 4, 512, 512),
                         (16, 2, 512, 512)):
        ho = (h + 2 * p - k) // s + 1
        x = jnp.asarray(rng.normal(size=(n, h, h, ci)), jnp.bfloat16)
        dy = jnp.asarray(rng.normal(size=(n, ho, ho, co)), jnp.bfloat16)
        fn = jax.jit(functools.partial(tap_dot, k=k, s=s, p=p))
        with jax.default_device(jax.devices('cpu')[0]):
            ref = np.asarray(fn(jnp.asarray(np.asarray(x, np.float32)),
                                jnp.asarray(np.asarray(dy, np.float32))))
        try:
            got = np.asarray(fn(x, dy))
            relerr = float(np.abs(got - ref).max() /
                           (np.abs(ref).max() + 1e-6))
            case_ok = relerr < 3e-2
        except Exception as e:  # worker crash surfaces as RuntimeError
            relerr, case_ok = None, False
            print(json.dumps({'case': f'{n}x{h}x{h}x{ci}->{co}',
                              'error': str(e)[:120]}))
        ok &= case_ok
        print(json.dumps({'case': f'{n}x{h}x{h}x{ci}->{co}',
                          'tap_grid': ho, 'relerr': relerr,
                          'ok': case_ok}), flush=True)
    print('SUCCESS: tiny-grid tap-dot correct — drop _MIN_TAP_GRID'
          if ok else
          'still broken: keep the _MIN_TAP_GRID gate in ops/wgrad.py')
