"""Reproducer for the XLA scoped-VMEM stack-pinning failure that blocks
the Pallas instance-norm backward kernel on TPU hardware
(ops/pallas/norm_act.py::_backward_pallas).

Compiles jax.grad of the custom-vjp'd fused norm+act at the first
failing UNet shape (batch-16 128px bf16 layer) with the Pallas backward
forced on, prints the jax/libtpu versions and either SUCCESS (bug fixed
upstream -- re-measure and consider enabling) or the exact compiler
error for the record. Optionally retries with an explicit
vmem_limit_bytes compiler param on the backward pallas_call
(--raise-limit) to test the documented mitigation.

KNOWN WORKAROUND (round 2): the scoped-VMEM budget is a libtpu flag --
``LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=17408`` makes this
reproducer print SUCCESS today (25600 for the full train step, which
pins two cotangents). SUCCESS under the DEFAULT budget is the signal
that the upstream stack-pinning itself is fixed. Full A/B numbers in
BENCHMARKS.md; the fused backward still loses end-to-end, so the
shipping default stays XLA.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ['PATCHGAN_PALLAS'] = 'on'

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--shape', default='16,128,128,64')
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(','))

    import patchgan_tpu.ops.pallas.norm_act as na

    print('jax', jax.__version__, 'backend', jax.default_backend())
    try:
        import libtpu
        print('libtpu', getattr(libtpu, '__version__', '?'))
    except Exception:
        pass

    # force the Pallas backward (the shipping path routes backward
    # through XLA on hardware, norm_act._backward)
    orig = na._backward

    def forced(g, x, eps, activation):
        return na._backward_pallas(g, x, eps, activation)

    na._backward = forced
    try:
        x = jnp.asarray(np.random.default_rng(0).normal(size=shape)
                        .astype(np.float32), jnp.dtype(args.dtype))

        def loss(x):
            return jnp.sum(
                na.instance_norm_act_pallas(x, 1e-5, 'tanh')
                .astype(jnp.float32))

        try:
            g = jax.jit(jax.grad(loss)).lower(x).compile()
            out = g(x)
            jax.block_until_ready(out)
            print('SUCCESS: pallas backward compiled and ran at', shape,
                  '-- re-measure and consider flipping the default')
        except Exception as e:
            msg = str(e)
            print('FAILED (expected while the XLA MSA bug stands):')
            i = msg.find('Ran out of memory')
            if i >= 0:
                print(msg[i:i + 1200])
            else:
                print(msg[:1200])
    finally:
        na._backward = orig


if __name__ == '__main__':
    main()
