"""Worker for the REAL multi-controller input-pipeline test.

Launched by tests/test_multiprocess.py as 1 or 2 OS processes. Each
process joins a jax.distributed CPU cluster (gloo collectives, 4
virtual devices per process), builds the shared 8-device data mesh,
and drives ONE epoch of the actual DataLoader + jitted GAN train step:

- under 2 processes the loader auto-detects process_count=2 and takes
  its real per-host branch: each process decodes ONLY its
  process_local_range slice and the global batch is assembled with
  jax.make_array_from_process_local_data (data/loader.py
  _assemble_global) -- the exact code path a multi-host TPU deployment
  runs, which no single-process test can execute;
- under 1 process the same script is the ground-truth reference
  (legacy whole-batch path on the same 8-device mesh).

Writes {losses, decoded, process_count} to result_<pid>.json; the
parent asserts the 2-process losses equal the single-process run's and
that each host decoded exactly half the images.

Usage: python mp_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import re
import sys


def force_cpu_devices(n):
    flag_re = r'--xla_force_host_platform_device_count=(\d+)'
    flags = os.environ.get('XLA_FLAGS', '')
    if re.search(flag_re, flags):
        flags = re.sub(
            flag_re, f'--xla_force_host_platform_device_count={n}', flags)
    else:
        flags += f' --xla_force_host_platform_device_count={n}'
    os.environ['XLA_FLAGS'] = flags.strip()


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    n_total = 8
    force_cpu_devices(n_total // nproc)

    import jax
    jax.config.update('jax_platforms', 'cpu')
    if nproc > 1:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        jax.distributed.initialize(
            coordinator_address=f'127.0.0.1:{port}',
            num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == n_total

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from patchgan_tpu.data import DataLoader
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.parallel.mesh import default_mesh
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    class SeededRawDS:
        """Deterministic in-memory dataset; counts decode calls so the
        parent can assert each host decoded only its slice."""
        labels = [1]
        augmentation = 'randomcrop'  # no flips: decode is the variable

        def __init__(self, n=16, size=128):
            rng = np.random.default_rng(42)
            self.imgs = rng.uniform(size=(n, size, size, 3)) \
                .astype(np.float32)
            self.maps = (rng.uniform(size=(n, size, size)) > 0.5) \
                .astype(np.int32)
            self.decoded = 0

        def __len__(self):
            return len(self.imgs)

        def load_raw(self, i):
            self.decoded += 1
            return self.imgs[i], self.maps[i]

    mesh = default_mesh()
    ds = SeededRawDS()
    # global batch 8 = the full 'data' axis (it must divide the mesh's
    # batch-sharded device count; see DataLoader._batch_divisor)
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1,
                        mesh=mesh, seed=5)
    assert (loader.process_count or 1) == nproc

    gen = UNet(input_nc=3, output_nc=1, nf=2, final_act='sigmoid')
    disc = Discriminator(input_nc=4, ndf=2, n_layers=2)
    gen_tx, disc_tx = make_optimizer(1e-3), make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, 128, 128, 3), 1, gen_tx,
                             disc_tx, seed=0)
    from patchgan_tpu.parallel.mesh import replicate
    state = replicate(state, mesh)
    step = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx))

    losses = []
    for x, y in loader:
        state, ls = step(state, x, y)
        losses.append([float(ls['gen']), float(ls['disc'])])

    with open(os.path.join(outdir, f'result_{pid}.json'), 'w') as f:
        json.dump({'losses': losses, 'decoded': ds.decoded,
                   'process_count': nproc}, f)
    print(f'[{pid}] ok: {len(losses)} batches, decoded {ds.decoded}',
          flush=True)


if __name__ == '__main__':
    main()
