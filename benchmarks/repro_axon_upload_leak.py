"""Standing reproducer: host->device uploads leak client RSS on the
axon relay.

Every jitted call whose argument is a HOST array leaks approximately
the argument's byte size (plus ~2.4 KiB/call fixed) in client-process
RSS; device-resident arguments leak nothing, and device->host fetches
are clean. Isolated 2026-08-19 from a serving soak that grew exactly
+1.0 MiB per request (= the padded f32 input size, linear over 1200
requests); a pure-CPU run of the identical serving stack is flat, so
the leak is in the relay client's transfer path, not this framework.

Framework-side mitigation (shipped): inference ingests uint8 and
normalises /255 on device -- 4x fewer uploaded bytes per image, and a
perf win in its own right. The training loader already transfers
uint8 batches, so a long patchgan_train run leaks ~bytes-of-batches;
recycle the process on multi-day runs until this is fixed upstream.

Run on every jax/libtpu/axon bump:
    timeout 580 python benchmarks/repro_axon_upload_leak.py
Prints SUCCESS when the leak is gone (drop the note in CLAUDE.md and,
if desired, the uint8-ingest rationale comments; the uint8 path itself
should stay -- it is bandwidth-optimal regardless).
"""

import gc
import sys


def rss_kib():
    with open('/proc/self/status') as f:
        for line in f:
            if line.startswith('VmRSS:'):
                return int(line.split()[1])
    raise RuntimeError('no VmRSS')


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print('platform:', jax.devices()[0].platform,
          jax.devices()[0].device_kind)
    f = jax.jit(lambda x: (x * 2.0).sum(axis=-1).astype(jnp.uint8))
    x = np.zeros((384, 256, 3), np.float32)   # 1.125 MiB
    np.asarray(f(x))                          # compile
    gc.collect()

    n = 100
    base = rss_kib()
    for _ in range(n):
        np.asarray(f(x))
    gc.collect()
    grown = rss_kib() - base
    per_call_kib = grown / n
    arg_kib = x.nbytes / 1024.0
    print(f'{n} host-arg dispatches of {arg_kib:.0f} KiB: '
          f'+{grown / 1024.0:.1f} MiB ({per_call_kib:.0f} KiB/call)')

    # control: device-resident argument must not leak
    xd = jax.device_put(x)
    gc.collect()
    base = rss_kib()
    for _ in range(n):
        np.asarray(f(xd))
    gc.collect()
    ctrl_kib = (rss_kib() - base) / n
    print(f'device-resident control: {ctrl_kib:.0f} KiB/call')

    # leak = per-call growth on the order of the argument size; call
    # it fixed when under 5% of the argument
    if per_call_kib < 0.05 * arg_kib:
        print('SUCCESS: upload leak is gone on this toolchain')
        return 0
    print(f'LEAK STANDS: ~{per_call_kib / arg_kib:.2f}x of every '
          f'uploaded byte is retained in client RSS')
    return 1


if __name__ == '__main__':
    sys.exit(main())
