"""HTTP serving soak: sustained mixed-size load against the real
service.

Boots ``_http_loop`` around a real engine and drives --requests POSTs
from --clients threads with HETEROGENEOUS image sizes (cycling a size
list), which exercises the device-stitch program cache's LRU bound,
the micro-batcher's group isolation, and steady-state memory. Reports
per-round current RSS (leak vs fragmentation: see the comment at the
round loop), HTTP error count, and req/s; shuts down via shutdown().

Usage:  timeout 1100 python benchmarks/serve_soak.py
        [--requests 300] [--clients 8] [--batch 8]
Prints one JSON line.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


from _serve_util import boot_http, vm_rss_mib as rss_mib  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--requests', type=int, default=300,
                    help='requests per round')
    ap.add_argument('--rounds', type=int, default=4)
    ap.add_argument('--clients', type=int, default=8)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--nf', type=int, default=64)
    ap.add_argument('--sizes', default='256x256,320x250,256x384,200x200')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from patchgan_tpu.cli.serve import _warmup
    from patchgan_tpu.inference import InferenceEngine
    from patchgan_tpu.models import UNet

    dtype = (jnp.bfloat16 if jax.devices()[0].platform != 'cpu'
             else jnp.float32)
    gen = UNet(input_nc=3, output_nc=1, nf=args.nf, dtype=dtype)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 128, 3)))['params']
    engine = InferenceEngine(gen, params, size=256, overlap=0.9,
                             threshold=0.5)
    _warmup(engine, 'tiled')

    rng = np.random.default_rng(0)
    payloads = []
    for wh in args.sizes.split(','):
        w, h = map(int, wh.split('x'))
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, quality=90, format='JPEG')
        payloads.append(buf.getvalue())

    server, th, base = boot_http(engine, batch=args.batch)

    # warm every size class outside the soak, then baseline RSS
    for p in payloads:
        urllib.request.urlopen(urllib.request.Request(
            f'{base}/predict', data=p, method='POST'), timeout=600)

    errors = []

    def soak_round():
        done = [0]
        lock = threading.Lock()
        idx = iter(range(args.requests))

        def client():
            while True:
                with lock:
                    try:
                        i = next(idx)
                    except StopIteration:
                        return
                try:
                    r = urllib.request.urlopen(urllib.request.Request(
                        f'{base}/predict',
                        data=payloads[i % len(payloads)],
                        method='POST'), timeout=120)
                    r.read()
                    with lock:
                        done[0] += 1
                except Exception as e:
                    with lock:
                        errors.append(str(e))

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client)
                   for _ in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return done[0], time.perf_counter() - t0

    # identical rounds: round 1 settles allocator arenas/thread pools;
    # a LEAK grows linearly round over round, fragmentation plateaus
    # (the pure-CPU serving stack measures flat -- any growth here is
    # client-side state of the remote-TPU relay or glibc arenas)
    import gc
    ok = 0
    dt = 0.0
    rss_per_round = []
    for _ in range(args.rounds):
        o, d = soak_round()
        ok += o
        dt += d
        gc.collect()
        rss_per_round.append(round(rss_mib(), 1))

    server.shutdown()
    th.join(timeout=10)
    print(json.dumps({
        'metric': 'serve_soak',
        'value': round(ok / dt, 2),
        'unit': 'req/s',
        'requests_ok': ok,
        'errors': len(errors),
        'first_error': errors[0] if errors else None,
        'rss_per_round_mib': rss_per_round,
        'dev_programs_cached': len(engine._dev_programs),
        'seconds': round(dt, 1),
        'sizes': args.sizes,
        'batch': args.batch,
    }))


if __name__ == '__main__':
    main()
