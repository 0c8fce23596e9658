"""HTTP serving benchmark: latency and concurrent throughput.

Boots the real ``_http_loop`` in-process around a real engine (nf=64
generator, tiled mode -- the BENCHMARKS.md "HTTP serving latency"
setup), then measures POST /predict end to end (image bytes in -> PNG
mask out):

1. sequential latency, one client (median/p90 over --requests)
2. concurrent throughput, --clients parallel clients, batch OFF
   (requests serialize behind the dispatch lock)
3. concurrent throughput, --clients parallel clients, --batch N
   micro-batching (concurrent requests share one bucketed forward)

Usage:  timeout 580 python benchmarks/serve_http_bench.py
        [--size 256] [--clients 8] [--requests 24] [--batch 8]
Prints one JSON line per arm.
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


from _serve_util import boot_http  # noqa: E402


def post(base, payload, timeout=120):
    r = urllib.request.urlopen(urllib.request.Request(
        f'{base}/predict', data=payload, method='POST'), timeout=timeout)
    return r.read()


def run_arm(base, payload, n_requests, n_clients):
    """n_requests total, spread over n_clients threads; returns
    (throughput req/s, per-request latencies)."""
    lat = []
    lat_lock = threading.Lock()
    idx = iter(range(n_requests))
    idx_lock = threading.Lock()

    def client():
        while True:
            with idx_lock:
                try:
                    next(idx)
                except StopIteration:
                    return
            t0 = time.perf_counter()
            post(base, payload)
            with lat_lock:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client)
               for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    return n_requests / dt, sorted(lat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--nf', type=int, default=64)
    ap.add_argument('--clients', type=int, default=8)
    ap.add_argument('--requests', type=int, default=24)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--batch_wait_ms', type=float, default=10.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from patchgan_tpu.inference import InferenceEngine
    from patchgan_tpu.models import UNet

    dtype = (jnp.bfloat16 if jax.devices()[0].platform != 'cpu'
             else jnp.float32)
    gen = UNet(input_nc=3, output_nc=1, nf=args.nf, dtype=dtype)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 128, 3)))['params']
    engine = InferenceEngine(gen, params, size=args.size, overlap=0.9,
                             threshold=0.5)

    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(args.size, args.size, 3)) * 255) \
        .astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, quality=90, format='JPEG')
    payload = buf.getvalue()

    # warmup compiles OUTSIDE the timed arms -- exactly what
    # patchgan_serve does before /healthz goes ready (uint8 ingest:
    # the HTTP handler ships uint8, /255 runs on device)
    from patchgan_tpu.cli.serve import _warmup
    _warmup(engine, 'tiled', all_buckets=args.batch > 1)
    engine.predict_image(np.asarray(img, np.uint8))

    def report(name, batch):
        server, th, base = boot_http(
            engine, batch=batch, batch_wait=args.batch_wait_ms / 1e3)
        try:
            post(base, payload)  # per-server warm request
            clients = 1 if name == 'sequential' else args.clients
            rps, lat = run_arm(base, payload, args.requests, clients)
            # let trailing server-thread log lines flush: a do_POST
            # print racing this JSON once glued the two onto one line,
            # and line-filters downstream dropped the JSON
            time.sleep(0.5)
            print(json.dumps({
                'metric': f'http_{name}',
                'value': round(rps, 2),
                'unit': 'req/s',
                'median_ms': round(lat[len(lat) // 2] * 1e3, 1),
                'p90_ms': round(lat[int(len(lat) * 0.9)] * 1e3, 1),
                'clients': clients,
                'requests': args.requests,
                'batch': batch,
            }), flush=True)
        finally:
            server.shutdown()
            th.join(timeout=10)

    report('sequential', 0)
    report('concurrent_nobatch', 0)
    report('concurrent_batched', args.batch)


if __name__ == '__main__':
    main()
