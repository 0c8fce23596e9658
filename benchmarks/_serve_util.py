"""Shared plumbing for the serving benchmarks (serve_http_bench.py,
serve_soak.py): in-process HTTP server boot around a real engine, and
a current-RSS reader for leak detection."""

import threading


def boot_http(engine, mode='tiled', batch=0, batch_wait=0.01):
    """Start ``_http_loop`` in a daemon thread; returns
    (server, thread, base_url) once the server is accepting."""
    from patchgan_tpu.cli.serve import _http_loop

    ready = threading.Event()
    captured = {}

    def on_ready(server):
        captured['server'] = server
        ready.set()

    th = threading.Thread(
        target=_http_loop, args=(engine, mode, '127.0.0.1:0'),
        kwargs={'server_ready': on_ready, 'batch': batch,
                'batch_wait': batch_wait}, daemon=True)
    th.start()
    assert ready.wait(timeout=30), 'HTTP server never became ready'
    host, port = captured['server'].server_address
    return captured['server'], th, f'http://{host}:{port}'


def vm_rss_mib():
    """CURRENT resident set (VmRSS) in MiB -- not the monotonic peak:
    leak detection needs the steady-state level between identical load
    rounds; transient per-request buffers legitimately raise the peak
    without leaking."""
    with open('/proc/self/status') as f:
        for line in f:
            if line.startswith('VmRSS:'):
                return int(line.split()[1]) / 1024.0
    return float('nan')
