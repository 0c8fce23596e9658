"""``patchgan_serve`` console entry point (extension).

A long-running inference service the reference has no analog for
(its infer CLI, /root/reference/patchgan/infer.py:71-174, is a one-shot
batch job): the generator is loaded ONCE, the tiled/spatial forward is
compiled ONCE -- at STARTUP via a warmup forward, so the first request
pays no jit-compile stall -- decode runs in look-ahead threads that
overlap the device forward, the watch/stdin loops keep one dispatched
image in flight so the mask fetch + PNG save of image i-1 also overlap
image i's device pipeline (engine.predict_image_async),
a corrupt input is logged and skipped
(remembered by mtime; one bad file never crashes the service), and
``--batch N`` groups images through one device dispatch in all three
modes. The process serves images either by

- watching a directory (``--watch DIR``): new images are picked up each
  poll, masks written next to ``serve_params.output_path``, already-
  processed images (an output PNG exists) are skipped, so the service
  is restart-safe and idempotent; or
- a line protocol on stdin (``--stdin``): one input path per line,
  the written mask path echoed on stdout per line ("ERROR <msg>" on
  failure) -- composable with any external queue/orchestrator; or
- an HTTP endpoint (``--http HOST:PORT``): ``POST /predict`` with the
  image bytes (jpeg/png) returns the PNG mask (the save_mask
  encoding); ``GET /healthz`` returns 200 once the warmup forward has
  compiled -- a load balancer can gate traffic on readiness. With
  ``--batch N`` concurrent requests are micro-batched: a dispatcher
  thread gathers requests arriving within ``--batch-wait-ms`` of each
  other and pushes all their tiles through ONE bucketed forward
  (``_MicroBatcher``), so N concurrent small-image requests cost one
  snug device program instead of N mostly-padding ones.

Config: the infer-CLI schema (flat or nested ``model_params``,
``checkpoint_paths.generator``), plus ``infer_params`` (size via
``dataset.size``, ``output_path``, ``threshold``, ``overlap``,
``mode: tiled|spatial``).
"""

import argparse
import os
import sys
import time


IMAGE_EXTS = ('.jpg', '.jpeg', '.png')


def _build_engine(config, dtype):
    import jax
    import jax.numpy as jnp

    from ..inference import InferenceEngine
    from ..models import UNet
    from ..parallel.mesh import default_mesh
    from ..utils import checkpoint as ckpt
    from ..utils.config import model_params
    from ..utils.transfer import load_transfer_data, unet_key_map

    dataset_params = config.get('dataset', {})
    size = dataset_params.get('size', 256)
    in_channels = dataset_params.get('in_channels', 3)
    labels = dataset_params.get('labels')
    out_channels = len(labels) if labels else \
        dataset_params.get('out_channels', 1)

    gen_cfg, _ = model_params(config)
    generator = UNet(input_nc=in_channels, output_nc=out_channels,
                     nf=gen_cfg['filters'],
                     activation=gen_cfg['activation'],
                     final_act=gen_cfg['final_activation'], dtype=dtype)
    # ONE jitted init program: eager flax init pays ~130 per-op
    # compile/dispatch round trips (~80 s on a remote-TPU relay vs
    # seconds jitted, cached across process starts; train/steps.py
    # init_train_state has the same treatment)
    g_params = jax.jit(lambda k: generator.init(
        k, jnp.zeros((1, 128, 128, in_channels))))(
            jax.random.PRNGKey(0))['params']
    gen_sd = ckpt.load_state_dict(config['checkpoint_paths']['generator'])
    g_params, count = load_transfer_data(
        jax.device_get(g_params), gen_sd, unet_key_map(), verbose=False)
    if count < len(unet_key_map()):
        raise ValueError(
            f"Generator checkpoint mismatch: {count}/"
            f"{len(unet_key_map())} weights loaded")

    infer_params = config.get('infer_params', {})
    engine = InferenceEngine(
        generator, g_params, size=size,
        overlap=infer_params.get('overlap', 0.9),
        threshold=infer_params.get('threshold', 0),
        batch_size=infer_params.get('batch_size', 128),
        mesh=default_mesh())
    mode = infer_params.get('mode', 'tiled')
    output_path = infer_params.get('output_path', 'predictions/')
    os.makedirs(output_path, exist_ok=True)
    return engine, mode, output_path


def _decode(path):
    # uint8 out: the engine normalises /255 ON DEVICE (1-ulp-exact),
    # uploads ship 4x fewer bytes through a remote-TPU relay, and the
    # relay's upload leak (repro_axon_upload_leak.py) shrinks 4x for a
    # long-running service
    from ..data import native
    if path.lower().endswith(('.jpg', '.jpeg')):
        return native.decode_jpeg_rgb_u8(path, None)
    import numpy as np
    from PIL import Image
    return np.asarray(Image.open(path).convert('RGB'), np.uint8)


def _save(mask, output_path, path):
    from ..data.coco import COCOStuffDataset
    fname = os.path.splitext(os.path.basename(path))[0]
    COCOStuffDataset.save_mask(mask, output_path, fname)
    return os.path.join(output_path, f'{fname}.png')


def _dispatch_one(engine, mode, path, image=None):
    """Dispatch one image's forward; returns a handle whose
    ``.result()`` is the stitched mask. In tiled mode the engine's async
    path dispatches the whole on-device pipeline and returns before the
    mask fetch, so the serve loops can overlap the device forward of
    image i with the fetch + PNG save of image i-1 (the infer CLI's
    pipelining pattern, cli/infer.py)."""
    if image is None:
        image = _decode(path)
    if mode == 'tiled' and hasattr(engine, 'predict_image_async'):
        return engine.predict_image_async(image)
    from ..inference.engine import _ReadyMask
    return _ReadyMask(engine.predict_image(image, mode=mode))


def _warmup(engine, mode, all_buckets=False):
    """Compile the forward(s) BEFORE the first request so request #1
    pays milliseconds, not the multi-second jit compile.

    On the on-device-stitch path (single-device default) requests run
    through ``predict_image_async``'s quantized per-image-size-class
    programs; warm the square ``size``-px class (the most common --
    other size classes compile on first sight, one per quantized
    canvas). On the host-stitch path (multi-device meshes) requests run
    through the bucketed tile forward instead; ``all_buckets`` (HTTP
    micro-batching) then compiles EVERY candidate bucket up front,
    since grouped requests produce varied tile counts and the bucket
    cost model would otherwise trigger a minutes-long remote compile on
    the first request that lands in an unseen bucket."""
    import numpy as np
    t0 = time.perf_counter()
    c = engine.generator.input_nc
    if mode == 'spatial':
        engine.predict_image(
            np.zeros((engine.size, engine.size, c), np.uint8),
            mode='spatial')
    else:
        # uint8 zeros: the serve decode paths ship uint8 (engine
        # normalises on device), so warm THAT program signature
        engine.predict_image(
            np.zeros((engine.size, engine.size, c), np.uint8))
        if not getattr(engine, '_device_stitch', False):
            if all_buckets:
                from ..inference.engine import _BUCKET_REL_RATE
                buckets = sorted(b for b in _BUCKET_REL_RATE
                                 if b <= engine.batch_size)
            else:
                # small-image bucket + the full bucket large images use
                buckets = [1, engine.batch_size]
            for b in buckets:
                engine.predict_tiles(np.zeros(
                    (b, engine.size, engine.size, c), np.uint8))
    print(f"warmup: {mode} forward compiled in "
          f"{time.perf_counter() - t0:.1f} s", flush=True)


def _decode_ahead(pool, paths, lookahead=4):
    """Yield (path, image_or_exception) with a bounded decode window
    running ahead of the consumer (the infer CLI's look-ahead pattern,
    cli/infer.py)."""
    from collections import deque

    def safe(p):
        return _decode(p)

    pending = deque()
    it = iter(paths)
    try:
        while len(pending) < lookahead:
            p = next(it)
            pending.append((p, pool.submit(safe, p)))
    except StopIteration:
        it = iter(())
    while pending:
        path, fut = pending.popleft()
        for p in it:
            pending.append((p, pool.submit(safe, p)))
            break
        try:
            yield path, fut.result()
        except Exception as e:
            yield path, e


def _watch_loop(engine, mode, output_path, watch_dir, poll, once,
                batch=0, workers=2):
    """Poll ``watch_dir``; decode ahead of the device; serve each new
    image (or, with ``batch`` > 1, groups of images through one bucketed
    forward). A file that fails (corrupt/truncated image) is logged,
    remembered by mtime, and skipped until it changes -- one bad file
    must never crash or wedge the long-running service."""
    from concurrent.futures import ThreadPoolExecutor

    served = 0
    failed = {}  # path -> mtime at failure; retried if rewritten
    prev = None  # in-flight (path, mask handle, dispatch t0)

    def fail(path, e):
        try:
            failed[path] = os.path.getmtime(path)
        except OSError:
            pass
        print(f"ERROR {path}: {e}", flush=True)

    def resolve_prev():
        nonlocal served, prev
        if prev is None:
            return
        path, handle, t0 = prev
        prev = None
        try:
            out = _save(handle.result(), output_path, path)
            served += 1
            print(f"{out}  "
                  f"({(time.perf_counter() - t0) * 1e3:.0f} ms)",
                  flush=True)
        except Exception as e:
            fail(path, e)

    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        while True:
            todo = []
            for name in sorted(os.listdir(watch_dir)):
                if not name.lower().endswith(IMAGE_EXTS):
                    continue
                out = os.path.join(
                    output_path, os.path.splitext(name)[0] + '.png')
                path = os.path.join(watch_dir, name)
                if os.path.exists(out):
                    continue
                try:
                    mtime = os.path.getmtime(path)
                except OSError:
                    continue  # raced with deletion
                if failed.get(path) == mtime:
                    continue
                todo.append(path)

            group, group_imgs = [], []

            def flush_group():
                # one failing image (fetch or PNG save) must fail ONLY
                # itself: the group is consumed up front (no re-dispatch
                # of already-saved members on error) and every member
                # resolves inside its own try. flush_group itself never
                # raises -- the loop's "one bad file never crashes the
                # service" contract covers the batched path too.
                from ..inference.engine import _ReadyMask
                nonlocal served
                if not group:
                    return
                paths, imgs = list(group), list(group_imgs)
                group.clear()
                group_imgs.clear()
                t0 = time.perf_counter()
                try:
                    # dispatch the whole group before fetching anything;
                    # saves then overlap the remaining masks' fetches
                    if hasattr(engine, 'predict_images_async'):
                        handles = engine.predict_images_async(imgs)
                    else:
                        handles = [_ReadyMask(m) for m in
                                   engine.predict_images(imgs)]
                except Exception as e:
                    for p in paths:
                        fail(p, e)
                    return
                results = []
                for p, h in zip(paths, handles):
                    try:
                        results.append((p, _save(h.result(),
                                                 output_path, p)))
                        served += 1
                    except Exception as e:
                        fail(p, e)
                dt = (time.perf_counter() - t0) * 1e3 / len(paths)
                for p, out in results:
                    print(f"{out}  ({dt:.0f} ms/img, "
                          f"batch {len(paths)})", flush=True)

            for path, image in _decode_ahead(pool, todo):
                try:
                    if isinstance(image, Exception):
                        raise image
                    if batch > 1 and mode != 'spatial':
                        group.append(path)
                        group_imgs.append(image)
                        if len(group) >= batch:
                            flush_group()
                        continue
                    t0 = time.perf_counter()
                    handle = _dispatch_one(engine, mode, path,
                                           image=image)
                except Exception as e:
                    resolve_prev()
                    fail(path, e)
                    continue
                # image i is now dispatched: fetch+save image i-1 while
                # the device runs (one handle in flight keeps memory
                # flat and results in input order)
                resolve_prev()
                prev = (path, handle, t0)
            resolve_prev()
            flush_group()
            if once:
                print(f"served {served} images", flush=True)
                return served
            time.sleep(poll)


def _stdin_loop(engine, mode, output_path, workers=2, batch=0):
    """One input path per line; the mask path (or "ERROR <msg>") echoed
    per line, in INPUT ORDER. Decode runs ahead of the device: a feeder
    thread reads stdin into a queue and the decode pool works on queued
    paths while the current forward runs. With ``batch`` > 1 up to that
    many decoded lines dispatch as ONE group
    (``engine.predict_images_async``) while the previous group's masks
    fetch+save -- a piped backlog gets watch-mode batching under the
    line protocol's ordering and per-line fault isolation; interactive
    single lines are still answered immediately (a group only forms
    from lines already decoded, never by waiting)."""
    import queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from collections import deque

    paths_q = queue.Queue(maxsize=64)
    DONE = object()

    def feeder():
        for line in sys.stdin:
            paths_q.put(line.strip())
        paths_q.put(DONE)

    threading.Thread(target=feeder, daemon=True).start()

    done = False
    pending = deque()
    group_max = max(1, batch) if mode != 'spatial' else 1
    prev = None  # dispatched group: ordered ('err', exc) |
    #              ('ok', (path, handle)) entries

    def resolve_prev():
        nonlocal prev
        if prev is None:
            return
        entries, prev = prev, None
        for kind, payload in entries:
            if kind == 'err':
                print(f"ERROR {payload}", flush=True)
                continue
            path, handle = payload
            try:
                print(_save(handle.result(), output_path, path),
                      flush=True)
            except Exception as e:
                print(f"ERROR {e}", flush=True)

    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        while True:
            # top up the decode window; block ONLY when nothing at all
            # is in flight (an interactive single line is answered
            # immediately; a piped backlog decodes ahead of the device)
            window = max(2 * max(1, workers), group_max)
            while not done and len(pending) < window:
                try:
                    p = paths_q.get(block=not pending and prev is None)
                except queue.Empty:
                    break
                if p is DONE:
                    done = True
                elif p:
                    pending.append((p, pool.submit(_decode, p)))
            if not pending:
                # no further input queued: echo the in-flight results
                # now rather than hold them until the next line arrives
                resolve_prev()
                if done:
                    return
                continue
            # consume up to group_max decoded lines, keeping each
            # line's slot (a decode failure stays an ERROR at ITS
            # position in the output order)
            entries = []
            while pending and len(entries) < group_max:
                path, fut = pending.popleft()
                try:
                    entries.append(('ok', (path, fut.result())))
                except Exception as e:
                    entries.append(('err', e))
            ok = [pay for kind, pay in entries if kind == 'ok']
            try:
                if len(ok) > 1 and \
                        hasattr(engine, 'predict_images_async'):
                    handles = engine.predict_images_async(
                        [im for _, im in ok])
                else:
                    handles = [_dispatch_one(engine, mode, p, image=im)
                               for p, im in ok]
            except Exception as e:  # dispatch failed: fail this group
                resolve_prev()
                for kind, pay in entries:
                    print(f"ERROR {pay if kind == 'err' else e}",
                          flush=True)
                continue
            handle_it = iter(handles)
            dispatched = [
                (kind, pay if kind == 'err'
                 else (pay[0], next(handle_it)))
                for kind, pay in entries]
            # fetch+save of group i-1 overlaps group i's device forward
            resolve_prev()
            prev = dispatched


def _encode_mask_png(mask):
    """PNG-encode a stitched prediction with COCOStuffDataset.save_mask's
    exact uint8 scaling (data/coco.py:126-136), to bytes."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.asarray(mask)
    if arr.dtype in (np.float32, np.float64):
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8) \
            if arr.max() <= 1.0 else arr.astype(np.uint8)
    else:
        arr = arr.astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, 'PNG')
    return buf.getvalue()


class _MicroBatcher:
    """Cross-request dynamic batching for the HTTP front-end.

    Request threads call :meth:`predict` and block; ONE dispatcher
    thread drains the queue, gathers up to ``max_batch`` images that
    arrive within ``max_wait`` seconds of the first, and DISPATCHES the
    whole group through the engine (``predict_images_async`` when
    available: on-device-stitch programs back-to-back on a single
    device; one bucket-filling tile-concat forward on multi-device
    host-stitch meshes). The per-image handles go back to the request
    threads, which resolve (mask fetch + PNG encode) CONCURRENTLY while
    the dispatcher forms the next group -- resolving inside the
    dispatcher serialized the fetches and measured 2.4x slower through
    the TPU relay (BENCHMARKS.md #24). While a group computes, new
    arrivals queue up and form the next group, so the effective batch
    grows with load and the wait window only costs latency when the
    service is otherwise idle. A failed group fails only its own
    requests (each gets the exception); the dispatcher thread never
    dies."""

    _CLOSE = object()

    def __init__(self, engine, mode, max_batch, max_wait):
        import queue
        import threading

        self._engine = engine
        self._mode = mode
        self._max_batch = max(1, int(max_batch))
        self._max_wait = max(0.0, float(max_wait))
        self._q = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def predict(self, image):
        """Blocking: returns the stitched mask (or raises)."""
        import threading

        if self._closed:
            raise RuntimeError('batcher is closed')
        item = {'image': image, 'done': threading.Event()}
        self._q.put(item)
        item['done'].wait()
        if 'error' in item:
            raise item['error']
        if 'handle' in item:
            # resolve here, in the request thread: fetches of a group
            # run concurrently instead of serializing the dispatcher
            return item['handle'].result()
        return item['mask']

    def close(self):
        # the flag turns away NEW predict() calls; items that slipped
        # past the check before the sentinel are failed by _run's final
        # drain, so no caller is ever left blocking on a dead thread.
        # (_http_loop closes the batcher only AFTER server_close() has
        # joined all in-flight request handlers.)
        self._closed = True
        self._q.put(self._CLOSE)
        self._thread.join(timeout=10)

    def _drain_and_fail(self):
        import queue

        while True:
            try:
                it = self._q.get_nowait()
            except queue.Empty:
                return
            if it is self._CLOSE:
                continue
            it['error'] = RuntimeError('batcher is closed')
            it['done'].set()

    def _run(self):
        import queue
        import time as _time

        while True:
            first = self._q.get()
            if first is self._CLOSE:
                self._drain_and_fail()
                return
            group = [first]
            deadline = _time.monotonic() + self._max_wait
            closing = False
            while len(group) < self._max_batch:
                left = deadline - _time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is self._CLOSE:
                    closing = True
                    break
                group.append(nxt)
            try:
                if self._mode != 'spatial' and \
                        hasattr(self._engine, 'predict_images_async'):
                    handles = self._engine.predict_images_async(
                        [it['image'] for it in group])
                    for it, h in zip(group, handles):
                        it['handle'] = h
                elif len(group) > 1 and self._mode != 'spatial' and \
                        hasattr(self._engine, 'predict_images'):
                    masks = self._engine.predict_images(
                        [it['image'] for it in group])
                    for it, m in zip(group, masks):
                        it['mask'] = m
                else:
                    for it in group:
                        it['mask'] = self._engine.predict_image(
                            it['image'], mode=self._mode)
            except Exception as e:  # fail the group, keep serving
                for it in group:
                    it['error'] = e
            finally:
                for it in group:
                    it['done'].set()
            if closing:
                self._drain_and_fail()
                return


def _http_loop(engine, mode, addr, server_ready=None, batch=0,
               batch_wait=0.01):
    """Blocking HTTP front-end: POST /predict (image bytes in, PNG mask
    bytes out), GET /healthz. Decode/PNG-encode run per request thread.
    Without batching the device pipeline is serialized with a lock that
    covers only the DISPATCH (``_dispatch_one``); the mask fetch and
    PNG encode of request i run outside it, overlapping request i+1's
    device forward. With ``batch`` > 1 concurrent requests are
    micro-batched through one bucketed forward (:class:`_MicroBatcher`).
    A bad request (undecodable image) answers 400 and never takes the
    service down."""
    import io
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np
    from PIL import Image

    forward_lock = threading.Lock()
    batcher = (_MicroBatcher(engine, mode, batch, batch_wait)
               if batch > 1 and mode != 'spatial' else None)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *_):
            pass  # one line per request below instead of stderr noise

        def _reply(self, code, body, ctype='text/plain'):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/healthz':
                self._reply(200, b'ok')
            else:
                self._reply(404, b'not found')

        def do_POST(self):
            if self.path != '/predict':
                self._reply(404, b'not found')
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                # uint8 through to the device: /255 runs on device
                image = np.asarray(
                    Image.open(io.BytesIO(self.rfile.read(n)))
                    .convert('RGB'), np.uint8)
            except Exception as e:
                self._reply(400, f'bad image: {e}'.encode())
                return
            try:
                t0 = time.perf_counter()
                if batcher is not None:
                    mask = batcher.predict(image)
                else:
                    # lock covers only the dispatch: the fetch (inside
                    # .result()) and the PNG encode of this request
                    # overlap the next request's device forward
                    with forward_lock:
                        handle = _dispatch_one(engine, mode, None,
                                               image=image)
                    mask = handle.result()
                png = _encode_mask_png(mask)
                self._reply(200, png, ctype='image/png')
                print(f"POST /predict {image.shape[1]}x{image.shape[0]}"
                      f" -> {len(png)} B "
                      f"({(time.perf_counter() - t0) * 1e3:.0f} ms)",
                      flush=True)
            except Exception as e:  # never take the service down
                self._reply(500, f'inference failed: {e}'.encode())
                print(f"ERROR /predict: {e}", flush=True)

    host, _, port = addr.rpartition(':')
    server = ThreadingHTTPServer((host or '127.0.0.1', int(port)),
                                 Handler)
    # NON-daemon handler threads: ThreadingHTTPServer defaults to
    # daemon_threads=True, under which server_close() does NOT join
    # in-flight handlers and process exit kills them mid-forward/
    # mid-fetch -- the exact hazard the SIGTERM drain exists to avoid.
    # With non-daemon handlers, server_close() below joins every
    # in-flight request BEFORE the batcher closes and the process
    # exits, so the drain actually drains.
    server.daemon_threads = False
    if threading.current_thread() is threading.main_thread():
        # graceful drain on SIGTERM (the orchestrator/k8s stop signal):
        # stop accepting, finish in-flight requests, exit 0 -- a hard
        # kill mid-forward can wedge a remote-TPU tunnel for minutes.
        # Installed BEFORE the readiness print: anything reacting to
        # that line (tests, supervisors) may signal immediately.
        import signal

        def _drain(signum, frame):
            print('SIGTERM: draining in-flight requests', flush=True)
            threading.Thread(target=server.shutdown,
                             daemon=True).start()

        signal.signal(signal.SIGTERM, _drain)
    print(f"HTTP serving on http://{server.server_address[0]}:"
          f"{server.server_address[1]} (POST /predict, GET /healthz)",
          flush=True)
    if server_ready is not None:
        server_ready(server)
    try:
        server.serve_forever()
    finally:
        server.server_close()
        if batcher is not None:
            batcher.close()


def patchgan_serve(argv=None):
    parser = argparse.ArgumentParser(
        prog='PatchGAN',
        description='Long-running PatchGAN inference service')
    parser.add_argument('-c', '--config_file', required=True, type=str)
    parser.add_argument('--watch', default=None,
                        help='Directory to watch for new images')
    parser.add_argument('--stdin', action='store_true',
                        help='Serve paths read line-by-line from stdin')
    parser.add_argument('--http', default=None, metavar='HOST:PORT',
                        help='Serve an HTTP endpoint: POST /predict '
                             '(image bytes -> PNG mask), GET /healthz')
    parser.add_argument('--poll', default=2.0, type=float,
                        help='Watch-mode poll interval (seconds)')
    parser.add_argument('--once', action='store_true',
                        help='Watch mode: process the backlog and exit')
    parser.add_argument('--batch', default=0, type=int,
                        help='Group up to N images through one device '
                             'dispatch (tiled mode): watch-mode '
                             'backlog, stdin piped lines, or '
                             'concurrent HTTP requests (micro-batch)')
    parser.add_argument('--batch-wait-ms', default=10.0, type=float,
                        help='HTTP micro-batching: how long the first '
                             'request of a group waits for company '
                             'before dispatching (costs latency only '
                             'when the service is idle)')
    parser.add_argument('--workers', default=2, type=int,
                        help='Decode look-ahead threads')
    parser.add_argument('--no-warmup', action='store_true',
                        help='Skip the compile-at-startup warmup forward')
    parser.add_argument('-d', '--device', default='auto')
    parser.add_argument('--dtype', default='auto',
                        choices=['auto', 'float32', 'bfloat16'])
    args = parser.parse_args(argv)

    if sum(map(bool, (args.watch, args.stdin, args.http))) != 1:
        parser.error(
            'exactly one of --watch / --stdin / --http is required')

    from .common import compute_dtype, select_device
    from ..utils.config import load_config

    platform = select_device(args.device)
    dtype = compute_dtype(args.dtype, platform)
    config = load_config(args.config_file)
    engine, mode, output_path = _build_engine(config, dtype)
    if not args.no_warmup:
        _warmup(engine, mode,
                all_buckets=bool(args.http) and args.batch > 1)
    print(f"Serving with {platform} ({mode} mode) -> {output_path}",
          flush=True)

    if args.http:
        _http_loop(engine, mode, args.http, batch=args.batch,
                   batch_wait=args.batch_wait_ms / 1e3)
    elif args.stdin:
        _stdin_loop(engine, mode, output_path, workers=args.workers,
                    batch=args.batch)
    else:
        return _watch_loop(engine, mode, output_path, args.watch,
                           args.poll, args.once, batch=args.batch,
                           workers=args.workers)


if __name__ == '__main__':
    patchgan_serve()
