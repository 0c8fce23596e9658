"""End-to-end CLI tests: patchgan_train on a synthetic COCO-style
directory (both YAML schemas), resume, then patchgan_infer producing
mask files (SURVEY.md §4 integration plan)."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

from patchgan_tpu.cli.infer import patchgan_infer
from patchgan_tpu.cli.train import patchgan_train

pytestmark = pytest.mark.slow

SIZE = 128


@pytest.fixture
def coco_tree(tmp_path):
    for split in ('train', 'val'):
        (tmp_path / split / 'images').mkdir(parents=True)
        (tmp_path / split / 'masks').mkdir(parents=True)
        rng = np.random.default_rng(0)
        n = 8 if split == 'train' else 4
        for i in range(n):
            img = (rng.uniform(size=(SIZE, SIZE, 3)) * 255) \
                .astype(np.uint8)
            Image.fromarray(img).save(
                tmp_path / split / 'images' / f'{i:012d}.jpg')
            mask = rng.integers(0, 2, size=(SIZE, SIZE)).astype(np.uint8)
            Image.fromarray(mask, mode='L').save(
                tmp_path / split / 'masks' / f'{i:012d}.png')
    return tmp_path


def nested_config(tmp_path):
    return {
        'dataset': {
            'type': 'COCOStuff',
            'size': SIZE,
            'augmentation': 'randomcrop+flip',
            'labels': [1, 2],
            'train_data': {
                'images': str(tmp_path / 'train' / 'images'),
                'masks': str(tmp_path / 'train' / 'masks'),
            },
            'validation_data': {
                'images': str(tmp_path / 'val' / 'images'),
                'masks': str(tmp_path / 'val' / 'masks'),
            },
        },
        'model_params': {
            'generator': {'filters': 4, 'activation': 'relu',
                          'use_dropout': True,
                          'final_activation': 'softmax'},
            'discriminator': {'filters': 4, 'n_layers': 2},
        },
        'checkpoint_path': str(tmp_path / 'checkpoints'),
        'train_params': {
            'loss_type': 'tversky',
            'seg_alpha': 200,
            'gen_learning_rate': 1.e-3,
            'disc_learning_rate': 1.e-3,
            'decay_rate': 0.95,
            'save_freq': 1,
        },
    }


def flat_config(tmp_path):
    # the shipped-example layout: flat model_params, top-level data dirs
    # (quirk Q1 -- crashes the reference parser, accepted here)
    cfg = {
        'dataset': {
            'type': 'COCOStuff',
            'size': SIZE,
            'augmentation': 'randomcrop',
            'labels': [1, 2],
        },
        'train_data': {
            'images': str(tmp_path / 'train' / 'images'),
            'masks': str(tmp_path / 'train' / 'masks'),
        },
        'validation_data': {
            'images': str(tmp_path / 'val' / 'images'),
            'masks': str(tmp_path / 'val' / 'masks'),
        },
        'model_params': {
            'gen_filts': 4, 'disc_filts': 4, 'activation': 'relu',
            'use_dropout': True, 'final_activation': 'sigmoid',
            'n_disc_layers': 2,
        },
        'checkpoint_path': str(tmp_path / 'checkpoints_flat'),
        'train_params': {
            'loss_type': 'weighted_bce',
            'seg_alpha': 1,
            'gen_learning_rate': 1.e-3,
            'disc_learning_rate': 1.e-3,
            'save_freq': 1,
        },
    }
    return cfg


def write_config(tmp_path, cfg, name='config.yaml'):
    path = tmp_path / name
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def test_train_cli_nested_schema_and_resume(coco_tree, capsys):
    cfg = nested_config(coco_tree)
    cfg_path = write_config(coco_tree, cfg)
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                    '--dataloader_workers', '2', '--dtype', 'float32'])
    ckpt_dir = cfg['checkpoint_path']
    assert os.path.exists(os.path.join(ckpt_dir, 'generator_ep_001.npz'))
    assert os.path.exists(os.path.join(ckpt_dir,
                                       'discriminator_ep_001.npz'))

    # resume: run one more epoch from the saved checkpoint
    cfg['load_last_checkpoint'] = True
    cfg_path = write_config(coco_tree, cfg, 'config2.yaml')
    patchgan_train(['-c', cfg_path, '-n', '2', '-b', '4',
                    '--dtype', 'float32'])
    assert os.path.exists(os.path.join(ckpt_dir, 'generator_ep_002.npz'))
    out = capsys.readouterr().out
    assert 'Epoch 2' in out
    assert 'Epoch 1' not in out.split('Loaded checkpoints')[-1]


def test_train_cli_flat_schema(coco_tree):
    cfg = flat_config(coco_tree)
    cfg_path = write_config(coco_tree, cfg, 'flat.yaml')
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                    '--dtype', 'float32'])
    assert os.path.exists(os.path.join(cfg['checkpoint_path'],
                                       'generator_ep_001.npz'))


def test_train_cli_train_val_split(coco_tree):
    cfg = nested_config(coco_tree)
    del cfg['dataset']['train_data']
    del cfg['dataset']['validation_data']
    cfg['dataset']['data'] = {
        'images': str(coco_tree / 'train' / 'images'),
        'masks': str(coco_tree / 'train' / 'masks'),
    }
    cfg['dataset']['train_val_split'] = [0.75, 0.25]
    cfg['train_params']['save_freq'] = 10  # no checkpoint this run
    cfg_path = write_config(coco_tree, cfg, 'split.yaml')
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '2',
                    '--dtype', 'float32'])


def test_infer_cli_end_to_end(coco_tree):
    # train one epoch to create a checkpoint
    cfg = nested_config(coco_tree)
    cfg_path = write_config(coco_tree, cfg)
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                    '--dtype', 'float32'])

    infer_cfg = {
        'dataset': {
            'type': 'COCOStuff',
            'size': SIZE,
            'labels': [1, 2],
            'dataset_path': str(coco_tree / 'val' / 'images'),
        },
        'model_params': {
            'gen_filts': 4, 'disc_filts': 4, 'activation': 'relu',
            'final_activation': 'softmax', 'n_disc_layers': 2,
        },
        'checkpoint_paths': {
            'generator': os.path.join(cfg['checkpoint_path'],
                                      'generator_ep_001.npz'),
            'discriminator': os.path.join(cfg['checkpoint_path'],
                                          'discriminator_ep_001.npz'),
        },
        'infer_params': {
            'output_path': str(coco_tree / 'predictions'),
            'threshold': 0,
            'overlap': 0.9,
        },
    }
    infer_path = write_config(coco_tree, infer_cfg, 'infer.yaml')
    patchgan_infer(['-c', infer_path, '--dtype', 'float32'])

    preds = sorted(os.listdir(coco_tree / 'predictions'))
    assert len(preds) == 4
    arr = np.asarray(Image.open(coco_tree / 'predictions' / preds[0]))
    assert arr.shape == (SIZE, SIZE)


def test_eval_cli(coco_tree, capsys):
    from patchgan_tpu.cli.evaluate import patchgan_eval

    cfg = nested_config(coco_tree)
    cfg_path = write_config(coco_tree, cfg)
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                    '--dtype', 'float32'])

    eval_cfg = {
        'dataset': {
            'type': 'COCOStuff', 'size': SIZE, 'labels': [1, 2],
            'validation_data': {
                'images': str(coco_tree / 'val' / 'images'),
                'masks': str(coco_tree / 'val' / 'masks'),
            },
        },
        'model_params': cfg['model_params'],
        'checkpoint_paths': {
            'generator': os.path.join(cfg['checkpoint_path'],
                                      'generator_ep_001.npz'),
        },
    }
    eval_path = write_config(coco_tree, eval_cfg, 'eval.yaml')
    capsys.readouterr()
    result = patchgan_eval(['-c', eval_path, '-b', '4',
                            '--dtype', 'float32'])
    assert result['n_images'] == 4
    assert 0.0 <= result['value'] <= 1.0
    out = capsys.readouterr().out
    assert '"metric": "mean_iou"' in out

    # extended metrics flag: dice + boundary F1 alongside iou
    result = patchgan_eval(['-c', eval_path, '-b', '4',
                            '--dtype', 'float32',
                            '--metrics', 'dice,bf1'])
    assert 0.0 <= result['mean_dice'] <= 1.0
    assert 0.0 <= result['mean_boundary_f1'] <= 1.0
    assert 0.0 <= result['value'] <= 1.0  # iou always present


def test_train_cli_spatial_parallelism(coco_tree):
    """train_params.spatial_parallelism shards image height over the
    mesh through the whole CLI path (loader sharding + Trainer)."""
    import jax
    shardy_before = jax.config.jax_use_shardy_partitioner
    try:
        cfg = nested_config(coco_tree)
        cfg['train_params']['spatial_parallelism'] = 4
        cfg['checkpoint_path'] = str(coco_tree / 'ckpt_sp')
        cfg_path = write_config(coco_tree, cfg, 'sp.yaml')
        patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                        '--dtype', 'float32'])
        assert os.path.exists(
            os.path.join(cfg['checkpoint_path'], 'generator_ep_001.npz'))
    finally:
        jax.config.update('jax_use_shardy_partitioner', shardy_before)


def test_serve_cli_watch_once_and_idempotent(coco_tree, capsys):
    """patchgan_serve --watch --once: serves the backlog, skips
    already-served images on the next pass (restart-safe)."""
    from patchgan_tpu.cli.serve import patchgan_serve

    cfg = nested_config(coco_tree)
    cfg_path = write_config(coco_tree, cfg)
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                    '--dtype', 'float32'])

    serve_cfg = {
        'dataset': {'type': 'COCOStuff', 'size': SIZE, 'labels': [1, 2]},
        'model_params': cfg['model_params'],
        'checkpoint_paths': {
            'generator': os.path.join(cfg['checkpoint_path'],
                                      'generator_ep_001.npz'),
        },
        'infer_params': {
            'output_path': str(coco_tree / 'served'),
            'threshold': 0.5, 'overlap': 0.9,
        },
    }
    serve_path = write_config(coco_tree, serve_cfg, 'serve.yaml')
    n = patchgan_serve(['-c', serve_path, '--once', '--dtype', 'float32',
                        '--no-warmup',
                        '--watch', str(coco_tree / 'val' / 'images')])
    assert n == 4
    masks = sorted(os.listdir(coco_tree / 'served'))
    assert len(masks) == 4
    arr = np.asarray(Image.open(coco_tree / 'served' / masks[0]))
    assert arr.shape == (SIZE, SIZE)

    capsys.readouterr()
    n = patchgan_serve(['-c', serve_path, '--once', '--dtype', 'float32',
                        '--no-warmup',
                        '--watch', str(coco_tree / 'val' / 'images')])
    assert n == 0  # idempotent: everything already served


def test_serve_cli_batch_warmup_and_corrupt_file(coco_tree, capsys):
    """Round-3 serve hardening: startup warmup compiles before the
    first request, --batch groups the backlog through one bucketed
    forward, and a corrupt image is logged + skipped instead of
    crashing the service (ADVICE r2)."""
    import shutil

    from patchgan_tpu.cli.serve import patchgan_serve

    cfg = nested_config(coco_tree)
    cfg_path = write_config(coco_tree, cfg)
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                    '--dtype', 'float32', '--no-summary'])

    watch_dir = coco_tree / 'watch'
    watch_dir.mkdir()
    for f in sorted(os.listdir(coco_tree / 'val' / 'images'))[:3]:
        shutil.copy(coco_tree / 'val' / 'images' / f, watch_dir / f)
    # a corrupt "jpeg" in the middle of the backlog
    (watch_dir / '00000000000a.jpg').write_bytes(b'not a jpeg')

    serve_cfg = {
        'dataset': {'type': 'COCOStuff', 'size': SIZE, 'labels': [1, 2]},
        'model_params': cfg['model_params'],
        'checkpoint_paths': {
            'generator': os.path.join(cfg['checkpoint_path'],
                                      'generator_ep_001.npz'),
        },
        'infer_params': {
            'output_path': str(coco_tree / 'served_b'),
            'threshold': 0.5, 'overlap': 0.9,
        },
    }
    serve_path = write_config(coco_tree, serve_cfg, 'serve_b.yaml')
    n = patchgan_serve(['-c', serve_path, '--once', '--dtype', 'float32',
                        '--watch', str(watch_dir), '--batch', '4'])
    out = capsys.readouterr().out
    assert 'warmup:' in out
    assert 'ERROR' in out and '00000000000a' in out
    assert n == 3  # the three good images, despite the corrupt one
    assert 'batch 3' in out  # grouped through one bucketed forward
    assert len(os.listdir(coco_tree / 'served_b')) == 3


def test_serve_http_endpoint():
    """patchgan_serve --http: POST /predict returns the PNG mask with
    the save_mask encoding, GET /healthz answers ok, a bad body gets
    400 (and never takes the server down). Uses a duck-typed engine --
    the HTTP layer only calls predict_image."""
    import io
    import threading
    import urllib.request
    import urllib.error

    from patchgan_tpu.cli.serve import _http_loop

    class DummyEngine:
        def predict_image(self, image, mode='tiled'):
            return image[..., 0]  # float32 [0,1] -> uint8*255 PNG

    ready = threading.Event()
    captured = {}

    def on_ready(server):
        captured['server'] = server
        ready.set()

    th = threading.Thread(
        target=_http_loop,
        args=(DummyEngine(), 'tiled', '127.0.0.1:0'),
        kwargs={'server_ready': on_ready}, daemon=True)
    th.start()
    assert ready.wait(timeout=10)
    host, port = captured['server'].server_address
    base = f'http://{host}:{port}'
    try:
        assert urllib.request.urlopen(
            f'{base}/healthz', timeout=10).read() == b'ok'

        rng = np.random.default_rng(0)
        img = (rng.uniform(size=(40, 50, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, 'PNG')
        resp = urllib.request.urlopen(urllib.request.Request(
            f'{base}/predict', data=buf.getvalue(), method='POST'),
            timeout=30)
        assert resp.headers['Content-Type'] == 'image/png'
        mask = np.asarray(Image.open(io.BytesIO(resp.read())))
        assert mask.shape == (40, 50)
        np.testing.assert_array_equal(
            mask, np.clip(img[..., 0].astype(np.float32) / 255.0 * 255,
                          0, 255).astype(np.uint8))

        try:
            urllib.request.urlopen(urllib.request.Request(
                f'{base}/predict', data=b'not an image',
                method='POST'), timeout=10)
            raise AssertionError('expected HTTP 400')
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # still alive after the bad request
        assert urllib.request.urlopen(
            f'{base}/healthz', timeout=10).read() == b'ok'
    finally:
        captured['server'].shutdown()
        th.join(timeout=10)


def test_serve_http_sigterm_drains(coco_tree):
    """patchgan_serve --http exits 0 on SIGTERM after draining
    in-flight requests (the orchestrator stop signal; a hard kill
    mid-forward can wedge a remote-TPU tunnel)."""
    import signal
    import subprocess
    import sys
    import time as _time

    cfg = nested_config(coco_tree)
    cfg_path = write_config(coco_tree, cfg)
    patchgan_train(['-c', cfg_path, '-n', '1', '-b', '4',
                    '--dtype', 'float32'])
    serve_cfg = {
        'dataset': {'type': 'COCOStuff', 'size': SIZE, 'labels': [1, 2]},
        'model_params': cfg['model_params'],
        'checkpoint_paths': {
            'generator': os.path.join(cfg['checkpoint_path'],
                                      'generator_ep_001.npz'),
        },
        'infer_params': {'output_path': str(coco_tree / 'served')},
    }
    serve_path = write_config(coco_tree, serve_cfg, 'serve_http.yaml')
    proc = subprocess.Popen(
        [sys.executable, '-m', 'patchgan_tpu.cli.serve',
         '-c', serve_path, '--http', '127.0.0.1:0', '--no-warmup',
         '-d', 'cpu', '--dtype', 'float32'],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        import threading

        # readiness watch in a thread: a bare `for line in stdout`
        # blocks forever if the server wedges during init (the deadline
        # would only be checked when a line actually arrives)
        ready = threading.Event()

        def watch():
            for line in proc.stdout:
                if 'HTTP serving on' in line:
                    ready.set()
                    return

        watcher = threading.Thread(target=watch, daemon=True)
        watcher.start()
        assert ready.wait(timeout=120), 'server never came up'
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        assert proc.wait(timeout=30) == 0
        assert 'draining in-flight requests' in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_serve_stdin_loop_batched(coco_tree, tmp_path, monkeypatch,
                                  capsys):
    """--stdin --batch N: decoded lines dispatch as groups through
    predict_images_async, echoes stay in INPUT ORDER, and a mid-stream
    bad path is an ERROR at its own position."""
    import io as _io

    from patchgan_tpu.cli.serve import _stdin_loop

    class Handle:
        def __init__(self, mask):
            self._mask = mask

        def result(self):
            return self._mask

    group_sizes = []

    class DummyEngine:
        def predict_images_async(self, images):
            group_sizes.append(len(images))
            return [Handle(im[..., 0]) for im in images]

        def predict_image_async(self, image):
            group_sizes.append(1)
            return Handle(image[..., 0])

    imgs = sorted(str(p) for p in
                  (coco_tree / 'val' / 'images').iterdir())[:4]
    lines = [imgs[0], imgs[1], str(tmp_path / 'missing.jpg'),
             imgs[2], imgs[3]]
    monkeypatch.setattr('sys.stdin',
                        _io.StringIO('\n'.join(lines) + '\n'))
    out_dir = tmp_path / 'stdin_batched'
    out_dir.mkdir()
    _stdin_loop(DummyEngine(), 'tiled', str(out_dir), workers=2,
                batch=3)

    out_lines = capsys.readouterr().out.strip().splitlines()
    assert len(out_lines) == 5
    stem = [os.path.splitext(os.path.basename(p))[0] for p in lines]
    for i in (0, 1, 3, 4):
        assert out_lines[i].endswith(f'{stem[i]}.png')
        assert os.path.exists(out_dir / f'{stem[i]}.png')
    assert out_lines[2].startswith('ERROR')
    # every line went through the engine; at least one real group
    # formed from the piped backlog
    assert sum(group_sizes) == 4
    assert max(group_sizes) >= 2


def test_micro_batcher_groups_and_isolates_failures():
    """_MicroBatcher: concurrent submissions within the wait window go
    through ONE predict_images call, each caller gets ITS OWN mask, a
    failing group raises in every member, and the dispatcher survives
    to serve the next request."""
    import threading

    from patchgan_tpu.cli.serve import _MicroBatcher

    calls = []

    class Engine:
        def predict_images(self, images):
            calls.append(len(images))
            if any(im.shape[0] == 13 for im in images):
                raise RuntimeError('poison image')
            return [im[..., 0] * 2.0 for im in images]

        def predict_image(self, image, mode='tiled'):
            calls.append(1)
            if image.shape[0] == 13:
                raise RuntimeError('poison image')
            return image[..., 0] * 2.0

    batcher = _MicroBatcher(Engine(), 'tiled', max_batch=8,
                            max_wait=2.0)
    try:
        imgs = [np.full((4, 4, 3), i, np.float32) for i in range(3)]
        results = [None] * 3

        def post(i):
            results[i] = batcher.predict(imgs[i])

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        # one grouped call of all three; results map to THEIR images
        assert calls == [3]
        for i in range(3):
            np.testing.assert_allclose(results[i], imgs[i][..., 0] * 2.0)

        # a poisoned group raises in each member...
        errs = []

        def post_bad():
            try:
                batcher.predict(np.zeros((13, 4, 3), np.float32))
            except RuntimeError as e:
                errs.append(e)

        t = threading.Thread(target=post_bad)
        t.start()
        t.join(timeout=30)
        assert len(errs) == 1
        # ...and the dispatcher is still alive afterwards
        out = batcher.predict(imgs[0])
        np.testing.assert_allclose(out, imgs[0][..., 0] * 2.0)
    finally:
        batcher.close()


def test_micro_batcher_prefers_async_handles():
    """With predict_images_async available the batcher hands each
    request ITS handle and the request thread resolves it (fetches run
    concurrently, BENCHMARKS.md #24); a handle whose result() raises
    fails only its own request."""
    import threading

    from patchgan_tpu.cli.serve import _MicroBatcher

    class Handle:
        def __init__(self, fn):
            self._fn = fn

        def result(self):
            return self._fn()

    class Engine:
        def predict_images_async(self, images):
            def make(im):
                if im.shape[0] == 13:
                    return Handle(lambda: (_ for _ in ()).throw(
                        RuntimeError('bad fetch')))
                return Handle(lambda: im[..., 0] + 1.0)
            return [make(im) for im in images]

    batcher = _MicroBatcher(Engine(), 'tiled', max_batch=4,
                            max_wait=2.0)
    try:
        good = np.zeros((4, 4, 3), np.float32)
        bad = np.zeros((13, 4, 3), np.float32)
        results, errs = {}, {}

        def post(key, img):
            try:
                results[key] = batcher.predict(img)
            except RuntimeError as e:
                errs[key] = e

        threads = [threading.Thread(target=post, args=kv)
                   for kv in [('a', good), ('b', bad), ('c', good)]]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert set(results) == {'a', 'c'} and set(errs) == {'b'}
        np.testing.assert_allclose(results['a'], good[..., 0] + 1.0)
    finally:
        batcher.close()


def test_micro_batcher_close_rejects_and_drains():
    """After close(): new predict() calls raise immediately (never
    hang on a dead dispatcher), and items that were already queued
    behind the close sentinel are failed, not orphaned."""
    import queue
    import threading

    from patchgan_tpu.cli.serve import _MicroBatcher

    class StallEngine:
        def __init__(self):
            self.go = threading.Event()

        def predict_images_async(self, images):
            self.go.wait()  # dispatcher stalls inside the group

            class H:
                def __init__(self, im):
                    self._im = im

                def result(self):
                    return self._im[..., 0]
            return [H(im) for im in images]

    eng = StallEngine()
    batcher = _MicroBatcher(eng, 'tiled', max_batch=1, max_wait=0.0)
    img = np.zeros((4, 4, 3), np.float32)
    results = []
    t = threading.Thread(
        target=lambda: results.append(batcher.predict(img)))
    t.start()
    # while the dispatcher is stalled inside the first group, queue
    # the close sentinel AND an item behind it: the final drain must
    # fail that item, never leave it blocking forever
    for _ in range(100):
        if not eng.go.is_set() and batcher._q.empty() \
                and t.is_alive():
            break
        threading.Event().wait(0.01)
    batcher._closed = True
    batcher._q.put(batcher._CLOSE)
    orphan = {'image': img, 'done': threading.Event()}
    batcher._q.put(orphan)
    eng.go.set()
    t.join(timeout=10)
    batcher._thread.join(timeout=10)
    np.testing.assert_allclose(results[0], img[..., 0])
    assert orphan['done'].wait(timeout=10)
    assert isinstance(orphan.get('error'), RuntimeError)
    try:
        batcher.predict(img)
        raise AssertionError('expected RuntimeError after close')
    except RuntimeError:
        pass
    assert isinstance(batcher._q, queue.Queue)  # still inspectable


def test_serve_http_micro_batching():
    """--http --batch N: concurrent POSTs are micro-batched through
    predict_images and each response carries its own request's mask."""
    import io
    import threading
    import urllib.request

    from patchgan_tpu.cli.serve import _http_loop

    grouped = []

    class Engine:
        def predict_images(self, images):
            grouped.append(len(images))
            return [im[..., 0] for im in images]

        def predict_image(self, image, mode='tiled'):
            grouped.append(1)
            return image[..., 0]

    ready = threading.Event()
    captured = {}

    def on_ready(server):
        captured['server'] = server
        ready.set()

    th = threading.Thread(
        target=_http_loop,
        args=(Engine(), 'tiled', '127.0.0.1:0'),
        kwargs={'server_ready': on_ready, 'batch': 4,
                'batch_wait': 2.0}, daemon=True)
    th.start()
    assert ready.wait(timeout=10)
    host, port = captured['server'].server_address
    base = f'http://{host}:{port}'
    try:
        rng = np.random.default_rng(3)
        imgs = [(rng.uniform(size=(24, 30, 3)) * 255).astype(np.uint8)
                for _ in range(3)]
        masks = [None] * 3

        def post(i):
            buf = io.BytesIO()
            Image.fromarray(imgs[i]).save(buf, 'PNG')
            resp = urllib.request.urlopen(urllib.request.Request(
                f'{base}/predict', data=buf.getvalue(), method='POST'),
                timeout=60)
            masks[i] = np.asarray(Image.open(io.BytesIO(resp.read())))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for i in range(3):
            np.testing.assert_array_equal(masks[i], imgs[i][..., 0])
        # every image went through the batcher; under the generous
        # wait window at least one call actually grouped
        assert sum(grouped) == 3
        assert max(grouped) >= 2
    finally:
        captured['server'].shutdown()
        th.join(timeout=10)


def test_serve_stdin_loop_pipelined(coco_tree, tmp_path, monkeypatch,
                                    capsys):
    """--stdin: one echoed mask path (or "ERROR <msg>") per input line,
    in INPUT ORDER, under the round-4 pipelining (one dispatched image
    kept in flight; its fetch+save overlaps the next forward). A
    mid-stream bad path is isolated to its own ERROR line and the
    trailing in-flight handle is resolved before the loop returns."""
    import io as _io

    from patchgan_tpu.cli.serve import _stdin_loop

    class Handle:
        def __init__(self, mask):
            self._mask = mask

        def result(self):
            return self._mask

    class DummyEngine:
        def predict_image_async(self, image):
            return Handle(image[..., 0])

    imgs = sorted(str(p) for p in
                  (coco_tree / 'val' / 'images').iterdir())[:3]
    lines = [imgs[0], str(tmp_path / 'missing.jpg'), imgs[1], imgs[2]]
    monkeypatch.setattr('sys.stdin',
                        _io.StringIO('\n'.join(lines) + '\n'))
    out_dir = tmp_path / 'stdin_served'
    out_dir.mkdir()
    _stdin_loop(DummyEngine(), 'tiled', str(out_dir), workers=2)

    out_lines = capsys.readouterr().out.strip().splitlines()
    assert len(out_lines) == 4
    stem = [os.path.splitext(os.path.basename(p))[0] for p in lines]
    assert out_lines[0].endswith(f'{stem[0]}.png')
    assert out_lines[1].startswith('ERROR')
    assert out_lines[2].endswith(f'{stem[2]}.png')
    assert out_lines[3].endswith(f'{stem[3]}.png')
    # the masks were written with the save_mask encoding
    for k in (0, 2, 3):
        assert os.path.exists(out_dir / f'{stem[k]}.png')
