"""Input pipeline: parallel host decode -> on-device augment/one-hot.

Replaces the reference's torch DataLoader + per-sample CPU transforms
(/root/reference/patchgan/train.py:77-83, io.py:38-58) with a TPU-first
split:

- host side: a thread pool decodes and resizes JPEG/PNG pairs (PIL
  releases the GIL during decode) and collates fixed-shape numpy batches,
  with a bounded prefetch queue keeping the device fed;
- device side: one tiny jitted function per epoch does normalise +
  one-hot + per-sample random flips (p=0.25 horizontal and vertical,
  matching io.py:29-30) directly in HBM, and the result is laid out
  sharded across the data-parallel mesh before the train step consumes
  it (BASELINE.json: "on-device decode/resize/normalize/augment pipeline
  feeding HBM").

Datasets supply either ``load_raw(i) -> (image HWC float32, labelmap HW
int32)`` plus ``one_hot``/``labels`` (fast path) or just a torch-style
``__getitem__`` returning (image, one-hot mask) (compatibility path for
CWD ``io.py`` plugin datasets, SURVEY.md §2 #11).
"""

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import place_batch

# process-pool workers hold the dataset as a per-process global, set
# once by the pool initializer (fork makes this cheap on Linux); only
# decode code runs in workers -- no jax state crosses the boundary
_WORKER_DS = None


def _init_worker(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _worker_load_raw(index):
    fn = getattr(_WORKER_DS, 'load_raw_u8', None) or _WORKER_DS.load_raw
    return fn(int(index))


def _worker_getitem(index):
    return _WORKER_DS[int(index)]


class _SyncPool:
    """num_workers=0: decode inline in the producer thread (prefetch
    into the bounded queue still overlaps decode with device compute)."""

    def map(self, fn, iterable):
        return [fn(i) for i in iterable]

    def shutdown(self, wait=False):
        pass


@partial(jax.jit, static_argnames=('flip', 'dtype'))
def _augment_batch(images, labelmaps, labels, key, flip=False,
                   dtype=jnp.float32):
    """images: (N,H,W,C) float32 in [0,1] or uint8 (normalised here, on
    device, so uint8 batches cross the host->device link at a quarter of
    the float32 bytes); labelmaps: (N,H,W) integer; labels: (L,) int32
    (already offset to match the labelmap encoding). Returns (x, y) with
    y one-hot, flips applied consistently to both."""
    x = images.astype(dtype)
    if images.dtype == jnp.uint8:
        x = x / jnp.asarray(255.0, dtype)
    y = (labelmaps.astype(jnp.int32)[..., None]
         == labels[None, None, None, :]).astype(dtype)
    if flip:
        n = x.shape[0]
        hkey, vkey = jax.random.split(key)
        hflip = jax.random.uniform(hkey, (n, 1, 1, 1)) < 0.25
        vflip = jax.random.uniform(vkey, (n, 1, 1, 1)) < 0.25
        x = jnp.where(hflip, x[:, :, ::-1, :], x)
        y = jnp.where(hflip, y[:, :, ::-1, :], y)
        x = jnp.where(vflip, x[:, ::-1, :, :], x)
        y = jnp.where(vflip, y[:, ::-1, :, :], y)
    return x, y


class DataLoader:
    """Shuffling, batching, prefetching loader yielding device-resident
    (x, y) NHWC batches."""

    def __init__(self, dataset, batch_size=16, shuffle=True,
                 drop_last=True, num_workers=4, prefetch=2, mesh=None,
                 dtype=jnp.float32, seed=0, device_augment=None,
                 cache=False, process_index=None, process_count=None,
                 worker_type='thread'):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle_enabled = shuffle
        self.drop_last = drop_last
        # 0 = synchronous decode in the producer thread (no pool); the
        # reference's torch DataLoader gives num_workers=0 the same
        # meaning (decode in the iterating process, train.py:78-80)
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.mesh = mesh
        self.dtype = dtype
        # 'thread' decode scales to ~4 cores per chip (PIL/libjpeg
        # release the GIL); 'process' sidesteps the GIL entirely for
        # many-core hosts feeding several chips (torch-DataLoader
        # analog, reference train.py:78-80)
        if worker_type not in ('thread', 'process'):
            raise ValueError(f"worker_type {worker_type!r} not in "
                             "('thread', 'process')")
        if worker_type == 'process' and self.num_workers == 0:
            raise ValueError(
                "num_workers=0 (synchronous decode) requires "
                "worker_type='thread'")
        if worker_type == 'process' and cache:
            raise ValueError(
                "the decoded-image RAM cache lives in the parent "
                "process; use worker_type='thread' with cache")
        self.worker_type = worker_type
        # per-host input sharding (multi-controller deployments): each
        # host decodes only its process_local_range slice of every
        # global batch and the global jax.Array is assembled from the
        # local shards -- no host materialises the full batch. Enabled
        # automatically under multi-process jax, or explicitly (incl.
        # process_count=1, which exercises the same assembly path on a
        # single controller). The index permutation derives from the
        # shared seed, so hosts agree without communicating.
        if process_count is None and jax.process_count() > 1:
            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_count = process_count
        self.process_index = process_index if process_index is not None \
            else 0
        self._warned_remainder = False
        if self.process_count:
            if self.process_count > 1 and process_index is None:
                # defaulting to 0 would silently duplicate host 0's
                # slice on every host
                raise ValueError(
                    "process_index is required when process_count > 1 "
                    "is given explicitly")
            if mesh is None:
                raise ValueError(
                    "per-host input sharding needs a mesh to define "
                    "the global batch layout")
            if batch_size % self.process_count:
                raise ValueError(
                    f"batch {batch_size} must divide across "
                    f"{self.process_count} hosts")
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._epoch = 0
        self._skip_next = 0  # one-shot batch skip (see skip_next)
        if device_augment is None:
            device_augment = hasattr(dataset, 'load_raw')
        self.device_augment = device_augment
        # decoded-image RAM cache: raw decode is deterministic (all
        # randomness -- flips -- happens downstream on device), so
        # epochs >= 2 never touch the JPEG/PNG decoder. cache=True is
        # unbounded; an int caps the cache at that many BYTES and stops
        # inserting once full (a partial cache still removes that
        # fraction of decode work). A 256px uint8 pair is ~260 KB, so
        # 10k images fit in ~2.6 GB.
        self._cache = {} if cache else None
        self._cache_budget = cache if isinstance(cache, int) \
            and not isinstance(cache, bool) else None
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()
        self._proc_pool = None  # persistent across epochs (see close)

    def _batch_divisor(self):
        """Global-batch divisibility requirement under per-host
        sharding: ``make_array_from_process_local_data`` needs the
        global batch to split evenly over the mesh's batch-sharded
        device count (verified: a global batch of 2 over an 8-device
        'data' axis raises), and ``process_local_range`` needs it to
        split evenly over the hosts — so a remainder batch is only
        keepable when it divides lcm(hosts, batch-axis devices)."""
        if not self.process_count:
            return 1
        d = self.process_count
        if self.mesh is not None:
            from ..parallel.multihost import DATA_AXIS, DCN_AXIS
            n_batch_devices = 1
            for axis in self.mesh.axis_names:
                if axis in (DCN_AXIS, DATA_AXIS):
                    n_batch_devices *= self.mesh.shape[axis]
            d = int(np.lcm(d, n_batch_devices))
        return d

    def __len__(self):
        n = len(self.dataset)
        full = n // self.batch_size
        rem = n - full * self.batch_size
        if self.drop_last or rem == 0:
            return full
        if rem % self._batch_divisor():
            # the remainder batch cannot shard across the hosts/mesh
            # and is dropped (warned once in _index_batches)
            return full
        return full + 1

    def shuffle(self):
        # epoch hook kept for Trainer's hasattr(data, 'shuffle') call
        # (reference trainer.py:206-207); actual shuffling happens in
        # __iter__ per epoch.
        pass

    def fast_forward(self, n_epochs):
        """Advance the shuffle RNG and epoch counter as if ``n_epochs``
        epochs had been iterated, WITHOUT decoding anything. After
        ``fast_forward(k)``, the next iteration produces exactly the
        batch order (and on-device flip draws) that epoch k+1 of an
        uninterrupted run would have seen -- the hook preemption-safe
        resume uses to continue bit-identically (train/trainer.py)."""
        for _ in range(int(n_epochs)):
            self._epoch += 1
            if self.shuffle_enabled:
                # consume the RNG identically to _index_batches
                self._rng.shuffle(np.arange(len(self.dataset)))

    def skip_next(self, n_batches):
        """Skip the first ``n_batches`` of the NEXT iteration without
        decoding them. Batch indexing (and therefore the per-batch
        on-device flip keys) keeps its original numbering, so the
        remaining stream is identical to slicing an uninterrupted
        epoch -- mid-epoch resume uses this to avoid re-decoding the
        already-trained prefix (train/trainer.py)."""
        self._skip_next = int(n_batches)

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle_enabled:
            self._rng.shuffle(idx)
        n_full = len(idx) // self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_full)]
        rem = len(idx) - n_full * self.batch_size
        if rem and not self.drop_last:
            divisor = self._batch_divisor()
            if rem % divisor:
                if not self._warned_remainder:
                    print(f"DataLoader: dropping the {rem}-sample "
                          f"remainder batch each epoch (not divisible "
                          f"by {divisor}: {self.process_count} hosts x "
                          f"the mesh's batch-sharded devices)")
                    self._warned_remainder = True
            else:
                batches.append(idx[-rem:])
        return batches

    def _raw_fn(self):
        # transfer-optimal uint8 decode when the dataset provides it
        return getattr(self.dataset, 'load_raw_u8', None) or \
            self.dataset.load_raw

    def _load_raw_cached(self, index):
        index = int(index)
        hit = self._cache.get(index)
        if hit is not None:
            return hit
        pair = self._raw_fn()(index)
        nbytes = pair[0].nbytes + pair[1].nbytes
        # a racing duplicate DECODE is harmless, but the byte
        # accounting must be check-and-insert atomic or concurrent
        # misses double-count against the budget
        with self._cache_lock:
            if index not in self._cache and (
                    self._cache_budget is None or
                    self._cache_bytes + nbytes <= self._cache_budget):
                self._cache[index] = pair
                self._cache_bytes += nbytes
        return pair

    def _fetch_raw(self, pool, indices):
        if self.worker_type == 'process':
            fn = _worker_load_raw
        elif self._cache is not None:
            fn = self._load_raw_cached
        else:
            fn = self._raw_fn()
        pairs = list(pool.map(fn, indices))
        images = np.stack([p[0] for p in pairs])
        labelmaps = np.stack([p[1] for p in pairs])
        return images, labelmaps

    def _fetch_items(self, pool, indices):
        fn = _worker_getitem if self.worker_type == 'process' \
            else self.dataset.__getitem__
        pairs = list(pool.map(fn, indices))
        x = np.stack([p[0] for p in pairs])
        y = np.stack([p[1] for p in pairs])
        return x, y

    def _process_pool(self):
        """Persistent forkserver pool: workers fork from a clean server
        process, not from this (jax-threaded) one -- plain fork of a
        threaded process can deadlock. The dataset reaches workers by
        pickle through the initializer, ONCE per loader lifetime (not
        per epoch); call close() to release the workers early."""
        if self._proc_pool is None:
            import multiprocessing
            self._proc_pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context('forkserver'),
                initializer=_init_worker, initargs=(self.dataset,))
        return self._proc_pool

    def close(self):
        """Shut down the persistent decode workers (process mode)."""
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False)
            self._proc_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _to_device(self, batch):
        return place_batch(batch, self.mesh)

    def _local_indices(self, indices):
        """This host's contiguous slice of a global index batch."""
        if not self.process_count:
            return indices
        from ..parallel.multihost import process_local_range
        lo, hi = process_local_range(
            len(indices), self.process_index, self.process_count)
        return indices[lo:hi]

    def _assemble_global(self, arrays, global_batch):
        """Host-local numpy shards -> global batch-sharded jax.Arrays
        (each host contributes only the rows its devices own)."""
        from ..parallel.multihost import batch_sharding_for
        sharding = batch_sharding_for(self.mesh)
        return tuple(
            jax.make_array_from_process_local_data(
                sharding, a, (global_batch,) + a.shape[1:])
            for a in arrays)

    def __iter__(self):
        self._epoch += 1
        epoch_key = jax.random.fold_in(self._key, self._epoch)
        batches = self._index_batches()
        skip_first, self._skip_next = self._skip_next, 0
        flip = bool(getattr(self.dataset, 'augmentation', None)
                    == 'randomcrop+flip') and self.device_augment
        labels = None
        if self.device_augment:
            labels = np.asarray(self.dataset.labels, dtype=np.int32)
            if getattr(self.dataset, 'load_raw_u8', None) is not None:
                # the u8 fast path ships RAW labelmaps (no +1 offset,
                # coco.py load_raw_u8); offset the label table instead
                labels = labels - 1
            labels = jnp.asarray(labels)

        out_q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        if self.worker_type == 'process':
            pool = self._process_pool()
        elif self.num_workers == 0:
            pool = _SyncPool()
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def put(item):
            # bounded put that aborts if the consumer abandoned iteration
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for bi, indices in enumerate(batches):
                    if stop.is_set():
                        return
                    if bi < skip_first:
                        continue  # mid-epoch resume (skip_next)
                    # note: _index_batches already drops un-shardable
                    # remainder batches (with a warning), so every
                    # batch here divides across process_count hosts
                    if self.device_augment:
                        images, labelmaps = self._fetch_raw(
                            pool, self._local_indices(indices))
                        if self.process_count:
                            images, labelmaps = self._assemble_global(
                                (images, labelmaps), len(indices))
                        key = jax.random.fold_in(epoch_key, bi)
                        # under per-host sharding the inputs are already
                        # global batch-sharded arrays; the flip draw is
                        # over the GLOBAL batch with a host-independent
                        # key, so augmentation matches the single-host
                        # run bit for bit
                        x, y = _augment_batch(
                            jnp.asarray(images), jnp.asarray(labelmaps),
                            labels, key, flip=flip, dtype=self.dtype)
                        out = (x, y) if self.process_count \
                            else self._to_device((x, y))
                        if not put(out):
                            return
                    else:
                        xy = self._fetch_items(
                            pool, self._local_indices(indices))
                        out = self._assemble_global(xy, len(indices)) \
                            if self.process_count else self._to_device(xy)
                        if not put(out):
                            return
            except Exception as e:  # surface worker errors to consumer
                put(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            if pool is not self._proc_pool:
                # thread pools are per-epoch; the process pool persists
                # across epochs (its dataset pickle is paid once)
                pool.shutdown(wait=False)
