"""Batched tiled-inference engine.

The reference pushes ALL tiles of an image through the generator as one
variable-size batch (/root/reference/patchgan/infer.py:165-172), which on
TPU would retrace/recompile per distinct tile count. Here tile batches
are padded up to a fixed bucket size and run through a single jitted
forward, so arbitrary image sizes reuse one compiled program; padding
tiles are discarded before stitching.

The DEFAULT single-device path goes further and keeps the whole image
pipeline on device as ONE compiled program per image signature
(PATCHGAN_DEVICE_STITCH=off opts out): tiles are gathered by
``vmap(dynamic_slice)`` from the resident image, the forward runs in
bucket-size chunks under ``lax.scan`` (bounding activation memory to
one bucket), the averaging stitch is a sequential scatter-add of
``dynamic_update_slice`` pairs in the scan carry (XLA performs these
in place), and threshold/argmax run on device -- so each image costs
one dispatch plus one host fetch of the final (H, W) mask, instead of
per-bucket fetches and a host numpy stitch (reference semantics:
infer.py:37-68; measured 0.5 masks/s host-stitched through the axon
relay, BENCHMARKS.md "Large-image inference"). ``predict_image_async``
exposes the dispatch/fetch split so callers can pipeline decode and
mask-save of neighbouring images against device compute.

With a multi-device mesh, tile batches are laid out sharded across the
``data`` axis, so one oversized image's tiles are segmented across the
whole slice in parallel -- the TPU-native replacement for the
reference's host-side sequential tiling (SURVEY.md §5 "long-context"
analog).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import shard_batch
from .tiling import build_mask, crop_positions, n_crop


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# Generator-forward throughput by bucket size RELATIVE to bucket 16.
# A MEASURED table, loaded from bucket_rates.json next to this module
# (regenerate on new hardware with `python benchmarks/bucket_rates.py
# --write`; point PATCHGAN_BUCKET_RATES at an alternative file). The
# committed JSON was measured on v5e (s2d form, 256px, bf16;
# BENCHMARKS.md #23: throughput rises to a knee at bucket 128 as the
# thin boundary convs fill the MXU, then dips). Only the RATIOS are
# used, to pick the cheapest bucket for a tile count. The hardcoded
# fallback below (same v5e measurement) covers a missing/unreadable
# file so the engine never fails to construct.
_FALLBACK_BUCKET_REL_RATE = {8: 0.79, 16: 1.0, 32: 1.07, 64: 1.22,
                             128: 1.51}


def _load_bucket_rates():
    import json
    path = os.environ.get('PATCHGAN_BUCKET_RATES') or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'bucket_rates.json')
    try:
        with open(path) as f:
            rates = {int(k): float(v)
                     for k, v in json.load(f)['rel_rate'].items()}
        if rates and all(v > 0 for v in rates.values()):
            return rates
    except Exception:
        pass
    return dict(_FALLBACK_BUCKET_REL_RATE)


_BUCKET_REL_RATE = _load_bucket_rates()


def _pick_bucket(n, cap, align):
    """Cheapest power-of-two bucket for an ``n``-tile batch.

    Cost = padded tile count / relative throughput at that bucket, so
    a 30-tile image picks 32 (one fuller chunk beats two of 16) while
    130 tiles pick 16 (9 snug chunks beat two 128s that waste 45% of
    their slots). Power-of-two buckets keep the compiled-signature set
    bounded for heterogeneous tile counts (the engine compiles one
    program per (canvas, chunks, bucket) signature -- minutes each
    through a remote-TPU relay). ``cap`` (engine batch_size) and
    ``align`` (mesh-sharding multiple) restrict the candidates; if
    they exclude the whole table, fall back to the pre-#23 rule."""
    best = None
    for bs, rate in _BUCKET_REL_RATE.items():
        if bs > cap or bs % align:
            continue
        cost = _round_up(n, bs) / rate
        if best is None or cost < best[0] - 1e-9:
            best = (cost, bs)
    if best is None:
        return min(cap, _round_up(n, align))
    return best[1]


def _pad_min_size(image, size):
    """Edge-pad an (H, W, C) image up to at least (size, size).

    The reference tiler CRASHES on images smaller than the tile (its
    clamp produces negative-start slices, infer.py:29-32, and the
    too-small crop fails to assign); we instead pad with edge
    replication (keeps each tile's instance-norm statistics close to
    the real image's) and the caller crops the stitched mask back to
    (H, W).
    """
    h, w = image.shape[:2]
    if h >= size and w >= size:
        return image, (h, w)
    image = np.pad(image, ((0, max(0, size - h)), (0, max(0, size - w)),
                           (0, 0)), mode='edge')
    return image, (h, w)


def _pack_bits(mask):
    """(..., H, W) {0,1} mask -> (..., H, W//8) uint8, 8 pixels/byte.

    Big-endian within the byte so the host restore is exactly
    ``np.unpackbits(arr, axis=-1)``. W must be a multiple of 8 (the
    engine's canvases are 128-aligned). A pure elementwise
    multiply-reduce -- XLA fuses it into the thresholding epilogue.
    """
    w = mask.shape[-1]
    m = mask.reshape(mask.shape[:-1] + (w // 8, 8)).astype(jnp.int32)
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(m * weights, axis=-1).astype(jnp.uint8)


def _as_input(image):
    """Host-side ingest dtype: uint8 passes through (normalised /255 on
    device -- 4x smaller uploads, see the engine's ``_ingest``), any
    other dtype keeps the original float32 contract."""
    image = np.asarray(image)
    if image.dtype == np.uint8:
        return image
    return image.astype(np.float32, copy=False)


class _PendingMask:
    """In-flight device mask: ``.result()`` = the one host fetch.

    ``cast`` restores the host-path dtype after a compact-dtype fetch:
    the device program returns thresholded/argmax masks as uint8 (the
    values are small integers either way) because the relay transfers
    a (960, 1280) mask in 56 ms as uint8 vs 139 ms as float32
    (measured round 4) -- then the host casts back so callers see the
    same float32/int64 arrays as the host-stitch path.

    ``packed`` marks a BINARY mask shipped as bit-packed uint8 rows
    (8 pixels/byte, big-endian within the byte -- ``_pack_bits``):
    fetch bandwidth bounds serving throughput on this TPU relay
    (BENCHMARKS.md #24), so a thresholded {0,1} mask travels 8x
    smaller and ``np.unpackbits`` restores it here losslessly.
    """

    def __init__(self, dev, h, w, cast=None, packed=False):
        self._dev, self._h, self._w = dev, h, w
        self._cast = cast
        self._packed = packed

    def result(self):
        arr = np.asarray(self._dev)
        if self._packed:
            arr = np.unpackbits(arr, axis=1)
        arr = arr[:self._h, :self._w]
        return arr.astype(self._cast) if self._cast is not None else arr


class _ReadyMask:
    """Host-path result wrapped in the same handle interface."""

    def __init__(self, mask):
        self._mask = mask

    def result(self):
        return self._mask


class InferenceEngine:
    def __init__(self, generator, g_params, size=256, overlap=0.9,
                 threshold=0, batch_size=128, mesh=None, dtype=None):
        self.generator = generator
        self.size = size
        self.overlap = overlap
        self.threshold = threshold
        # warm starts: every engine program (bucketed forwards, stitch,
        # pack) uses default layouts end to end, so all of them can ride
        # the persistent compilation cache safely -- a serve/infer
        # process restart then reloads executables from disk instead of
        # re-paying the remote compiles (utils/compilation_cache.py;
        # PATCHGAN_COMPILATION_CACHE=off opts out)
        from ..utils.compilation_cache import enable_persistent_cache
        enable_persistent_cache()
        # forward-only programs: dispatch the thin boundary convs to
        # the forms measured fastest WITHOUT a backward (trace-time
        # switch, see ops/tapdot.py and BENCHMARKS.md "tap-dot")
        from ..ops.tapdot import set_tapdot_regime
        set_tapdot_regime('infer')
        self.mesh = mesh
        self.n_devices = mesh.devices.size if mesh is not None else 1
        # keep the bucket a multiple of the mesh size so crop batches
        # shard evenly across devices
        self.batch_size = _round_up(batch_size, self.n_devices)

        # weights live on device ONCE. Callers typically hand over a
        # host-numpy tree (the checkpoint/transfer path); numpy jit
        # ARGUMENTS are re-uploaded on EVERY dispatch -- ~100 MB/call
        # for the nf=64 generator (measured: multi-second /predict
        # requests through a remote-TPU relay; ~50 ms PCIe even
        # locally). Replicated across the mesh when present so sharded
        # tile batches find the weights on every device.
        #
        # They are also PRE-CAST to the module's compute dtype: the
        # model casts every kernel to ``generator.dtype`` at each use
        # site anyway (models/blocks.py), so hoisting the cast here is
        # bit-identical while halving the per-forward weight HBM reads
        # (fp32 masters are a training concern; inference never
        # updates them). Measured on v5e: see BENCHMARKS.md "Generator
        # inference forward".
        model_dtype = getattr(generator, 'dtype', jnp.float32)
        if model_dtype != jnp.float32:
            def precast(p):
                if isinstance(p, jax.Array):
                    # already on device: cast there (a host fetch of a
                    # ~100 MB tree through a remote-TPU relay takes
                    # seconds; no-op casts return p unchanged)
                    return p if p.dtype != jnp.float32 \
                        else p.astype(model_dtype)
                arr = np.asarray(p)  # host cast once, then one put
                return arr.astype(model_dtype) \
                    if arr.dtype == np.float32 else arr
            g_params = jax.tree.map(precast, g_params)
        if mesh is not None and self.n_devices > 1:
            from ..parallel.mesh import replicate
            self.g_params = replicate(g_params, mesh)
        else:
            self.g_params = jax.device_put(g_params)

        # the engine accepts either form of the module (identical
        # parameter tree either way) and derives what it needs
        gen_is_s2d = getattr(generator, 's2d', False)
        plain_gen = generator.clone(s2d=False) if gen_is_s2d \
            else generator

        def _ingest(x):
            # uint8 images normalise ON DEVICE: /255 on f32(u8)
            # matches a host divide to within 1 ulp (XLA may fuse it
            # as a reciprocal multiply; far below the model's bf16
            # cast), the upload ships 4x fewer bytes -- and on the
            # axon relay every host->device
            # transfer LEAKS its size in client RSS (standing
            # toolchain bug, benchmarks/repro_axon_upload_leak.py), so
            # compact ingest is also a 4x leak mitigation for
            # long-running serving. float32 inputs pass through
            # untouched (the original contract).
            if x.dtype == jnp.uint8:
                return x.astype(jnp.float32) / 255.0
            return x

        def plain_fwd(params, x):
            return plain_gen.apply({'params': params}, _ingest(x),
                                   train=False)

        # space-to-depth boundary form for the tiled forward (the same
        # trainer-side rewrite, ops/s2d.py: exact numerics, identical
        # params; kills the C=1 full-res output copies and enc0 lane
        # padding). Tiles are fixed (size x size); gate on evenness.
        # The spatial whole-image mode keeps the plain form -- it
        # shards H across the mesh, which the s2d reshape would
        # resplit.
        # only modules that carry the s2d capability (flax models with
        # the field; duck-typed heads in tests/serving stay plain)
        self._s2d = (os.environ.get('PATCHGAN_S2D', 'on').lower()
                     not in ('off', '0', 'false')
                     and size % 2 == 0
                     and getattr(generator, 's2d', None) is not None)
        if self._s2d:
            from ..ops.s2d import depth_to_space, space_to_depth
            gen_s2d = generator if gen_is_s2d \
                else generator.clone(s2d=True)

            def s2d_fwd(params, x):
                out = gen_s2d.apply({'params': params},
                                    space_to_depth(_ingest(x)),
                                    train=False)
                return depth_to_space(out)

            self._fwd_raw = s2d_fwd
            self._forward = jax.jit(s2d_fwd)
        else:
            self._fwd_raw = plain_fwd
            self._forward = jax.jit(plain_fwd)

        # spatial whole-image program WITH the threshold/argmax
        # postprocess fused in: ship the compact (ph, pw) mask (uint8
        # when binarised/multi-class), never the (ph, pw, C) f32
        # probability cube -- a 7-class 1280x960 image is 34 MB of f32
        # probs vs 1.2 MB of uint8 labels, and fetch bandwidth through
        # the TPU relay bounds serving throughput (BENCHMARKS.md #24).
        # The spatial mode keeps the PLAIN model form (s2d reshapes H,
        # which the height-sharded mesh would resplit).
        threshold = self.threshold
        # binary {0,1} masks additionally travel BIT-PACKED (8 px/byte,
        # _pack_bits; restored losslessly with np.unpackbits on fetch)
        # -- another 8x off the fetch on the transfer-bound relay.
        # PATCHGAN_PACKED_MASKS=off opts back into plain uint8.
        self._pack_masks = (
            os.environ.get('PATCHGAN_PACKED_MASKS', 'on').lower()
            not in ('off', '0', 'false'))
        pack_masks = self._pack_masks

        def spatial_run(params, x):
            probs = plain_fwd(params, x).astype(jnp.float32)
            if threshold > 0:
                probs = jnp.where(probs >= threshold, 1.0, 0.0)
            c = probs.shape[-1]
            if c > 1:
                lab = jnp.argmax(probs, axis=-1)
                return lab.astype(jnp.uint8) if c <= 256 else lab
            if threshold > 0:
                mask = probs[..., 0]
                if pack_masks and mask.shape[-1] % 8 == 0:
                    return _pack_bits(mask)
                return mask.astype(jnp.uint8)
            return probs[..., 0]

        self._forward_spatial = jax.jit(spatial_run)
        self._spatial_cast = None  # host dtype restore, set on 1st call
        self._spatial_packed = False

        # on-device tiled pipeline (gather + forward + stitch as one
        # program, module docstring): default on for single-device
        # meshes; multi-device keeps the sharded-tile host-stitch path
        self._device_stitch = (
            os.environ.get('PATCHGAN_DEVICE_STITCH', 'on').lower()
            not in ('off', '0', 'false')
            and self.n_devices == 1)
        self._dev_programs = {}  # (canvas_hw, c_in, n_chunks) -> jitted

    def _place(self, crops):
        if self.mesh is not None and self.n_devices > 1:
            return shard_batch(crops, self.mesh)
        return crops

    def predict_tiles(self, crops):
        """(N, size, size, C) -> (N, size, size, out_C), batched through a
        fixed-size jitted forward (sharded across the mesh if present)."""
        from ..ops.tapdot import set_tapdot_regime
        set_tapdot_regime('infer')   # lazy first trace of _forward
        n = crops.shape[0]
        bs = _pick_bucket(n, self.batch_size, max(8, self.n_devices))
        padded = _round_up(n, bs)
        if padded != n:
            pad = np.zeros((padded - n,) + crops.shape[1:], crops.dtype)
            crops = np.concatenate([crops, pad], axis=0)
        # dispatch every batch before fetching any result, so device
        # compute and host transfers pipeline instead of ping-ponging
        outs = [self._forward(self.g_params, self._place(crops[i:i + bs]))
                for i in range(0, padded, bs)]
        return np.concatenate([np.asarray(o) for o in outs], axis=0)[:n]

    # ------------------------------------------------------- on-device
    def _tiled_program(self, canvas_hw, c_in, n_chunks, bs):
        """One compiled program per (padded image shape, chunk count):
        gather -> chunked forward -> scatter-add stitch -> postprocess.
        Reference stitch semantics (infer.py:37-68) with the Q6 fix;
        the scan's tile order equals the host loop's, so the float
        accumulation order matches build_mask exactly."""
        key = (canvas_hw, c_in, n_chunks, bs)
        prog = self._dev_programs.pop(key, None)
        if prog is not None:
            self._dev_programs[key] = prog   # re-insert: LRU recency
            return prog
        # forward-only trace: assert the dispatch regime right before
        # this program is built (cf. ops/tapdot.py)
        from ..ops.tapdot import set_tapdot_regime
        set_tapdot_regime('infer')
        size, threshold = self.size, self.threshold
        fwd = self._fwd_raw
        hp, wp = canvas_hw
        out_c = jax.eval_shape(
            fwd, jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                self.g_params),
            jax.ShapeDtypeStruct((bs, size, size, c_in),
                                 jnp.float32)).shape[-1]
        packed = (self._pack_masks and out_c == 1 and threshold > 0
                  and wp % 8 == 0)

        def run(params, image, positions, valid):
            # image (hp, wp, c_in) f32 or uint8; positions
            # (n_chunks, bs, 2) int32 tile corners; valid (n_chunks, bs)
            # f32 -- 0 for the bucket-padding tiles, which then
            # contribute to neither canvas nor count
            if image.dtype == jnp.uint8:
                # normalise ONCE at program entry (gather then slices
                # f32): converting gathered tiles inside the chunk scan
                # instead compiled ~6x slower on v5e (425-584 s vs
                # ~70 s); /255-then-gather equals gather-then-/255
                # exactly (a gather is a copy)
                image = image.astype(jnp.float32) / 255.0
            canvas = jnp.zeros((hp, wp, out_c), jnp.float32)
            count = jnp.zeros((hp, wp, 1), jnp.float32)

            def gather(p):
                return jax.lax.dynamic_slice(
                    image, (p[0], p[1], 0), (size, size, c_in))

            def add_tile(carry, tile):
                canvas, count = carry
                p, pred, v = tile
                cur = jax.lax.dynamic_slice(
                    canvas, (p[0], p[1], 0), (size, size, out_c))
                canvas = jax.lax.dynamic_update_slice(
                    canvas, cur + pred, (p[0], p[1], 0))
                cnt = jax.lax.dynamic_slice(
                    count, (p[0], p[1], 0), (size, size, 1))
                count = jax.lax.dynamic_update_slice(
                    count, cnt + v, (p[0], p[1], 0))
                return (canvas, count), None

            def chunk(carry, inp):
                pos, val = inp
                tiles = jax.vmap(gather)(pos)
                preds = fwd(params, tiles).astype(jnp.float32)
                preds = preds * val[:, None, None, None]
                return jax.lax.scan(add_tile, carry, (pos, preds, val))

            (canvas, count), _ = jax.lax.scan(
                chunk, (canvas, count), (positions, valid))
            # full coverage guarantees count >= 1 on every real pixel;
            # the max(.,1) only protects nothing-written corners that a
            # caller-side crop discards anyway
            avg = canvas / jnp.maximum(count, 1.0)
            if threshold > 0:
                avg = jnp.where(avg >= threshold, 1.0, 0.0)
            # compact the fetch: thresholded {0,1} and argmax labels are
            # small ints -- ship them over the wire as uint8 (4x fewer
            # bytes than f32; _PendingMask restores the host-path
            # dtype), and binary masks further BIT-PACK to 8 px/byte
            if out_c > 1:
                lab = jnp.argmax(avg, axis=-1)
                return lab.astype(jnp.uint8) if out_c <= 256 else lab
            if threshold > 0:
                mask = avg[..., 0]
                if packed:
                    return _pack_bits(mask)
                return mask.astype(jnp.uint8)
            return avg[..., 0]

        # host-path dtype to restore after the compact fetch (uint8
        # when out_c <= 256, else jnp.argmax's int32 -- BOTH cast back
        # to np.argmax's int64, matching build_mask)
        if out_c > 1:
            cast = np.int64
        elif threshold > 0:
            cast = np.float32    # build_mask's binarised canvas
        else:
            cast = None
        prog = (jax.jit(run), cast, packed)
        # bounded LRU: quantization (predict_image_async) keeps the
        # working set tiny, but a long-lived server should not pin one
        # resident executable per shape it has ever seen
        self._dev_programs[key] = prog
        while len(self._dev_programs) > 16:
            self._dev_programs.pop(next(iter(self._dev_programs)))
        return prog

    def predict_image_async(self, image):
        """Dispatch one image's FULL tiled pipeline as a single device
        program and return a handle whose ``.result()`` performs the
        one host fetch (and crops edge-padding for images smaller than
        the tile). Lets callers overlap decode/save of neighbouring
        images with device compute (cli/infer.py)."""
        image, (h, w) = _pad_min_size(_as_input(image), self.size)
        if not self._device_stitch:
            crops = n_crop(image, self.size, self.overlap)
            masks = self.predict_tiles(crops)
            return _ReadyMask(build_mask(
                masks, self.size, image.shape[:2], self.threshold,
                self.overlap)[:h, :w])
        hp, wp, c_in = image.shape
        pos = np.asarray(crop_positions(hp, wp, self.size, self.overlap),
                         dtype=np.int32)
        n = pos.shape[0]
        bs = _pick_bucket(n, self.batch_size, 8)
        n_pad = _round_up(n, bs)
        # QUANTIZE the compiled-program signature so heterogeneous
        # image sizes share executables: the canvas rounds up to a
        # 128-px grid and the chunk count to a power of two (all-
        # invalid padding chunks). Tile POSITIONS stay computed from
        # the true padded size, so gathers/scatters never touch the
        # quantization band and the stitch is bit-identical; the fetch
        # is cropped to (h, w) regardless. Without this, a folder of
        # arbitrary photos compiles one program per distinct (H, W) —
        # minutes per compile through a remote-TPU relay.
        hq = _round_up(hp, 128)
        wq = _round_up(wp, 128)
        if (hq, wq) != (hp, wp):
            image = np.pad(image, ((0, hq - hp), (0, wq - wp), (0, 0)))
        n_chunks = n_pad // bs
        n_chunks_q = 1
        while n_chunks_q < n_chunks:
            n_chunks_q *= 2
        n_pad = n_chunks_q * bs
        valid = np.zeros((n_pad,), np.float32)
        valid[:n] = 1.0
        pos = np.concatenate(
            [pos, np.zeros((n_pad - n, 2), np.int32)], axis=0)
        prog, cast, packed = self._tiled_program(
            (hq, wq), c_in, n_chunks_q, bs)
        dev = prog(self.g_params, image,
                   pos.reshape(n_chunks_q, bs, 2),
                   valid.reshape(n_chunks_q, bs))
        return _PendingMask(dev, h, w, cast, packed)

    def predict_image(self, image, mode='tiled'):
        """(H, W, C) image of arbitrary size -> (H, W) mask.

        mode='tiled': the reference's overlap tiling + averaging stitch
        (each tile normalised by its own instance stats, matching
        train-time 256px crops).
        mode='spatial': run the WHOLE image in one forward, sharded
        across the mesh on the height axis -- GSPMD inserts the conv
        halo exchanges, so arbitrary-size images use the full slice with
        no tile seams (instance-norm statistics are then global to the
        image). The TPU-native 'long-context' path (SURVEY.md §5).
        """
        if mode == 'spatial':
            return self.predict_image_spatial(image)
        return self.predict_image_async(image).result()

    def predict_images(self, images):
        """Batched tiled inference over SEVERAL images (the serve
        --batch / HTTP micro-batching entry point).

        On the on-device-stitch path every image's FULL pipeline is
        dispatched before any result is fetched: programs pipeline on
        the device queue and each image costs ONE compact mask fetch.
        The alternative -- concatenating all images' tiles through one
        bucketed forward and stitching on host -- was measured 14x
        SLOWER end-to-end through the TPU relay (BENCHMARKS.md #24):
        it fetches every tile back as f32 (~1 MB/image at 256px vs
        64 KB for the stitched uint8 mask), and the fetch bandwidth,
        not the device forward, is the serving bottleneck. The
        tile-concat form is kept for the host-stitch path (multi-device
        meshes), where tiles of many images DO fill mesh-wide buckets
        the per-image path would pad."""
        if self._device_stitch:
            return [h.result() for h in self.predict_images_async(images)]
        padded = [_pad_min_size(_as_input(im), self.size)
                  for im in images]
        crops_list = [n_crop(im, self.size, self.overlap)
                      for im, _ in padded]
        if len({c.dtype for c in crops_list}) > 1:
            # MIXED uint8/float32 group: np.concatenate would silently
            # promote the uint8 crops to float32 with raw 0-255 values,
            # which the jitted _ingest (keyed on dtype) would then pass
            # to the model UN-divided. Normalise the uint8 members on
            # host here -- correctness over transfer size in the mixed
            # case (homogeneous groups keep the compact path).
            crops_list = [c.astype(np.float32) / 255.0
                          if c.dtype == np.uint8 else c
                          for c in crops_list]
        counts = [c.shape[0] for c in crops_list]
        masks = self.predict_tiles(np.concatenate(crops_list, axis=0))
        out, off = [], 0
        for (im, (h, w)), cnt in zip(padded, counts):
            out.append(build_mask(masks[off:off + cnt], self.size,
                                  im.shape[:2], self.threshold,
                                  self.overlap)[:h, :w])
            off += cnt
        return out

    def predict_images_async(self, images):
        """Dispatch SEVERAL images' pipelines; returns one handle per
        image (``.result()`` -> mask). On the on-device-stitch path all
        programs are dispatched back-to-back before any fetch, so the
        CALLERS can resolve (fetch + postprocess) concurrently while
        later dispatches queue -- the serve micro-batcher hands these
        handles back to its request threads for exactly that reason
        (resolving inside one dispatcher thread serialized the fetches
        and measured 2.4x slower, BENCHMARKS.md #24). On the
        host-stitch path the grouped tile-concat compute happens here
        synchronously (that fill is the point of grouping there) and
        the handles are pre-resolved."""
        if self._device_stitch:
            return [self.predict_image_async(im) for im in images]
        return [_ReadyMask(m) for m in self.predict_images(images)]

    def predict_image_spatial(self, image):
        """Whole-image forward, spatially sharded over the mesh.

        Threshold/argmax run ON DEVICE inside the jitted forward and
        only the compact (h, w) mask comes back (engine __init__,
        ``spatial_run``); the host merely crops the padding band and
        restores the reference postprocess dtype (np.argmax yields
        int64, the binarised canvas float32 -- infer.py:59-68)."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        image = _as_input(image)
        h, w = image.shape[:2]
        # the UNet needs spatial dims divisible by 128; pad and crop back
        ph, pw = _round_up(h, 128), _round_up(w, 128)
        padded = np.zeros((1, ph, pw, image.shape[2]), image.dtype)
        padded[0, :h, :w] = image
        if self.mesh is not None and self.n_devices > 1 and \
                ph % self.n_devices == 0:
            x = jax.device_put(
                padded, NamedSharding(self.mesh, P(None, 'data')))
        else:
            if self.mesh is not None and self.n_devices > 1:
                # loud fallback: silently running 1/n_devices as fast
                # would cost a user minutes of head-scratching
                import warnings
                warnings.warn(
                    f"spatial inference: padded height {ph} does not "
                    f"divide across the {self.n_devices}-device mesh; "
                    f"falling back to a SINGLE-device whole-image "
                    f"forward", stacklevel=2)
            x = jnp.asarray(padded)
        if self._spatial_cast is None:
            out_c = self._fwd_spatial_shape_probe(x).shape[-1]
            if out_c > 1:
                # np.argmax host dtype (the device returns uint8 for
                # <=256 classes, int32 above -- both restore to int64)
                self._spatial_cast = np.int64
            elif self.threshold > 0:
                self._spatial_cast = np.float32  # binarised canvas
            else:
                self._spatial_cast = False
            # binary masks come back bit-packed (spatial_run mirrors
            # the tiled program's gate: pack iff the padded width
            # is 8-aligned, which the 128-px rounding guarantees)
            self._spatial_packed = (
                self._pack_masks and out_c == 1 and self.threshold > 0)
        mask = np.asarray(self._forward_spatial(self.g_params, x))
        if self._spatial_packed and pw % 8 == 0:
            mask = np.unpackbits(mask, axis=-1)
        mask = mask[0, :h, :w]
        if self._spatial_cast is not False:
            mask = mask.astype(self._spatial_cast)
        return mask

    def _fwd_spatial_shape_probe(self, x):
        """abstract-eval helper: output shape of the plain forward."""
        params = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            self.g_params)
        return jax.eval_shape(self._fwd_raw, params, x)
