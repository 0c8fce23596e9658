"""Training runtime: epoch loop, checkpointing, LR schedules, logging.

TPU-native rebuild of the reference Trainer
(/root/reference/patchgan/trainer.py:16-321). Public surface preserved:

- class attrs ``seg_alpha=200``, ``loss_type='tversky'``,
  ``tversky_beta=0.75``, ``tversky_gamma=0.75``, ``neptune_config=None``
  (trainer.py:22-27);
- ``Trainer(generator, discriminator, savefolder)``; ``batch(x, y, train)``
  returning the scalar dict with keys
  ['gen','gen_loss','gdisc','discr','discf','disc'] (trainer.py:109-113);
- ``train(train_data, val_data, epochs, dsc_learning_rate,
  gen_learning_rate, save_freq, lr_decay, decay_freq, reduce_on_plateau)``
  returning (G_loss_ep, D_loss_ep) (trainer.py:117,279);
- ``save`` / ``load`` / ``load_last_checkpoint`` with the epoch-numbered
  two-file layout and max-of-union resume rule (trainer.py:281-321), plus
  the LR fast-forward on resume (trainer.py:155-157).

TPU-first differences: ``generator``/``discriminator`` are Flax module
definitions (immutable); parameters live in ``self.state`` (a TrainState)
replicated across a data-parallel device mesh, batches are sharded on the
mesh, and the whole G+D alternating update runs as one jitted step with
donated buffers (train/steps.py). Loss scalars are fetched with a
one-step delay so the host never stalls the device pipeline.

Known reference bugs fixed (SURVEY.md §5 quirks): Q2 (labels allocated on
a module-global device) is structurally impossible here; Q4
(ReduceLROnPlateau crashing when neptune is absent) is guarded.
"""

import os
import re
import time
from collections import defaultdict

import jax
import numpy as np
import tqdm

from ..parallel.mesh import default_mesh, replicate
from ..utils import checkpoint as ckpt
from ..utils.transfer import (disc_key_map, export_state_dict,
                              load_transfer_data, unet_key_map)
from .schedulers import (ConstantLR, ExponentialDecay, ReduceLROnPlateau,
                         resume_fast_forward)
from .steps import (TrainState, init_train_state, make_eval_step,
                    make_optimizer, make_train_step)


def _set_learning_rate(opt_state, lr):
    """Write the LR into every inject_hyperparams state, traversing
    wrapper states (e.g. optax.multi_transform partitions when parameter
    freezing is active)."""
    if hasattr(opt_state, 'hyperparams'):
        opt_state.hyperparams['learning_rate'] = np.float32(lr)
    elif hasattr(opt_state, 'inner_states'):
        for inner in opt_state.inner_states.values():
            _set_learning_rate(getattr(inner, 'inner_state', inner), lr)
    elif hasattr(opt_state, 'inner_opt_state'):
        # optax.MultiSteps (gradient accumulation) wrapper
        _set_learning_rate(opt_state.inner_opt_state, lr)
    elif hasattr(opt_state, 'inner_state'):
        _set_learning_rate(opt_state.inner_state, lr)
    return opt_state


class Trainer:
    '''Training driver: owns the jitted GAN step, the epoch loop, and
    checkpoint save/resume.'''

    seg_alpha = 200
    loss_type = 'tversky'
    tversky_beta = 0.75
    tversky_gamma = 0.75
    bce_weighting = 'complement'  # weighted_bce class weights:
    #   'complement' (reference) | 'inverse' (inverse-frequency) | 'none'

    neptune_config = None
    compute_iou = False   # add mean-IoU to validation metrics
    profile_dir = None    # jax.profiler trace of the first train epoch
    save_optimizer_state = False  # also write exact-resume train state
    checkpoint_format = 'msgpack'  # exact-resume store: 'msgpack' |
    #                                'orbax' (async, sharding-aware)
    save_every_steps = None  # preemption safety: every N train batches
    #                          write a ROLLING full-train-state file +
    #                          progress metadata; load_last_checkpoint
    #                          resumes mid-epoch bit-identically (the
    #                          loader order is replayed via
    #                          DataLoader.fast_forward + batch skipping)
    adam_mu_dtype = None  # bf16 halves first-moment HBM traffic
    freeze_generator = ()  # path prefixes to freeze, e.g. ('enc',)
    accumulate_steps = 1  # gradient accumulation: apply the optimizer
    #                       update every N batches on the running MEAN
    #                       of the gradients (effective batch N*B at
    #                       batch-B memory; optax.MultiSteps in
    #                       steps.make_optimizer). Like adam_mu_dtype,
    #                       takes effect at the next train() call
    #                       (which rebuilds optimizers and their state)

    def __init__(self, generator, discriminator, savefolder, device=None,
                 seed=0, mesh=None):
        '''generator / discriminator are Flax module definitions
        (models.UNet / models.Discriminator); savefolder is created if
        missing, as in the reference (trainer.py:41-46).'''
        self.generator = generator
        self.discriminator = discriminator

        # warm starts: the plain/eval step programs are cache-safe
        # (default layouts), so restarts and resumes reload their
        # executables from the persistent compilation cache instead of
        # re-paying the minutes-long remote compile. The AUTO-layout
        # wrapper's own programs are NOT cache-safe on this toolchain
        # and bypass it internally (train/auto_layout.py docstring;
        # PATCHGAN_COMPILATION_CACHE=off opts out entirely).
        from ..utils.compilation_cache import enable_persistent_cache
        enable_persistent_cache()

        # train programs: thin boundary convs dispatch to the forms
        # measured fastest WITH a backward (trace-time switch; an
        # InferenceEngine constructed later flips it to 'infer' for its
        # own traces — see ops/tapdot.py)
        from ..ops.tapdot import set_tapdot_regime
        set_tapdot_regime('train')

        if savefolder[-1] != '/':
            savefolder += '/'
        self.savefolder = savefolder
        if not os.path.exists(savefolder):
            os.makedirs(savefolder, exist_ok=True)

        self.mesh = mesh if mesh is not None else default_mesh()
        self.seed = seed
        self.start = 1
        self.state = None
        self._step_cache = {}
        self._pending_training_state = None  # exact-resume file
        self._resume_skip_batches = 0  # mid-epoch resume (see
        #                                save_every_steps)
        self._resume_loader_epoch = None

        # parameter init is shape-independent (all-conv nets): use a tiny
        # dummy spatial extent. weights_init parity: xavier-uniform conv
        # kernels are the module defaults (models/blocks.py).
        gen_tx, disc_tx = self._make_optimizers(1e-3, 1e-3)
        self.state = init_train_state(
            generator, discriminator,
            (1, 128, 128, generator.input_nc), generator.output_nc,
            gen_tx, disc_tx, seed=seed)
        self._gen_tx, self._disc_tx = gen_tx, disc_tx

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------
    def _make_optimizers(self, gen_lr, dsc_lr):
        return (make_optimizer(gen_lr, mu_dtype=self.adam_mu_dtype,
                               freeze_patterns=tuple(
                                   self.freeze_generator),
                               every_k=self.accumulate_steps),
                make_optimizer(dsc_lr, mu_dtype=self.adam_mu_dtype,
                               every_k=self.accumulate_steps))

    def _keymaps(self):
        gen_map = unet_key_map()
        disc_map = disc_key_map(n_layers=self.discriminator.n_layers,
                                norm=self.discriminator.norm)
        return gen_map, disc_map

    def _loss_key(self):
        return (self.loss_type, float(self.seg_alpha),
                float(self.tversky_beta), float(self.tversky_gamma),
                bool(self.compute_iou), self.bce_weighting)

    def _get_step(self, train, s2d=False):
        key = (train, s2d, self._loss_key())
        if key not in self._step_cache:
            # re-assert at every new trace, not just construction: an
            # InferenceEngine built in between (validation previews)
            # flips the trace-time regime to 'infer'
            from ..ops.tapdot import set_tapdot_regime
            set_tapdot_regime('train')
            gen, disc = (self._s2d_models() if s2d
                         else (self.generator, self.discriminator))
            if train:
                fn = make_train_step(
                    gen, disc, self._gen_tx,
                    self._disc_tx, loss_type=self.loss_type,
                    seg_alpha=self.seg_alpha,
                    tversky_beta=self.tversky_beta,
                    tversky_gamma=self.tversky_gamma,
                    bce_weighting=self.bce_weighting,
                    freeze_patterns=tuple(self.freeze_generator))
                jitted = jax.jit(fn, donate_argnums=(0,))
                if self._auto_layout():
                    from .auto_layout import AutoLayoutStep
                    shadow_fn, shadow_dtype = None, None
                    if self._shadow_params():
                        shadow_dtype = self.generator.dtype
                        shadow_fn = make_train_step(
                            gen, disc, self._gen_tx, self._disc_tx,
                            loss_type=self.loss_type,
                            seg_alpha=self.seg_alpha,
                            tversky_beta=self.tversky_beta,
                            tversky_gamma=self.tversky_gamma,
                            bce_weighting=self.bce_weighting,
                            shadow_dtype=shadow_dtype,
                            freeze_patterns=tuple(self.freeze_generator))
                    jitted = AutoLayoutStep(fn, jitted,
                                            shadow_fn=shadow_fn,
                                            shadow_dtype=shadow_dtype)
            else:
                fn = make_eval_step(
                    gen, disc,
                    loss_type=self.loss_type, seg_alpha=self.seg_alpha,
                    tversky_beta=self.tversky_beta,
                    tversky_gamma=self.tversky_gamma,
                    compute_iou=self.compute_iou,
                    bce_weighting=self.bce_weighting)
                jitted = jax.jit(fn)
            self._step_cache[key] = jitted
        return self._step_cache[key]

    def _s2d_models(self):
        """Model clones carrying the space-to-depth boundary form
        (ops/s2d.py): same parameter tree, same per-pixel numerics, so
        checkpoints and the public API are untouched -- only the traced
        program changes."""
        if not hasattr(self, '_s2d_clones'):
            self._s2d_clones = (self.generator.clone(s2d=True),
                                self.discriminator.clone(s2d=True))
        return self._s2d_clones

    def _s2d_enabled(self):
        """Space-to-depth boundary form for the jitted steps, default
        on (measured on v5e batch-16 256px: 14.3 vs 16.2 ms/step
        combined with AUTO layouts -- BENCHMARKS.md round-3 "boundary
        layouts"). Numerically exact (tests/test_s2d.py). Disable with
        PATCHGAN_S2D=off. Spatial meshes keep the plain form: they
        shard H, which the s2d reshape would resplit."""
        flag = os.environ.get('PATCHGAN_S2D', 'on').lower()
        if flag in ('off', '0', 'false'):
            return False
        if self.mesh is not None:
            from ..parallel.spatial import SPATIAL_AXIS
            if SPATIAL_AXIS in self.mesh.axis_names:
                return False
        return True

    def _use_s2d(self, x):
        # the boundary form needs even H and W (2x2 block grid)
        return (self._s2d_enabled()
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)

    def _auto_layout(self):
        """XLA-chosen train-state layouts for the eager step dispatch
        (train/auto_layout.py; +9.5% measured on v5e single-chip).
        Default on for any single-process mesh since round 4: the AOT
        format path carries each leaf's NamedSharding alongside the
        AUTO layout, and the detached-v5e-8-topology probe
        (benchmarks/dp_layout_probe.py) shows the DP step both WANTS
        non-default layouts (20 state leaves) and fix-points under
        them. Multi-process meshes keep GSPMD's layouts (AOT
        device_put of a relayouted global state is not validated
        cross-host). PATCHGAN_AUTO_LAYOUT=off disables."""
        flag = os.environ.get('PATCHGAN_AUTO_LAYOUT', 'on').lower()
        if flag in ('off', '0', 'false'):
            return False
        if self.mesh is None or self.mesh.size == 1:
            return True
        return jax.process_count() == 1

    def _shadow_params(self):
        """Resident compute-dtype generator shadow on the AUTO-layout
        eager path (train/steps.py shadow_dtype; bit-exact, measured
        +0.8% on v5e — BENCHMARKS.md round 4). Only meaningful when the
        compute dtype differs from the fp32 masters. Disable with
        PATCHGAN_SHADOW_PARAMS=off."""
        flag = os.environ.get('PATCHGAN_SHADOW_PARAMS', 'on').lower()
        if flag in ('off', '0', 'false'):
            return False
        import jax.numpy as jnp
        return self.generator.dtype != jnp.float32

    def _place_batch(self, x, y):
        # device-resident batches from the DataLoader pass straight
        # through (converting them would round-trip device->host->device)
        if isinstance(x, jax.Array) and isinstance(y, jax.Array):
            return x, y
        from ..parallel.mesh import place_batch
        return place_batch((np.asarray(x), np.asarray(y)), self.mesh)

    # ------------------------------------------------------------------
    # the public per-batch entry point (reference trainer.py:50-115)
    # ------------------------------------------------------------------
    def batch(self, x, y, train=False):
        '''Run one G+D step (train=True) or loss evaluation (train=False)
        on a single NHWC batch. Returns the reference's scalar loss dict.
        '''
        x, y = self._place_batch(x, y)
        if train:
            self.state, losses = self._get_step(
                True, self._use_s2d(x))(self.state, x, y)
        else:
            losses = self._get_step(False, self._use_s2d(x))(
                self.state, x, y)
        # jit canonicalises dict ordering; restore the reference's key
        # order (trainer.py:109), appending any extra metrics (e.g. iou)
        keys = ['gen', 'gen_loss', 'gdisc', 'discr', 'discf', 'disc']
        keys += [k for k in losses if k not in keys]
        return {k: float(losses[k]) for k in keys}

    # ------------------------------------------------------------------
    # epoch loop (reference trainer.py:117-279)
    # ------------------------------------------------------------------
    def train(self, train_data, val_data, epochs, dsc_learning_rate=1.e-3,
              gen_learning_rate=1.e-3, save_freq=10, lr_decay=None,
              decay_freq=5, reduce_on_plateau=False):
        '''Training driver; see the reference docstring (trainer.py:
        120-153) -- semantics preserved, including the LR fast-forward on
        resume and the decay_freq-gated exponential decay.'''
        if (lr_decay is not None) and not reduce_on_plateau:
            gen_lr = resume_fast_forward(gen_learning_rate, lr_decay,
                                         self.start, decay_freq)
            dsc_lr = resume_fast_forward(dsc_learning_rate, lr_decay,
                                         self.start, decay_freq)
        else:
            gen_lr = gen_learning_rate
            dsc_lr = dsc_learning_rate

        if self.neptune_config is not None:
            self.neptune_config['model/parameters/gen_learning_rate'] = gen_lr
            self.neptune_config['model/parameters/dsc_learning_rate'] = dsc_lr
            self.neptune_config['model/parameters/start'] = self.start
            self.neptune_config['model/parameters/n_epochs'] = epochs

        # fresh Adam state per train() call (reference trainer.py:169-172)
        self._gen_tx, self._disc_tx = self._make_optimizers(gen_lr, dsc_lr)
        self._step_cache.clear()
        self.state = TrainState(
            g_params=self.state.g_params,
            d_params=self.state.d_params,
            g_opt_state=self._gen_tx.init(self.state.g_params),
            d_opt_state=self._disc_tx.init(self.state.d_params),
            step=self.state.step,
            rng=self.state.rng,
        )
        if self._pending_training_state is not None:
            # exact resume (extension over the reference, which restarts
            # Adam moments on resume): restore the full TrainState saved
            # by save_optimizer_state
            path = self._pending_training_state
            if path.endswith('.orbax'):
                from ..utils import orbax_ckpt
                self.state = orbax_ckpt.restore(path, self.state)
            else:
                import flax.serialization
                with open(path, 'rb') as f:
                    self.state = flax.serialization.from_bytes(
                        self.state, f.read())
            print(f"Restored optimizer state from "
                  f"{os.path.basename(path)}")
            self._pending_training_state = None
        self.state = replicate(self.state, self.mesh)

        if self._resume_skip_batches or self._resume_loader_epoch:
            if self._resume_skip_batches:
                print(f"Resuming mid-epoch: skipping the "
                      f"{self._resume_skip_batches} already-trained "
                      f"batches of epoch {self.start}")
            if hasattr(train_data, 'fast_forward'):
                # replay the interrupted run's shuffle order exactly so
                # the continuation is bit-identical to an uninterrupted
                # run. The step metadata records the LOADER iteration
                # the resumed epoch consumes (not the calendar epoch --
                # a resumed run's fresh loader starts over), falling
                # back to calendar epochs for pre-metadata checkpoints.
                le = self._resume_loader_epoch or self.start
                train_data.fast_forward(le - 1)
            if self._resume_skip_batches and \
                    hasattr(train_data, 'skip_next'):
                # index-level skip: the loader drops the batches before
                # decoding them (flip keys stay aligned) instead of the
                # consumer discarding fully-decoded batches.
                # _resume_skip_batches stays set so step-save numbering
                # still counts the skipped batches (see _run_epoch).
                train_data.skip_next(self._resume_skip_batches)
                self._resume_skip_delegated = True
            self._resume_loader_epoch = None

        if reduce_on_plateau:
            gen_sched = ReduceLROnPlateau(gen_lr)
            dsc_sched = ReduceLROnPlateau(dsc_lr)
            if self.neptune_config is not None:  # Q4 fix: guard None
                self.neptune_config['model/parameters/scheduler'] = \
                    'ReduceLROnPlateau'
        elif lr_decay is not None:
            gen_sched = ExponentialDecay(gen_lr, lr_decay, decay_freq)
            dsc_sched = ExponentialDecay(dsc_lr, lr_decay, decay_freq)
            if self.neptune_config is not None:
                self.neptune_config['model/parameters/scheduler'] = \
                    'ExponentialLR'
                self.neptune_config['model/parameters/decay_freq'] = \
                    decay_freq
                self.neptune_config['model/parameters/lr_decay'] = lr_decay
        else:
            gen_sched = ConstantLR(gen_lr)
            dsc_sched = ConstantLR(dsc_lr)

        D_loss_ep, G_loss_ep = [], []
        for epoch in range(self.start, epochs + 1):
            gen_lr, dsc_lr = gen_sched.lr, dsc_sched.lr
            print(f"Epoch {epoch} -- lr: {gen_lr:5.3e}, {dsc_lr:5.3e}")
            print("-------------------------------------------------------")

            self.state = self.state._replace(
                g_opt_state=_set_learning_rate(self.state.g_opt_state,
                                               gen_lr),
                d_opt_state=_set_learning_rate(self.state.d_opt_state,
                                               dsc_lr))

            from ..utils.profiling import maybe_trace
            with maybe_trace(self.profile_dir,
                             enabled=(epoch == self.start)):
                loss_mean, n_images, elapsed = self._run_epoch(
                    train_data, train=True, desc='Training: ',
                    epoch=epoch)
            # a mid-epoch resume can skip EVERY batch of the restored
            # epoch (preempted between its last step-save and the next
            # epoch's first) -- then there are no fresh loss means
            D_loss_ep.append(loss_mean.get('disc', float('nan')))
            G_loss_ep.append(loss_mean.get('gen', float('nan')))
            if elapsed > 0:
                print(f"  {n_images} images in {elapsed:.1f}s "
                      f"({n_images / elapsed:.1f} img/s)")

            if self.neptune_config is not None and loss_mean:
                self.neptune_config['train/gen_loss'].append(
                    loss_mean['gen'])
                self.neptune_config['train/disc_loss'].append(
                    loss_mean['disc'])

            loss_mean, _, _ = self._run_epoch(
                val_data, train=False, desc='Validation: ')

            # loss_mean can be empty (empty validation loader) -- same
            # guard as the train side above
            if self.neptune_config is not None and loss_mean:
                self.neptune_config['eval/gen_loss'].append(
                    loss_mean['gen'])
                self.neptune_config['eval/disc_loss'].append(
                    loss_mean['disc'])

            # plateau steps on the VALIDATION means, exponential on the
            # epoch count (reference trainer.py:266-273)
            gen_sched.epoch_end(epoch, loss_mean.get('gen'))
            dsc_sched.epoch_end(epoch, loss_mean.get('disc'))

            if epoch % save_freq == 0:
                self.save(epoch)

            if self.save_every_steps:
                # mark the epoch complete: the rolling state now says
                # "epoch+1, nothing done", so a crash between epochs
                # resumes cleanly and no stale mid-epoch metadata can
                # rewind a later run. loader_epoch = the loader
                # iteration the NEXT epoch consumes.
                le = getattr(train_data, '_epoch', None)
                self._save_step_state(
                    epoch + 1, 0,
                    loader_epoch=None if le is None else le + 1)

        if self.checkpoint_format == 'orbax' and self.save_optimizer_state:
            from ..utils import orbax_ckpt
            orbax_ckpt.wait()  # commit any in-flight async save

        self.start = epochs + 1
        return G_loss_ep, D_loss_ep

    def _run_epoch(self, data, train, desc, epoch=None):
        if hasattr(data, 'shuffle'):
            data.shuffle()
        step = None  # fetched per batch (s2d gate needs the shape)
        pbar = tqdm.tqdm(data, desc=desc, dynamic_ncols=True)
        sums = defaultdict(float)
        count = 0
        pending = None  # one-step delay: don't stall the device pipeline
        n_images = 0
        done_before = self._resume_skip_batches if train else 0
        # when the loader performs the skip itself (skip_next), the
        # consumer must not skip again -- but step-save numbering still
        # counts the already-trained batches
        skip = 0 if getattr(self, '_resume_skip_delegated', False) \
            else done_before
        if train:
            self._resume_skip_batches = 0
            self._resume_skip_delegated = False
        batches_done = done_before
        t0 = time.perf_counter()
        for input_img, target_mask in pbar:
            if skip > 0:
                # mid-epoch resume: these batches were trained before
                # the interruption (state already reflects them)
                skip -= 1
                continue
            n_images += np.shape(input_img)[0]
            x, y = self._place_batch(input_img, target_mask)
            step = self._get_step(train, self._use_s2d(x))
            if train:
                self.state, losses = step(self.state, x, y)
                batches_done += 1
                if self.save_every_steps and \
                        batches_done % self.save_every_steps == 0:
                    self._save_step_state(
                        epoch, batches_done,
                        loader_epoch=getattr(data, '_epoch', None))
            else:
                losses = step(self.state, x, y)
            if pending is not None:
                self._accumulate(sums, pending)
                count += 1
                pbar.set_postfix_str(self._format_losses(sums, count))
            pending = losses
        if pending is not None:
            self._accumulate(sums, pending)
            count += 1
            pbar.set_postfix_str(self._format_losses(sums, count))
        elapsed = time.perf_counter() - t0
        loss_mean = {k: v / max(count, 1) for k, v in sums.items()}
        return loss_mean, n_images, elapsed

    @staticmethod
    def _accumulate(sums, losses):
        for key, value in losses.items():
            sums[key] += float(value)

    @staticmethod
    def _format_losses(sums, count):
        return " ".join(f"{key}: {value / count:.2e}"
                        for key, value in sums.items())

    # ------------------------------------------------------------------
    # checkpointing (reference trainer.py:281-321)
    # ------------------------------------------------------------------
    def save(self, epoch):
        gen_savefile = f'{self.savefolder}generator_ep_{epoch:03d}.npz'
        disc_savefile = f'{self.savefolder}discriminator_ep_{epoch:03d}.npz'
        print(f"Saving to {gen_savefile} and {disc_savefile}")
        gen_map, disc_map = self._keymaps()
        g_params = jax.device_get(self.state.g_params)
        d_params = jax.device_get(self.state.d_params)
        ckpt.save_state_dict(gen_savefile,
                             export_state_dict(g_params, gen_map))
        ckpt.save_state_dict(disc_savefile,
                             export_state_dict(d_params, disc_map))
        if self.save_optimizer_state:
            if self.checkpoint_format == 'orbax':
                # async: training continues while bytes commit; any
                # previous in-flight save for this checkpointer is
                # awaited internally by orbax
                from ..utils import orbax_ckpt
                orbax_ckpt.save_async(
                    orbax_ckpt.orbax_path(self.savefolder, epoch),
                    self.state)
            else:
                import flax.serialization
                path = f'{self.savefolder}training_state_ep_{epoch:03d}' \
                       '.msgpack'
                with open(path, 'wb') as f:
                    f.write(flax.serialization.to_bytes(
                        jax.device_get(self.state)))

    def _save_step_state(self, epoch, batches_done, loader_epoch=None):
        """Rolling mid-epoch checkpoint (preemption safety): the full
        TrainState plus progress metadata, overwritten each time so disk
        stays bounded. Crash-atomic: BOTH formats alternate between two
        slot files/directories so the slot the metadata points at is
        never the one being rewritten (single-file tmp+rename alone is
        not enough: a crash between the state rename and the metadata
        rename would leave old metadata naming a file that already
        holds newer state, and resume would skip one batch too few);
        the metadata is written LAST, so a crash mid-save always leaves
        a consistent (metadata -> intact state) pair. On resume,
        _check_step_state re-seeds the slot flip-flop from the metadata
        so the first post-resume save never rewrites the slot the
        metadata points at (chained preemptions stay safe).

        ``loader_epoch`` records which DataLoader iteration epoch
        ``epoch`` consumes, so a CHAINED resume (resume of a resumed
        run) replays the exact shuffle order instead of assuming loader
        iterations == calendar epochs."""
        import json

        self._step_slot = 'b' if getattr(self, '_step_slot', 'b') \
            == 'a' else 'a'
        if self.checkpoint_format == 'orbax':
            from ..utils import orbax_ckpt
            state_path = os.path.join(
                self.savefolder, f'step_state_{self._step_slot}.orbax')
            orbax_ckpt.save_async(state_path, self.state)
            orbax_ckpt.wait()  # metadata must not precede the bytes
        else:
            import flax.serialization
            state_path = os.path.join(
                self.savefolder,
                f'training_state_step_{self._step_slot}.msgpack')
            tmp = state_path + '.tmp'
            with open(tmp, 'wb') as f:
                f.write(flax.serialization.to_bytes(
                    jax.device_get(self.state)))
            os.replace(tmp, state_path)
        meta_path = os.path.join(self.savefolder, 'step_state.json')
        tmp = meta_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump({'epoch': int(epoch),
                       'batches_done': int(batches_done),
                       'loader_epoch': loader_epoch,
                       'state': os.path.basename(state_path)}, f)
        os.replace(tmp, meta_path)

    def _check_step_state(self):
        """Pick up a mid-epoch checkpoint if it is NEWER than the last
        epoch-level checkpoint (i.e. progress into an unsaved epoch)."""
        import json

        meta_path = os.path.join(self.savefolder, 'step_state.json')
        if not os.path.exists(meta_path):
            return
        try:
            with open(meta_path) as f:
                meta = json.load(f)
            state_path = os.path.join(self.savefolder, meta['state'])
            if meta['epoch'] < self.start or not os.path.exists(
                    state_path):
                return
            self._pending_training_state = state_path
            self.start = int(meta['epoch'])
            self._resume_skip_batches = int(meta['batches_done'])
            self._resume_loader_epoch = meta.get('loader_epoch')
            # re-seed the two-slot flip-flop from the surviving slot so
            # the next _save_step_state writes the OTHER slot (never
            # the one the metadata still points at)
            slot = re.search(r'_([ab])\.(orbax|msgpack)$', meta['state'])
            if slot:
                self._step_slot = slot.group(1)
            print(f"Found mid-epoch checkpoint: epoch {self.start}, "
                  f"{self._resume_skip_batches} batches done")
        except Exception as e:
            print(f"Ignoring unreadable step checkpoint: {e}")

    def load(self, generator_save, discriminator_save):
        print(generator_save, discriminator_save)
        gen_sd = ckpt.load_state_dict(generator_save)
        disc_sd = ckpt.load_state_dict(discriminator_save)
        gen_map, disc_map = self._keymaps()
        g_params, g_count = load_transfer_data(
            self.state.g_params, gen_sd, gen_map, verbose=False)
        d_params, d_count = load_transfer_data(
            self.state.d_params, disc_sd, disc_map, verbose=False)
        if g_count < len(gen_map) or d_count < len(disc_map):
            raise ValueError(
                f"Checkpoint mismatch: loaded {g_count}/{len(gen_map)} "
                f"generator and {d_count}/{len(disc_map)} discriminator "
                "weights")
        self.state = self.state._replace(g_params=g_params,
                                         d_params=d_params)
        gfname = os.path.basename(generator_save)
        dfname = os.path.basename(discriminator_save)
        print(f"Loaded checkpoints from {gfname} and {dfname}")

    def load_last_checkpoint(self):
        try:
            last, gen_path, disc_path = ckpt.find_last_checkpoint(
                self.savefolder)
            self.load(gen_path, disc_path)
            self.start = last + 1
            state_path = f'{self.savefolder}training_state_ep_' \
                         f'{last:03d}.msgpack'
            from ..utils.orbax_ckpt import orbax_path
            opath = orbax_path(self.savefolder, last)
            if os.path.isdir(opath):
                # applied inside train() once fresh optimizers exist
                self._pending_training_state = opath
            elif os.path.exists(state_path):
                self._pending_training_state = state_path
        except Exception as e:
            print(e)
            print("Checkpoints not loaded")
        # a mid-epoch (preemption) checkpoint supersedes epoch files
        # when it is further along; it carries the FULL train state so
        # it also works when no epoch checkpoint exists yet
        self._check_step_state()

    # ------------------------------------------------------------------
    # transfer learning (reference train.py:112-116)
    # ------------------------------------------------------------------
    def load_transfer_checkpoints(self, gen_checkpoint, disc_checkpoint):
        '''Shape-matched partial load of torch/.npz checkpoints for
        transfer learning (reference transfer.py:8-22 semantics).'''
        gen_map, disc_map = self._keymaps()
        gen_sd = ckpt.load_state_dict(gen_checkpoint)
        g_params, _ = load_transfer_data(self.state.g_params, gen_sd,
                                         gen_map)
        disc_sd = ckpt.load_state_dict(disc_checkpoint)
        d_params, _ = load_transfer_data(self.state.d_params, disc_sd,
                                         disc_map)
        self.state = self.state._replace(g_params=g_params,
                                         d_params=d_params)
