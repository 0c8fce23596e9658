"""The fused GAN train/eval step.

The reference's hot loop (Trainer.batch, /root/reference/patchgan/
trainer.py:50-115) runs G forward, G backward+step, then two fresh D
forwards and a D backward+step as separate torch autograd graphs. Here
the ENTIRE alternating update is one jitted function: generator forward,
segmentation + adversarial losses, generator grads/Adam update, then the
discriminator's loss on (real, stop_gradient(fake)) with its own
grads/Adam update — a single XLA program with donated state buffers.

Ordering parity: the discriminator update consumes the generator output
computed BEFORE the generator's optimizer step (the reference computes
gen_img once at trainer.py:63 and reuses it detached at trainer.py:98),
and the generator's adversarial term uses the pre-update discriminator.
Both properties hold here by construction.

Loss-dict parity: the returned scalar dict uses the reference's keys
['gen', 'gen_loss', 'gdisc', 'discr', 'discf', 'disc'] with 'gen' and
'gen_loss' duplicated (trainer.py:109-111).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.losses import (bce_loss, fc_tversky, mae_loss,
                          weighted_bce_loss)


class TrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray
    rng: Any


def _is_frozen(path, freeze_patterns):
    """True iff the '/'-joined tree path starts with a freeze prefix."""
    name = '/'.join(str(getattr(p, 'key', p)) for p in path)
    return any(name.startswith(pat) for pat in freeze_patterns)


def freeze_stop_gradients(params, freeze_patterns):
    """``stop_gradient`` every frozen leaf of ``params``.

    Makes the frozen backward's deletion a TRACE-LEVEL guarantee
    instead of an optimizer-pipeline accident. Measured on this
    toolchain (tests/test_freeze_step.py): at ``every_k=1`` the
    optimizer-side ``set_to_zero`` mask ALONE already lets XLA DCE the
    frozen encoder dgrad/wgrad convs (its ``zeros_like`` updates carry
    no data dependency on the grads), but under gradient ACCUMULATION
    (``every_k>1``, optax.MultiSteps) the accumulator stores the raw
    incoming grads in optimizer state, keeping the frozen backward
    alive -- 88 vs 68 convolutions in the compiled nf=8 step. Cutting
    the cotangents at the parameters turns the frozen grads into
    literal zero constants, so the accumulator update folds and the
    frozen backward is deleted in EVERY optimizer configuration -- the
    TPU-native fine-tune speedup (BASELINE.json config 3: freeze
    encoder, retrain decoder). Numerically exact: the forward is
    untouched and the frozen grads come back as literal zeros, which is
    what the optimizer mask maps them to anyway."""
    if not freeze_patterns:
        return params
    return jax.tree_util.tree_map_with_path(
        lambda path, p: (jax.lax.stop_gradient(p)
                         if _is_frozen(path, freeze_patterns) else p),
        params)


def make_optimizer(learning_rate=1e-3, b1=0.9, b2=0.999, mu_dtype=None,
                   freeze_patterns=(), every_k=1):
    """Adam with betas (0.9, 0.999) (reference trainer.py:169-172), with
    the learning rate exposed as mutable optimizer-state so epoch-level
    LR schedules never retrace the step.

    ``mu_dtype=bfloat16`` stores the first moment in bf16, cutting
    optimizer HBM traffic (the step is bandwidth-bound; measured +4%
    img/s on v5e) at ~0.2% relative moment precision -- used by the CLI
    whenever compute runs in bf16.

    ``freeze_patterns`` freezes parameters whose '/'-joined tree path
    starts with any given prefix (e.g. ('enc',) freezes the whole
    encoder for transfer fine-tuning -- BASELINE.json config 3; the
    reference cannot freeze anything).

    ``every_k`` > 1 enables gradient accumulation (optax.MultiSteps,
    outermost so it also wraps freeze partitions): each step
    accumulates the running MEAN of the gradients and applies the
    optimizer update every k-th step -- effective batch k*B at batch-B
    memory. In the fused GAN step both nets accumulate in lockstep and
    the discriminator always sees the between-applies (frozen)
    generator's output, so the semantics match a true k*B batch (the
    losses are per-sample means; pinned by tests/test_trainer.py)."""
    # hyperparam_dtype pinned to fp32: inject_hyperparams otherwise casts
    # hyperparams to the UPDATES' dtype, and in bf16 b2=0.999 rounds to
    # 1.0 -- zero bias correction, NaN on the first step with bf16 grads
    tx = optax.inject_hyperparams(
        optax.adam, static_args=('mu_dtype',),
        hyperparam_dtype=jnp.float32)(
        learning_rate=learning_rate, b1=b1, b2=b2, mu_dtype=mu_dtype)
    if freeze_patterns:
        def mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: ('frozen'
                                 if _is_frozen(path, freeze_patterns)
                                 else 'train'),
                params)
        tx = optax.multi_transform(
            {'train': tx, 'frozen': optax.set_to_zero()}, mask)
    if every_k and every_k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=every_k)
    return tx


def init_train_state(generator, discriminator, input_shape, out_channels,
                     gen_tx, disc_tx, seed=0):
    """Initialise both param trees and optimizer states.

    input_shape: (N, H, W, C_in) of the generator input.

    The whole initialisation runs as ONE jitted program: un-jitted
    flax ``Module.init`` dispatches ~130 tiny eager ops, each with its
    own compile + dispatch round trip — ~80 s through a remote-TPU
    relay vs ~3-5 s as one program (and near-free on later starts via
    the persistent compilation cache; default layouts, cache-safe).
    Bit-identical values: the RNG/xavier math is exact integer/float
    arithmetic either way (tests/test_models.py init-jit parity).
    """
    def _init(rng):
        g_key, d_key, state_key = jax.random.split(rng, 3)
        # zeros created INSIDE the traced function: XLA represents
        # them as broadcast(0) instead of serialising literal buffers
        # through the remote-compile path
        x = jnp.zeros(input_shape, jnp.float32)
        y = jnp.zeros(input_shape[:3] + (out_channels,), jnp.float32)
        if getattr(generator, 's2d', False):
            # s2d models trace over the boundary form; the parameter
            # tree (shapes and names) is identical either way
            # (ops/s2d.py)
            from ..ops.s2d import space_to_depth
            x, y = space_to_depth(x), space_to_depth(y)
        g_params = generator.init(g_key, x, train=False)['params']
        d_params = discriminator.init(d_key, x, y)['params']
        return TrainState(
            g_params=g_params,
            d_params=d_params,
            g_opt_state=gen_tx.init(g_params),
            d_opt_state=disc_tx.init(d_params),
            step=jnp.zeros((), jnp.int32),
            rng=state_key,
        )

    return jax.jit(_init)(jax.random.PRNGKey(seed))


def make_seg_loss(loss_type, seg_alpha, tversky_beta=0.75,
                  tversky_gamma=0.75, bce_weighting='complement'):
    """Segmentation loss dispatch (reference trainer.py:71-82).

    ``bce_weighting`` selects the per-channel class weights of
    ``weighted_bce`` (all computed per batch, NHWC keepdim over (1,2)
    == the reference's NCHW keepdim over (2,3)):

    - 'complement' (reference trainer.py:76-78): ``1 - share_c`` where
      share_c is class c's per-sample fraction of the batch's positive
      pixels;
    - 'inverse': normalised inverse BATCH frequency, emphasising rare
      classes much harder than the complement form. Shares are computed
      over the whole batch (a class absent from one sample but present
      in the batch keeps a sane weight) and floored at 1/(100*C), so a
      class absent from the entire batch is capped at 100x the uniform
      weight instead of absorbing all gradient signal;
    - 'none': uniform weights (plain BCE scaled by seg_alpha).
    """
    if loss_type == 'tversky':
        def seg(gen_img, y):
            return fc_tversky(y, gen_img, beta=tversky_beta,
                              gamma=tversky_gamma) * seg_alpha
    elif loss_type == 'weighted_bce':
        if bce_weighting not in ('complement', 'inverse', 'none'):
            raise ValueError(
                f"bce_weighting {bce_weighting!r} not in "
                "('complement', 'inverse', 'none')")

        def seg(gen_img, y):
            c = gen_img.shape[-1]
            if c > 1 and bce_weighting != 'none':
                yf = y.astype(jnp.float32)
                if bce_weighting == 'inverse':
                    # batch-level shares, floored so absent classes
                    # cannot absorb all the gradient signal
                    share = (jnp.sum(yf, axis=(0, 1, 2), keepdims=True)
                             / jnp.sum(yf))
                    inv = 1.0 / jnp.maximum(share, 1.0 / (100.0 * c))
                    weight = jnp.broadcast_to(
                        c * inv / jnp.sum(inv), y.shape[:1] + (1, 1, c))
                else:  # 'complement' (reference semantics, per sample)
                    share = (jnp.sum(yf, axis=(1, 2), keepdims=True)
                             / jnp.sum(yf))
                    weight = 1.0 - share
            else:
                weight = jnp.ones_like(y, dtype=jnp.float32)
            return weighted_bce_loss(gen_img, y, weight) * seg_alpha
    elif loss_type == 'MAE':
        def seg(gen_img, y):
            return mae_loss(gen_img, y) * seg_alpha
    else:
        raise ValueError(f"Unknown loss_type: {loss_type!r}")
    return seg


def gan_losses(generator, discriminator, seg_loss, g_params, d_params,
               x, y, train, dropout_rng, s2d=False):
    """Shared forward-pass/loss computation for train and eval.

    ``s2d=True``: x/y are space-to-depth tensors, the models carry the
    matching flag, and the segmentation loss sees ``fold_blocks`` views
    (same per-(sample, class) pixel multisets as the original layout, so
    every loss in ops/losses.py -- elementwise terms plus per-sample/
    per-class reductions -- is exactly preserved; ops/s2d.py).
    """
    rngs = {'dropout': dropout_rng} if train else None
    gen_img = generator.apply({'params': g_params}, x, train=train,
                              rngs=rngs)
    disc_fake = discriminator.apply({'params': d_params}, x, gen_img)
    if s2d:
        from ..ops.s2d import fold_blocks
        seg = seg_loss(fold_blocks(gen_img), fold_blocks(y))
    else:
        seg = seg_loss(gen_img, y)
    gdisc = bce_loss(disc_fake, jnp.ones_like(disc_fake))
    return seg + gdisc, (gen_img, gdisc)


def disc_real_fake(discriminator, d_params, x, y, gen_img,
                   merged=True, paired=False):
    """Discriminator outputs on the real and fake pairs.

    ``merged=True`` runs ONE forward on the two pairs stacked along the
    batch axis instead of two separate forwards (reference
    trainer.py:96-99). Every discriminator op -- conv, instance norm,
    activation -- is per-sample, so the stacked forward is numerically
    identical while halving weight re-reads and op count.
    Measured on v5e (benchmarks/variants.py): 958 vs 970 img/s on the
    batch-16 headline step -- the input concat costs slightly more than
    the halved op count saves, so the default stays False; the merged
    form is kept for the (cheaper) eval step and small-batch regimes.

    ``paired=True`` (real Discriminator modules only) runs the module's
    tuple-of-masks form: conv0's image-part value is SHARED between the
    real and fake branches, so its weight gradient is ONE contraction
    of the summed cotangents instead of two (models/disc.py). Forward
    bit-identical to the separate calls; see BENCHMARKS.md "paired
    discriminator" for the measured step effect.
    """
    if paired:
        return discriminator.apply(
            {'params': d_params}, x,
            (y.astype(gen_img.dtype), gen_img))
    if merged:
        both = discriminator.apply(
            {'params': d_params},
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([y.astype(gen_img.dtype), gen_img], axis=0))
        return jnp.split(both, 2, axis=0)
    disc_real = discriminator.apply({'params': d_params}, x, y)
    disc_fake = discriminator.apply({'params': d_params}, x, gen_img)
    return disc_real, disc_fake


def resolve_paired_disc(paired_disc, merged_disc, discriminator):
    """Resolve whether the train step uses the paired-discriminator
    form (models/disc.py tuple-of-masks apply; shared conv0 image-part
    wgrad).

    Precedence: an explicit ``paired_disc`` wins; an EXPLICIT
    ``merged_disc=True`` keeps the merged (batch-stacked) form --
    disc_real_fake resolves paired before merged, so defaulting paired
    on would make merged_disc a silent no-op (it is an A/B arm in
    benchmarks/variants.py). Otherwise paired defaults ON for real
    Discriminator modules (duck-typed test heads lack the tuple
    signature) since the measured verdict (BENCHMARKS.md "paired
    discriminator": +0.6%/+1.0% in two shipping-regime A/Bs, forward
    bit-exact). The PATCHGAN_PAIRED_DISC env gate is read at TRACE
    time so A/B harnesses can override per compile; =off opts out.
    """
    if paired_disc is not None:
        return paired_disc
    if merged_disc:
        return False
    import os
    return (hasattr(discriminator, 's2d')
            and os.environ.get('PATCHGAN_PAIRED_DISC', 'on').lower()
            not in ('off', '0', 'false'))


def make_shadows(state, dtype):
    """Compute-dtype shadow of the GENERATOR param tree (see
    make_train_step's ``shadow_dtype``). Exactly the casts the model
    would apply internally, hoisted out so they can live across the jit
    boundary. Generator only: every G param is consumed at a single
    site per loss, so pre-casting is bit-exact -- the discriminator is
    applied twice in its loss (real + fake) and its master-dtype grad
    accumulation across the two applies must stay in the master dtype,
    so D keeps the per-site casts."""
    return jax.tree.map(lambda p: p.astype(dtype), state.g_params)


def make_train_step(generator, discriminator, gen_tx, disc_tx,
                    loss_type='tversky', seg_alpha=200.0,
                    tversky_beta=0.75, tversky_gamma=0.75,
                    grad_dtype=None, merged_disc=False,
                    bce_weighting='complement', s2d=None,
                    shadow_dtype=None, freeze_patterns=(),
                    paired_disc=None):
    """Build the fused G+D train step.

    ``grad_dtype`` (e.g. bfloat16) casts both gradient trees before the
    optimizer update, halving gradient HBM traffic; Adam's second-moment
    accumulation still runs in the optimizer-state dtype. ``merged_disc``
    batches the discriminator's real+fake forwards (see disc_real_fake).
    ``s2d`` (default: follow the generator's flag) converts x/y to their
    space-to-depth form at step entry so no full-resolution few-channel
    tensor exists inside the program (ops/s2d.py).

    ``shadow_dtype`` (e.g. bfloat16) changes the step signature to
    ``step(state, g_shadow, x, y) -> (state, g_shadow, losses)`` where
    ``g_shadow = make_shadows(state, shadow_dtype)`` carries the
    GENERATOR param tree pre-cast to the compute dtype ACROSS the jit
    boundary. The model consumes the shadow (bit-identical to its
    internal per-site ``kernel.astype(dtype)`` casts -- every conv
    computes in the module dtype, fp32 heads only cast conv OUTPUTS,
    models/blocks.py; each G param has a single consumption site per
    loss so pre-casting commutes with autodiff exactly), grads are
    converted back to the master dtype before the optimizer exactly
    where the cast's autodiff would have, and a fresh shadow is emitted
    from the updated masters. Net effect on v5e: the fp32 G masters are
    touched ONLY by elementwise optimizer ops, so under AUTO boundary
    layouts they settle into the wgrad-producing layout and the
    per-step f32 kernel relayout copies (~1.9 ms/step of the round-4
    profile, BENCHMARKS.md) disappear; any residual layout conflict is
    paid once on the half-width bf16 shadow instead. The discriminator
    keeps master-dtype consumption (see make_shadows).

    ``freeze_patterns`` must mirror the generator optimizer's freeze
    mask (make_optimizer): frozen leaves are stop_gradient'ed inside
    the generator loss so the frozen backward is DELETED from the
    compiled program in every optimizer configuration -- required
    under gradient accumulation, where the MultiSteps accumulator
    would otherwise keep the frozen grads live (freeze_stop_gradients;
    BASELINE.json config 3).
    """
    seg_loss = make_seg_loss(loss_type, seg_alpha, tversky_beta,
                             tversky_gamma, bce_weighting)
    if s2d is None:
        s2d = getattr(generator, 's2d', False)
    def _paired_disc():
        return resolve_paired_disc(paired_disc, merged_disc,
                                   discriminator)

    def cast_grads(grads):
        if grad_dtype is None:
            return grads
        return jax.tree.map(lambda g: g.astype(grad_dtype), grads)

    def master_grads(grads, masters):
        # the cast the autodiff of the models' internal astype would
        # insert: cotangents flow back in the master dtype
        return jax.tree.map(lambda g, p: g.astype(p.dtype), grads,
                            masters)

    def train_step(state, x, y, g_shadow=None, d_shadow=None):
        dropout_rng = jax.random.fold_in(state.rng, state.step)
        if s2d:
            from ..ops.s2d import space_to_depth
            x, y = space_to_depth(x), space_to_depth(y)
        g_fwd = state.g_params if g_shadow is None else g_shadow
        d_fwd = state.d_params if d_shadow is None else d_shadow

        def g_loss_fn(g_params):
            g_params = freeze_stop_gradients(g_params, freeze_patterns)
            return gan_losses(generator, discriminator, seg_loss, g_params,
                              d_fwd, x, y, True, dropout_rng, s2d)

        (g_loss, (gen_img, gdisc)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_fwd)
        if g_shadow is not None:
            g_grads = master_grads(g_grads, state.g_params)
        g_updates, g_opt_state = gen_tx.update(
            cast_grads(g_grads), state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        gen_img = jax.lax.stop_gradient(gen_img)

        def d_loss_fn(d_params):
            disc_real, disc_fake = disc_real_fake(
                discriminator, d_params, x, y, gen_img,
                merged=merged_disc, paired=_paired_disc())
            loss_real = bce_loss(disc_real, jnp.ones_like(disc_real))
            loss_fake = bce_loss(disc_fake, jnp.zeros_like(disc_fake))
            return (loss_fake + loss_real) / 2.0, (loss_real, loss_fake)

        (d_loss, (loss_real, loss_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_fwd)
        if d_shadow is not None:
            d_grads = master_grads(d_grads, state.d_params)
        d_updates, d_opt_state = disc_tx.update(
            cast_grads(d_grads), state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        losses = {'gen': g_loss, 'gen_loss': g_loss, 'gdisc': gdisc,
                  'discr': loss_real, 'discf': loss_fake, 'disc': d_loss}
        new_state = TrainState(g_params, d_params, g_opt_state, d_opt_state,
                               state.step + 1, state.rng)
        return new_state, losses

    if shadow_dtype is None:
        return train_step

    def shadow_step(state, g_shadow, x, y):
        new_state, losses = train_step(state, x, y, g_shadow=g_shadow)
        return new_state, make_shadows(new_state, shadow_dtype), losses

    return shadow_step


def make_eval_step(generator, discriminator, loss_type='tversky',
                   seg_alpha=200.0, tversky_beta=0.75, tversky_gamma=0.75,
                   compute_iou=False, bce_weighting='complement'):
    """Validation pass: same losses, no parameter updates, dropout off
    (the reference switches to model.eval() for validation,
    trainer.py:239-250). Optionally also reports mean IoU of the
    generated masks (a metric the reference lacks; BASELINE.json asks
    for IoU parity)."""
    seg_loss = make_seg_loss(loss_type, seg_alpha, tversky_beta,
                             tversky_gamma, bce_weighting)
    s2d = getattr(generator, 's2d', False)

    def eval_step(state, x, y):
        if s2d:
            from ..ops.s2d import space_to_depth
            x, y = space_to_depth(x), space_to_depth(y)
        g_loss, (gen_img, gdisc) = gan_losses(
            generator, discriminator, seg_loss, state.g_params,
            state.d_params, x, y, False, None, s2d)
        disc_real, disc_fake = disc_real_fake(
            discriminator, state.d_params, x, y, gen_img)
        loss_real = bce_loss(disc_real, jnp.ones_like(disc_real))
        loss_fake = bce_loss(disc_fake, jnp.zeros_like(disc_fake))
        d_loss = (loss_fake + loss_real) / 2.0
        losses = {'gen': g_loss, 'gen_loss': g_loss, 'gdisc': gdisc,
                  'discr': loss_real, 'discf': loss_fake, 'disc': d_loss}
        if compute_iou:
            from ..utils.metrics import iou
            if s2d:
                from ..ops.s2d import fold_blocks
                losses['iou'] = iou(fold_blocks(y), fold_blocks(gen_img))
            else:
                losses['iou'] = iou(y, gen_img)
        return losses

    return eval_step
