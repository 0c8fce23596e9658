"""Is the duplicated discriminator-fake forward CSE'd by XLA?

The fused train step (train/steps.py) traces the discriminator forward
on (x, gen_img) TWICE with the same parameters: once inside the
generator's value_and_grad (the adversarial term needs d(D)/d(gen_img))
and once inside the discriminator's own loss (which needs d(D)/d(d_params)
on stop_gradient(gen_img) — the identical tensor at HLO level). If XLA's
CSE folds the two forwards, the program already runs the minimal
  1x D-fake forward + 1x dgrad-only chain (G side, wgrads DCE'd)
  + 1x full backward (D side)
and a manual shared-vjp restructure has nothing to win. If it does NOT,
one D-fake forward (~0.5-1 ms at batch 16 / 256px / ndf=64) is on the
table.

Method: compile the shipping step (CPU backend is fine — CSE runs in
target-independent HLO passes; optionally on TPU with --tpu) at small
nf and count `convolution(`/custom conv ops in the optimized HLO, then
compare against (a) a step whose d_loss REUSES the g-side disc_fake via
a shared jax.vjp, and (b) the analytic expectation.

Usage:  python benchmarks/disc_cse_probe.py [--tpu] [--nf 8]
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

if '--tpu' not in sys.argv:
    import jax
    jax.config.update('jax_platforms', 'cpu')
else:
    import jax

import jax.numpy as jnp


def conv_count(compiled):
    txt = compiled.as_text()
    return len(re.findall(r'= \S+ convolution\(', txt)) + \
        len(re.findall(r'kCustomFusionKind="conv', txt))


def main():
    nf = int(sys.argv[sys.argv.index('--nf') + 1]) \
        if '--nf' in sys.argv else 8
    size, batch = 128, 2

    import numpy as np
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=nf, final_act='sigmoid',
               dtype=jnp.bfloat16)
    disc = Discriminator(input_nc=4, ndf=nf, n_layers=3,
                         dtype=jnp.bfloat16)
    gen_tx = make_optimizer(1e-3)
    disc_tx = make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, size, size, 3), 1, gen_tx,
                             disc_tx, seed=0)
    step = make_train_step(gen, disc, gen_tx, disc_tx)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(batch, size, size, 3)).astype(np.float32)
    y = (rng.uniform(size=(batch, size, size, 1)) > 0.5).astype(np.float32)

    compiled = jax.jit(step, donate_argnums=(0,)).lower(state, x, y) \
        .compile()
    n_step = conv_count(compiled)

    # Forward-only references to calibrate: G fwd conv count, D fwd count
    g_fwd = jax.jit(lambda p, x: gen.apply({'params': p}, x,
                                           train=False)).lower(
        state.g_params, x).compile()
    d_fwd = jax.jit(lambda p, x, m: disc.apply({'params': p}, x, m)).lower(
        state.d_params, x, y).compile()
    n_g, n_d = conv_count(g_fwd), conv_count(d_fwd)

    # The same G+D losses with the fake-side D forward SHARED via one
    # jax.vjp (grads wrt both d_params and gen_img; unused outputs of
    # each pullback call are DCE'd by XLA).
    from patchgan_tpu.ops.losses import bce_loss, fc_tversky
    import optax

    def seg_loss(gi, yy):
        return fc_tversky(yy, gi, beta=0.75, gamma=0.75) * 200.0

    def shared_step(state, x, y):
        dropout_rng = jax.random.fold_in(state.rng, state.step)

        gen_img, g_vjp = jax.vjp(
            lambda gp: gen.apply({'params': gp}, x, train=True,
                                 rngs={'dropout': dropout_rng}),
            state.g_params)
        disc_fake, d_vjp = jax.vjp(
            lambda dp, gi: disc.apply({'params': dp}, x, gi),
            state.d_params, gen_img)

        seg, seg_vjp = jax.vjp(lambda gi: seg_loss(gi, y), gen_img)
        gdisc, adv_vjp = jax.vjp(
            lambda df: bce_loss(df, jnp.ones_like(df)), disc_fake)
        (ct_df,) = adv_vjp(jnp.ones_like(gdisc))
        _, ct_gi_adv = d_vjp(ct_df)           # wgrads here are DCE'd
        (ct_gi_seg,) = seg_vjp(jnp.ones_like(seg))
        (g_grads,) = g_vjp(ct_gi_seg + ct_gi_adv)
        g_loss = seg + gdisc
        g_updates, g_opt_state = gen_tx.update(
            g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # D update: real side normal grad; fake side through the SAME vjp
        loss_fake, fake_vjp = jax.vjp(
            lambda df: bce_loss(df, jnp.zeros_like(df)), disc_fake)
        (ct_df_d,) = fake_vjp(jnp.ones_like(loss_fake) / 2.0)
        d_grads_fake, _ = d_vjp(ct_df_d)      # input-dgrad tail DCE'd

        def d_real_loss(dp):
            dr = disc.apply({'params': dp}, x, y.astype(gen_img.dtype))
            return bce_loss(dr, jnp.ones_like(dr)) / 2.0
        loss_real, d_grads_real = jax.value_and_grad(d_real_loss)(
            state.d_params)
        d_grads = jax.tree.map(jnp.add, d_grads_fake, d_grads_real)
        d_updates, d_opt_state = disc_tx.update(
            d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        from patchgan_tpu.train.steps import TrainState
        new_state = TrainState(g_params, d_params, g_opt_state,
                               d_opt_state, state.step + 1, state.rng)
        losses = {'gen': g_loss, 'disc': loss_real + 2.0 * loss_fake}
        return new_state, losses

    shared = jax.jit(shared_step, donate_argnums=(0,)).lower(
        state, x, y).compile()
    n_shared = conv_count(shared)

    print(f"G fwd convs: {n_g}   D fwd convs: {n_d}")
    print(f"shipping step convs: {n_step}")
    print(f"shared-vjp step convs: {n_shared}")
    print("verdict:", "CSE already folds the duplicate D-fake forward"
          if n_step <= n_shared else
          f"DUPLICATE FORWARD SURVIVES (+{n_step - n_shared} convs)")


if __name__ == '__main__':
    main()
