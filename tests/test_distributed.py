"""Data-parallel correctness on a forced 8-device CPU mesh (SURVEY.md §4):
the sharded train step must produce the same losses and parameter updates
as the single-device step on the identical concatenated batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchgan_tpu.models import Discriminator, UNet
from patchgan_tpu.parallel.mesh import (batch_sharding, default_mesh,
                                        replicate, shard_batch)
from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                      make_train_step)


@pytest.fixture(scope='module')
def setup():
    gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
               use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=4, n_layers=2, use_pallas=False)
    gen_tx, disc_tx = make_optimizer(1e-3), make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, 128, 128, 3), 1, gen_tx,
                             disc_tx, seed=0)
    step = make_train_step(gen, disc, gen_tx, disc_tx)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(8, 128, 128, 3)).astype(np.float32)
    y = (rng.uniform(size=(8, 128, 128, 1)) > 0.5).astype(np.float32)
    return state, step, x, y


def test_mesh_has_8_devices():
    mesh = default_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device(setup):
    state, step, x, y = setup
    # single device
    single = jax.jit(step)
    new_single, losses_single = single(state, jnp.asarray(x),
                                       jnp.asarray(y))

    # 8-way data parallel
    mesh = default_mesh()
    state_r = replicate(state, mesh)
    xs, ys = shard_batch((x, y), mesh)
    assert xs.sharding == batch_sharding(mesh)
    sharded = jax.jit(step)
    new_sharded, losses_sharded = sharded(state_r, xs, ys)

    for k in losses_single:
        np.testing.assert_allclose(
            np.asarray(losses_single[k]), np.asarray(losses_sharded[k]),
            rtol=2e-4, atol=1e-5)

    for a, b in zip(jax.tree_util.tree_leaves(new_single.g_params),
                    jax.tree_util.tree_leaves(new_sharded.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_single.d_params),
                    jax.tree_util.tree_leaves(new_sharded.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_sharded_losses_replicated_output(setup):
    state, step, x, y = setup
    mesh = default_mesh()
    state_r = replicate(state, mesh)
    xs, ys = shard_batch((x, y), mesh)
    _, losses = jax.jit(step)(state_r, xs, ys)
    # loss scalars must be fully replicated (addressable on any device)
    val = losses['gen']
    assert val.shape == ()
    assert np.isfinite(float(val))


def test_hybrid_data_model_parallel_matches_single_device(setup):
    """2x4 (data x model) mesh: conv kernels sharded over output
    channels, batch over data; GSPMD-inserted collectives must reproduce
    the single-device update."""
    from patchgan_tpu.parallel.sharding import (hybrid_batch_sharding,
                                                hybrid_mesh,
                                                place_hybrid_state)

    state, step, x, y = setup
    single = jax.jit(step)
    new_single, losses_single = single(state, jnp.asarray(x),
                                       jnp.asarray(y))

    mesh = hybrid_mesh(2, 4)
    state_h = place_hybrid_state(state, mesh)
    xs = jax.device_put(x, hybrid_batch_sharding(mesh))
    ys = jax.device_put(y, hybrid_batch_sharding(mesh))
    new_hybrid, losses_hybrid = jax.jit(step)(state_h, xs, ys)

    for k in losses_single:
        np.testing.assert_allclose(
            np.asarray(losses_single[k]), np.asarray(losses_hybrid[k]),
            rtol=5e-4, atol=2e-5)
    # Adam's step-1 update is ~ lr*sign(g): near-zero gradients can flip
    # sign under different reduction orders, bounding stray elements at
    # 2*lr (same tolerance rationale as test_train_step_parity)
    for a, b in zip(jax.tree_util.tree_leaves(new_single.g_params),
                    jax.tree_util.tree_leaves(new_hybrid.g_params)):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b)
        tight = diff <= 2e-4 + 5e-3 * np.abs(b)
        assert np.mean(tight) >= 0.999
        assert np.max(diff) <= 2.5e-3


def test_dcn_mesh_step_matches_single_device(setup):
    """2x4 (dcn x ici) multi-slice mesh, batch sharded over both axes:
    hierarchical gradient reduction must reproduce the single-device
    update (parallel/multihost.py)."""
    from patchgan_tpu.parallel.multihost import (dcn_mesh, replicate_dcn,
                                                 shard_batch_dcn)

    state, step, x, y = setup
    new_single, losses_single = jax.jit(step)(state, jnp.asarray(x),
                                              jnp.asarray(y))

    mesh = dcn_mesh(2, 4)
    assert mesh.axis_names == ('dcn', 'data')
    assert mesh.devices.shape == (2, 4)
    state_d = replicate_dcn(state, mesh)
    xs, ys = shard_batch_dcn((x, y), mesh)
    # each of the 8 chips holds exactly one sample of the batch of 8
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape[0] == 1
    new_dcn, losses_dcn = jax.jit(step)(state_d, xs, ys)

    for k in losses_single:
        np.testing.assert_allclose(
            np.asarray(losses_single[k]), np.asarray(losses_dcn[k]),
            rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_single.g_params),
                    jax.tree_util.tree_leaves(new_dcn.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_process_local_range_partition():
    from patchgan_tpu.parallel.multihost import process_local_range

    # 4 hosts x global batch 16 -> disjoint contiguous quarters
    ranges = [process_local_range(16, i, 4) for i in range(4)]
    assert ranges == [(0, 4), (4, 8), (8, 12), (12, 16)]
    # single process owns everything (this environment)
    assert process_local_range(16) == (0, 16)
    with pytest.raises(ValueError):
        process_local_range(10, 0, 4)


def test_global_batch_from_local_single_process(setup):
    """On one process, make_array_from_process_local_data must accept the
    full batch and produce the same sharded array as shard_batch."""
    from patchgan_tpu.parallel.multihost import (dcn_batch_sharding,
                                                 dcn_mesh,
                                                 global_batch_from_local,
                                                 process_local_range)

    _, _, x, y = setup
    mesh = dcn_mesh(2, 4)
    lo, hi = process_local_range(x.shape[0])
    xs = global_batch_from_local(x[lo:hi], dcn_batch_sharding(mesh))
    assert xs.shape == x.shape
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_spatial_mesh_step_matches_single_device(setup):
    """2x4 (data x spatial) mesh: image HEIGHT sharded over 'spatial'
    (GSPMD inserts conv halo exchanges and turns instance-norm /
    loss reductions into collectives), batch over 'data'. The update
    must reproduce the single-device step (parallel/spatial.py)."""
    from patchgan_tpu.parallel.spatial import (replicate_spatial,
                                               shard_batch_spatial,
                                               spatial_mesh)

    state, step, x, y = setup
    new_single, losses_single = jax.jit(step)(state, jnp.asarray(x),
                                              jnp.asarray(y))

    shardy_before = jax.config.jax_use_shardy_partitioner
    mesh = spatial_mesh(2, 4)
    # spatial_mesh must fall back to legacy GSPMD: Shardy silently
    # miscompiles spatially-sharded conv gradients (repro:
    # benchmarks/repro_shardy_spatial.py)
    assert not jax.config.jax_use_shardy_partitioner
    assert mesh.axis_names == ('data', 'spatial')
    state_s = replicate_spatial(state, mesh)
    xs, ys = shard_batch_spatial((x, y), mesh)
    # every chip owns a (4 samples x 32 rows) tile of the global batch
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape[:2] == (4, 32)
    new_sp, losses_sp = jax.jit(step)(state_s, xs, ys)

    for k in losses_single:
        np.testing.assert_allclose(
            np.asarray(losses_single[k]), np.asarray(losses_sp[k]),
            rtol=5e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_single.g_params),
                    jax.tree_util.tree_leaves(new_sp.g_params)):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b)
        tight = diff <= 2e-4 + 5e-3 * np.abs(b)
        assert np.mean(tight) >= 0.999
        assert np.max(diff) <= 2.5e-3
    jax.config.update('jax_use_shardy_partitioner', shardy_before)


def test_trainer_dp_mesh_s2d_matches_single_device(tmp_path):
    """The Trainer's SHIPPING configuration under data parallelism:
    default 8-device mesh, s2d boundary form on (the default;
    trainer._use_s2d applies it to any non-spatial mesh). Losses must
    match the single-device trainer on the identical batch -- this
    pins that the space-to-depth reshape composes with GSPMD batch
    sharding (N sharded, H/W unsharded)."""
    from patchgan_tpu.train import Trainer

    def make(folder, mesh):
        gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
                   use_pallas=False)
        disc = Discriminator(input_nc=4, ndf=4, n_layers=2,
                             use_pallas=False)
        return Trainer(gen, disc, str(folder), mesh=mesh)

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(8, 128, 128, 3)).astype(np.float32)
    y = (rng.uniform(size=(8, 128, 128, 1)) > 0.5).astype(np.float32)

    t_dp = make(tmp_path / 'dp', default_mesh())
    assert t_dp._use_s2d(x)  # the shipping default under DP
    t_one = make(tmp_path / 'one', default_mesh(jax.devices()[:1]))

    for _ in range(2):
        l_dp = t_dp.batch(x, y, train=True)
        l_one = t_one.batch(x, y, train=True)
        for k in l_one:
            np.testing.assert_allclose(l_dp[k], l_one[k],
                                       rtol=2e-4, atol=1e-5, err_msg=k)


def test_trainer_on_spatial_mesh(tmp_path, setup):
    """Trainer(mesh=spatial_mesh(...)) shards batches N-over-data and
    H-over-spatial and trains finite losses end-to-end."""
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.parallel.spatial import spatial_mesh
    from patchgan_tpu.train import Trainer

    gen = UNet(input_nc=3, output_nc=1, nf=4, final_act='sigmoid',
               use_pallas=False)
    disc = Discriminator(input_nc=4, ndf=4, n_layers=2, use_pallas=False)
    shardy_before = jax.config.jax_use_shardy_partitioner
    try:
        mesh = spatial_mesh(2, 4)
        trainer = Trainer(gen, disc, str(tmp_path / 'ckpt'), mesh=mesh)
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(2, 128, 128, 3)).astype(np.float32)
        y = (rng.uniform(size=(2, 128, 128, 1)) > 0.5).astype(np.float32)
        losses = trainer.batch(x, y, train=True)
        for k, v in losses.items():
            assert np.isfinite(v), k
    finally:
        jax.config.update('jax_use_shardy_partitioner', shardy_before)
