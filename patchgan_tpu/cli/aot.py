"""``patchgan_aot`` — pre-flight AOT validation against a TPU topology.

Compiles the full training step for a DETACHED TPU topology
(``jax.experimental.topologies``) — no TPU hardware needed — and
reports what a production launch wants to know BEFORE burning quota:

- does the config compile at this mesh shape (dp x tp) at all;
- XLA's cost analysis: FLOPs/step, HBM bytes, the compiler's own
  optimal-seconds step-time bound and the img/s ceiling it implies;
- XLA's memory analysis: argument/temp/output/peak bytes per device,
  checked against the device kind's HBM capacity ("will it fit").

This is a TPU-native capability with no reference equivalent (the
reference discovers OOMs and shape errors at runtime on the GPU); it
reuses the exact shipping step (s2d boundary form by default) and the
real parallel-mode shardings (parallel/{mesh,sharding}.py), so what
validates here is what ``patchgan_train`` runs.

Examples:
    patchgan_aot --topology v5e:2x4 -c train_coco.yaml
    patchgan_aot --topology v5e:4x4 --dp 8 --tp 2 --batch 64
    patchgan_aot --topology v4:2x2x2 --gen-filts 128 --size 512

Prints human-readable lines, then ONE machine-readable JSON line.
"""

import argparse
import json
import sys

# HBM per chip by device-kind substring (GiB); best-effort table --
# unknown kinds report fits=null rather than guessing
_HBM_GIB = (
    ('v5 lite', 16), ('v5litepod', 16), ('v5e', 16),
    ('v6 lite', 32), ('v6e', 32),
    ('v5p', 95), ('v5', 95),
    ('v4', 32),
    ('v3', 32),
    ('v2', 16),
)


def _hbm_bytes(device_kind):
    kind = device_kind.lower()
    for sub, gib in _HBM_GIB:
        if sub in kind:
            return gib * (1 << 30)
    return None


def patchgan_aot(argv=None):
    parser = argparse.ArgumentParser(
        prog='patchgan_aot',
        description='Compile-check a training config against a TPU '
                    'topology without TPU hardware')
    parser.add_argument('--topology', required=True,
                        help="target topology, e.g. 'v5e:2x4', "
                             "'v4:2x2x2' (jax.experimental.topologies)")
    parser.add_argument('-c', '--config_file', default=None,
                        help='train YAML (model_params / train_params); '
                             'optional — flags below override/replace')
    parser.add_argument('--dp', type=int, default=None,
                        help='data-parallel ways (default: all devices '
                             '/ tp)')
    parser.add_argument('--tp', type=int, default=1,
                        help='tensor-parallel ways (conv output-channel '
                             'sharding, parallel/sharding.py)')
    parser.add_argument('--batch', type=int, default=16,
                        help='GLOBAL batch size')
    parser.add_argument('--size', type=int, default=None,
                        help='image size (default: dataset.size or 256)')
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['float32', 'bfloat16'])
    parser.add_argument('--gen-filts', type=int, default=None)
    parser.add_argument('--disc-filts', type=int, default=None)
    parser.add_argument('--no-s2d', action='store_true',
                        help='compile the plain boundary form instead '
                             'of the shipping space-to-depth one')
    parser.add_argument('--shadow', action='store_true',
                        help='compile the resident-shadow step variant '
                             '(the AUTO-path Trainer default)')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import Discriminator, UNet
    from ..train.steps import (init_train_state, make_optimizer,
                               make_shadows, make_train_step)

    # ---- config -> model/step hyperparams --------------------------
    gen_filts, disc_filts, n_layers = 64, 64, 3
    in_channels, out_channels, size = 3, 1, 256
    loss_kwargs = {}
    if args.config_file:
        from ..utils.config import load_config, model_params
        config = load_config(args.config_file)
        gcfg, dcfg = model_params(config)
        gen_filts, disc_filts = gcfg['filters'], dcfg['filters']
        n_layers = dcfg['n_layers']
        ds = config.get('dataset', {})
        size = ds.get('size', size)
        out_channels = len(ds.get('labels', [1])) \
            if ds.get('type') in ('COCOStuff', 'TarShards') \
            else ds.get('out_channels', 1)
        in_channels = ds.get('in_channels', 3)
        tp = config.get('train_params', {})
        loss_kwargs = dict(
            loss_type=tp.get('loss_type', 'tversky'),
            seg_alpha=float(tp.get('seg_alpha', 200.0)))
        if loss_kwargs['loss_type'] == 'fc_tversky':
            loss_kwargs['loss_type'] = 'tversky'
    if args.gen_filts:
        gen_filts = args.gen_filts
    if args.disc_filts:
        disc_filts = args.disc_filts
    if args.size:
        size = args.size
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    s2d = not args.no_s2d and size % 2 == 0

    # ---- topology + mesh --------------------------------------------
    topo = topologies.get_topology_desc(platform='tpu',
                                        topology_name=args.topology)
    n_dev = len(topo.devices)
    tp_ways = args.tp
    dp_ways = args.dp if args.dp else n_dev // tp_ways
    if dp_ways * tp_ways != n_dev:
        parser.error(f'dp ({dp_ways}) x tp ({tp_ways}) must equal the '
                     f'{n_dev} devices of {args.topology}')
    if args.batch % dp_ways:
        parser.error(f'--batch {args.batch} must divide over dp='
                     f'{dp_ways}')
    if tp_ways > 1:
        from ..parallel.sharding import (DATA_AXIS, hybrid_state_shardings)
        mesh = topologies.make_mesh(topo, (dp_ways, tp_ways),
                                    ('data', 'model'))
    else:
        DATA_AXIS = 'data'
        mesh = topologies.make_mesh(topo, (n_dev,), (DATA_AXIS,))

    # ---- abstract state + shardings ---------------------------------
    gen = UNet(input_nc=in_channels, output_nc=out_channels,
               nf=gen_filts, final_act='sigmoid', dtype=dtype, s2d=s2d)
    disc = Discriminator(input_nc=in_channels + out_channels,
                         ndf=disc_filts, n_layers=n_layers, dtype=dtype,
                         s2d=s2d)
    # mirror the Trainer's SHIPPING default (trainer.py adam_mu_dtype =
    # None -> fp32 first moments): a pre-flight fit verdict computed
    # with bf16 moments would understate what patchgan_train actually
    # allocates and pass configs that OOM for real
    gen_tx = make_optimizer(1e-3, mu_dtype=None)
    disc_tx = make_optimizer(1e-3, mu_dtype=None)
    state = jax.eval_shape(
        lambda: init_train_state(gen, disc, (1, size, size, in_channels),
                                 out_channels, gen_tx, disc_tx, seed=0))
    if tp_ways > 1:
        shardings = hybrid_state_shardings(state, mesh)
    else:
        rep = NamedSharding(mesh, P())
        shardings = jax.tree.map(lambda _: rep, state)
    state = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state, shardings)
    dp_sh = NamedSharding(mesh, P(DATA_AXIS))
    x = jax.ShapeDtypeStruct((args.batch, size, size, in_channels),
                             jnp.float32, sharding=dp_sh)
    y = jax.ShapeDtypeStruct((args.batch, size, size, out_channels),
                             jnp.float32, sharding=dp_sh)

    step = make_train_step(
        gen, disc, gen_tx, disc_tx,
        shadow_dtype=dtype if args.shadow else None, **loss_kwargs)

    # ---- compile ------------------------------------------------------
    kind = topo.devices[0].device_kind
    result = {'metric': 'aot_compile', 'topology': args.topology,
              'device_kind': kind, 'devices': n_dev,
              'mesh': {'data': dp_ways, 'model': tp_ways},
              'batch': args.batch, 'size': size,
              'dtype': args.dtype, 's2d': s2d, 'shadow': args.shadow,
              'gen_filts': gen_filts, 'disc_filts': disc_filts}
    try:
        if args.shadow:
            g16 = jax.eval_shape(
                lambda s: make_shadows(s, dtype), state)
            compiled = jax.jit(step, donate_argnums=(0, 1)) \
                .lower(state, g16, x, y).compile()
        else:
            compiled = jax.jit(step, donate_argnums=(0,)) \
                .lower(state, x, y).compile()
    except Exception as e:
        result.update(compile_ok=False,
                      error=f'{type(e).__name__}: {e}'[:400])
        print(f'COMPILE FAILED for {args.topology}: {e}', file=sys.stderr)
        print(json.dumps(result))
        raise SystemExit(1)

    result['compile_ok'] = True
    cost = compiled.cost_analysis()
    mem = compiled.memory_analysis()
    hbm = _hbm_bytes(kind)
    peak = mem.peak_memory_in_bytes
    # XLA's cost model emits a bogus NEGATIVE optimal_seconds when the
    # program contains collectives (observed with tp>1) -- suppress it
    opt_s = cost.get('optimal_seconds') or None
    if opt_s is not None and opt_s <= 0:
        opt_s = None
    result['cost'] = {
        'flops_per_device': cost.get('flops'),
        'hbm_bytes_per_device': cost.get('bytes accessed'),
        'optimal_seconds': opt_s,
        'img_per_s_ceiling': (round(args.batch / opt_s, 1)
                              if opt_s else None),
    }
    result['memory_per_device'] = {
        'arguments_bytes': mem.argument_size_in_bytes,
        'temp_bytes': mem.temp_size_in_bytes,
        'output_bytes': mem.output_size_in_bytes,
        'peak_bytes': peak,
        'hbm_capacity_bytes': hbm,
        'fits': (peak + mem.argument_size_in_bytes) < hbm
        if hbm else None,
    }

    gib = 1 << 30
    print(f'topology {args.topology} ({kind} x {n_dev}), mesh '
          f'data={dp_ways} model={tp_ways}, batch {args.batch}, '
          f'{size}px, {args.dtype}, s2d={s2d}, shadow={args.shadow}')
    print(f'  compile: OK')
    if opt_s:
        print(f"  cost: {cost.get('flops', 0) / 1e9:.0f} GFLOP/device, "
              f"{cost.get('bytes accessed', 0) / 1e9:.2f} GB HBM "
              f"traffic, optimal step {opt_s * 1e3:.2f} ms "
              f"(<= {args.batch / opt_s:.0f} img/s)")
    fits = result['memory_per_device']['fits']
    print(f"  memory/device: args {mem.argument_size_in_bytes / gib:.2f}"
          f" GiB + peak temps {peak / gib:.2f} GiB"
          + (f" vs {hbm / gib:.0f} GiB HBM -> "
             + ('FITS' if fits else 'DOES NOT FIT') if hbm else
             ' (unknown HBM capacity)'))
    print(json.dumps(result))


if __name__ == '__main__':
    patchgan_aot()
