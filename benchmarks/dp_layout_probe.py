"""Do the donated train-state layouts FIX-POINT under GSPMD on a
multi-device mesh (BASELINE config 5, v5e-8 data-parallel)?

Round-3 context: AUTO boundary layouts ship on single-device meshes
only (train/trainer.py _auto_layout), leaving open whether the
multi-device eager loop pays per-step weight relayouts (VERDICT r3
weak #4). No multi-chip hardware exists here, but jax can AOT-compile
against a DETACHED v5e-8 topology (jax.experimental.topologies), which
gives the real TPU compiler's layout assignment -- strictly stronger
evidence than the virtual CPU mesh (whose layouts are trivially
row-major).

The probe compiles the shipping DP step (s2d form, state replicated,
batch sharded over 'data') exactly as the Trainer's multi-device path
does (plain jit + GSPMD, default boundary layouts) and reports, per
state leaf:
  - input layout == output layout?  (fix-point: donation keeps the
    state in place and NO per-step boundary relayout exists)
  - input layout == default layout? (would an AUTO boundary even
    choose differently)
It then tries Format(Layout.AUTO, <NamedSharding>) boundary formats on
the same program and reports whether AUTO picks non-default layouts
and whether they fix-point -- i.e. whether extending AutoLayoutStep to
meshes could pay at all.

Usage: timeout 580 python benchmarks/dp_layout_probe.py
       [--topology v5e:2x4] [--batch 16]
Prints one JSON line per finding; the last line is the summary.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.experimental.layout import Format, Layout  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

SIZE = 256


def build(mesh, batch):
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)

    gen = UNet(input_nc=3, output_nc=1, nf=64, final_act='sigmoid',
               dtype=jnp.bfloat16, s2d=True)
    disc = Discriminator(input_nc=4, ndf=64, n_layers=3,
                         dtype=jnp.bfloat16, s2d=True)
    gen_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    disc_tx = make_optimizer(1e-3, mu_dtype=jnp.bfloat16)
    # abstract init: shapes only, no device computation (the topology
    # has no attached devices)
    state = jax.eval_shape(
        lambda: init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1,
                                 gen_tx, disc_tx, seed=0))
    step = make_train_step(gen, disc, gen_tx, disc_tx,
                           loss_type='tversky', seg_alpha=200.0)

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P('data'))
    state = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
        state)
    x = jax.ShapeDtypeStruct((batch, SIZE, SIZE, 3), jnp.float32,
                             sharding=dp)
    y = jax.ShapeDtypeStruct((batch, SIZE, SIZE, 1), jnp.float32,
                             sharding=dp)
    return state, step, x, y


def layout_report(name, compiled, state):
    in_fmt = jax.tree.leaves(compiled.input_formats[0][0])
    out_fmt = jax.tree.leaves(compiled.output_formats[0])
    leaves = jax.tree.leaves(state)
    n_mismatch = sum(1 for a, b in zip(in_fmt, out_fmt) if a != b)
    mismatch_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf, a, b in zip(leaves, in_fmt, out_fmt) if a != b)
    print(json.dumps({
        'arm': name, 'state_leaves': len(in_fmt),
        'in_neq_out_layout': n_mismatch,
        'relayout_bytes_per_step': mismatch_bytes}), flush=True)
    for leaf, a, b in list(zip(leaves, in_fmt, out_fmt))[:200]:
        if a != b:
            print(json.dumps({'shape': list(leaf.shape),
                              'in': str(a.layout),
                              'out': str(b.layout)}), flush=True)
    return n_mismatch, [f.layout for f in in_fmt]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--topology', default='v5e:2x4')
    ap.add_argument('--batch', type=int, default=16)
    args = ap.parse_args()

    topo = topologies.get_topology_desc(platform='tpu',
                                        topology_name=args.topology)
    mesh = topologies.make_mesh(topo, (len(topo.devices),), ('data',))
    state, step, x, y = build(mesh, args.batch)

    # the Trainer's multi-device path: plain jit, GSPMD, donated state
    default_c = jax.jit(step, donate_argnums=(0,)) \
        .lower(state, x, y).compile()
    n_default, default_layouts = layout_report('gspmd_default',
                                               default_c, state)

    # could AUTO even help? (Format with per-leaf NamedSharding)
    auto_result = {}
    try:
        rep = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P('data'))
        auto_state_fmt = jax.tree.map(
            lambda _: Format(Layout.AUTO, rep), state)
        auto_c = jax.jit(
            step, donate_argnums=(0,),
            in_shardings=(auto_state_fmt, Format(Layout.AUTO, dp),
                          Format(Layout.AUTO, dp)),
            out_shardings=Format(Layout.AUTO)) \
            .lower(state, x, y).compile()
        n_auto, auto_layouts = layout_report('gspmd_auto', auto_c, state)
        nondefault = sum(1 for a, b in zip(auto_layouts, default_layouts)
                         if a != b)
        auto_result = {'auto_fixpoint_violations': n_auto,
                       'auto_nondefault_layouts': nondefault}
    except Exception as e:
        auto_result = {'auto_error': f'{type(e).__name__}: {e}'[:200]}

    print(json.dumps({
        'metric': 'dp_state_relayouts_per_step',
        'value': n_default,
        'unit': 'leaves',
        'topology': args.topology,
        **auto_result}))


if __name__ == '__main__':
    main()
