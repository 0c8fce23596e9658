"""End-to-end SAME-TASK training comparison: the PyTorch reference vs
this framework, identical init, identical data, final IoU side by side.

This closes the north-star "equal IoU" claim end to end (BASELINE.json;
VERDICT r2 missing #2): one-step/multi-step numeric parity is pinned by
tests/test_train_step_parity.py, and benchmarks/train_quality.py shows
OUR stack converges — this harness trains BOTH stacks on the identical
synthetic ellipse-segmentation task from the identical initial weights
(exported through the transfer layer) on the identical batch stream,
then evaluates both with the same IoU metric on the same held-out set.

The reference trains exactly as its own Trainer.batch drives it
(/root/reference/patchgan/trainer.py:50-115, Adam per trainer.py:169-172)
on torch-CPU fp32; ours trains through our jitted train step on
whatever backend is active (TPU bf16 under the normal environment —
i.e. the SHIPPING configuration, not a CPU-matched one; pass
--dtype float32 under a CPU-forced env for a bit-level-closer run).

256px is the smallest size the reference supports (its InstanceNorm
sees a 1x1 bottleneck below that and torch raises), so the task runs
at 256px / nf=8 / batch 4 by default. Prints one JSON line with both
IoUs and the delta.
"""

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402

REF_PATH = '/root/reference'
SIZE = 256


def load_reference():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    sys.modules.setdefault('torchinfo', types.SimpleNamespace(
        summary=lambda *a, **k: None))
    tv_io = types.SimpleNamespace(read_image=None, ImageReadMode=None)
    tv_tr = types.SimpleNamespace(Resize=None, Compose=None,
                                  RandomHorizontalFlip=None,
                                  RandomVerticalFlip=None)
    sys.modules.setdefault('torchvision',
                           types.SimpleNamespace(io=tv_io,
                                                 transforms=tv_tr))
    sys.modules.setdefault('torchvision.io', tv_io)
    sys.modules.setdefault('torchvision.transforms', tv_tr)
    from patchgan.disc import Discriminator as TorchDisc
    from patchgan.trainer import Trainer as TorchTrainer
    from patchgan.unet import UNet as TorchUNet
    return TorchUNet, TorchDisc, TorchTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--nf', type=int, default=8)
    ap.add_argument('--dtype', default='bfloat16',
                    choices=['bfloat16', 'float32'])
    ap.add_argument('--eval_n', type=int, default=32)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--skip_torch', action='store_true',
                    help='Only train/eval our side (debugging)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from benchmarks.train_quality import make_data
    from patchgan_tpu.models import Discriminator, UNet
    from patchgan_tpu.train.steps import (init_train_state, make_optimizer,
                                          make_train_step)
    from patchgan_tpu.utils.metrics import iou
    from patchgan_tpu.utils.transfer import (disc_key_map,
                                             export_state_dict,
                                             unet_key_map)

    dtype = jnp.dtype(args.dtype)
    nf = args.nf

    # ---- our models + initial weights (the shared starting point)
    gen = UNet(input_nc=3, output_nc=1, nf=nf, activation='relu',
               final_act='sigmoid', dtype=dtype)
    disc = Discriminator(input_nc=4, ndf=nf, n_layers=2, dtype=dtype)
    gen_tx, disc_tx = make_optimizer(1e-3), make_optimizer(1e-3)
    state = init_train_state(gen, disc, (1, SIZE, SIZE, 3), 1, gen_tx,
                             disc_tx, seed=args.seed)
    step = jax.jit(make_train_step(gen, disc, gen_tx, disc_tx,
                                   loss_type='tversky', seg_alpha=200.0))
    g0 = jax.device_get(state.g_params)
    d0 = jax.device_get(state.d_params)

    # ---- identical data stream for both frameworks
    rng = np.random.default_rng(args.seed)
    pool = 256
    xs, ys = make_data(rng, pool, size=SIZE)
    x_ev, y_ev = make_data(rng, args.eval_n, size=SIZE)
    order = np.concatenate([rng.permutation(pool) for _ in
                            range((args.steps * args.batch) // pool + 1)])
    batches = [order[i * args.batch:(i + 1) * args.batch]
               for i in range(args.steps)]

    # ---- train OURS
    xs_d, ys_d = jax.device_put(xs), jax.device_put(ys)
    t0 = time.time()
    for idx in batches:
        state, losses = step(state, xs_d[np.asarray(idx)],
                             ys_d[np.asarray(idx)])
    jax.block_until_ready(losses['gen'])
    ours_s = time.time() - t0

    fwd = jax.jit(lambda p, x: gen.apply({'params': p}, x, train=False))
    ours_pred = np.asarray(fwd(state.g_params, jnp.asarray(x_ev)),
                           np.float32)
    ours_iou = float(iou(jnp.asarray(y_ev), jnp.asarray(ours_pred)))

    result = {
        'metric': 'torch_vs_ours_final_iou',
        'ours_iou': round(ours_iou, 4),
        'steps': args.steps, 'batch': args.batch, 'nf': nf,
        'size': SIZE, 'dtype': str(dtype),
        'ours_train_seconds': round(ours_s, 1),
    }
    if args.skip_torch:
        print(json.dumps(result))
        return

    # ---- train the REFERENCE from the same weights on the same stream
    TorchUNet, TorchDisc, TorchTrainer = load_reference()
    torch.manual_seed(args.seed)
    tgen = TorchUNet(3, 1, nf=nf, activation='relu', final_act='sigmoid')
    tdisc = TorchDisc(4, ndf=nf, n_layers=2)
    ref = TorchTrainer(tgen, tdisc, '/tmp/torch_vs_ours_ck/',
                       device='cpu')
    # TorchTrainer.__init__ re-runs weights_init -> load ours AFTER

    def load_ours():
        tgen.load_state_dict({
            k: torch.tensor(np.ascontiguousarray(v))
            for k, v in export_state_dict(g0, unet_key_map()).items()})
        tdisc.load_state_dict({
            k: torch.tensor(np.ascontiguousarray(v))
            for k, v in export_state_dict(
                d0, disc_key_map(2, False)).items()})
    load_ours()
    ref.loss_type = 'tversky'
    ref.seg_alpha = 200
    ref.gen_optimizer = torch.optim.Adam(tgen.parameters(), lr=1e-3,
                                         betas=(0.9, 0.999))
    ref.disc_optimizer = torch.optim.Adam(tdisc.parameters(), lr=1e-3,
                                          betas=(0.9, 0.999))

    t0 = time.time()
    for idx in batches:
        xb = torch.tensor(np.transpose(xs[idx], (0, 3, 1, 2)))
        yb = torch.tensor(np.transpose(ys[idx], (0, 3, 1, 2)))
        ref.batch(xb, yb, train=True)
    torch_s = time.time() - t0

    tgen.eval()
    with torch.no_grad():
        preds = []
        for i in range(0, args.eval_n, args.batch):
            xb = torch.tensor(
                np.transpose(x_ev[i:i + args.batch], (0, 3, 1, 2)))
            preds.append(np.transpose(tgen(xb).numpy(), (0, 2, 3, 1)))
    torch_pred = np.concatenate(preds, axis=0)
    import jax.numpy as jnp2
    torch_iou = float(iou(jnp2.asarray(y_ev), jnp2.asarray(torch_pred)))

    result.update({
        'torch_iou': round(torch_iou, 4),
        'delta_iou': round(ours_iou - torch_iou, 4),
        'torch_train_seconds': round(torch_s, 1),
    })
    print(json.dumps(result))


if __name__ == '__main__':
    main()
