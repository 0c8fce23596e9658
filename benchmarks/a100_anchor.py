"""Derive the A100 anchor for bench.py's vs_baseline from first principles.

The reference publishes no benchmark numbers (BASELINE.md), and no GPU
exists in this environment to measure it, so the anchor must be derived:
instrument the ACTUAL reference torch models (imported read-only from
/root/reference) with forward hooks, count per-op FLOPs and eager fp32
HBM bytes for the full Trainer.batch step composition
(/root/reference/patchgan/trainer.py:50-115), and roofline the result
against A100 peak TF32 tensor-core throughput and HBM bandwidth.

Step composition counted (trainer.py:50-115):
  G forward x1, G backward x1 (~2x fwd FLOPs: dgrad+wgrad)
  D forward x3 (fake-attached :65, real :96, fake-detached :98)
  D backward: dgrad-only through the attached fake (gen step), plus
  full dgrad+wgrad for real and detached fake (disc step) => ~2.5x one
  D fwd in FLOPs, 3x in eager bytes.

Eager fp32 byte accounting per op: read inputs + weights, write outputs
(no cross-op fusion -- torch eager materialises every intermediate);
backward re-reads saved activations and writes gradient tensors, which
we count as 2x the forward bytes (standard eager estimate); Adam adds
9 floats/param of optimizer traffic.

Output: one JSON line with FLOPs, bytes, and the roofline img/s ceiling
for A100-40GB (1555 GB/s) and A100-80GB-SXM (2039 GB/s), TF32 peak
156 TFLOP/s (PyTorch default: fp32 convs run as TF32 on A100).
"""

import argparse
import json
import sys

import torch

sys.path.insert(0, '/root/reference')

SIZE = 256

A100 = {
    'a100_40g': {'bw_gbs': 1555.0, 'tf32_tflops': 156.0},
    'a100_80g_sxm': {'bw_gbs': 2039.0, 'tf32_tflops': 156.0},
}


def instrument(model):
    """Attach hooks collecting (flops, bytes) per leaf module forward."""
    stats = {'flops': 0, 'bytes': 0}

    def hook(mod, inputs, output):
        ins = [t for t in inputs if torch.is_tensor(t)]
        outs = [output] if torch.is_tensor(output) else list(output)
        nbytes = sum(4 * t.numel() for t in ins + outs)
        nbytes += sum(4 * p.numel() for p in mod.parameters(recurse=False))
        flops = 0
        if isinstance(mod, torch.nn.Conv2d):
            kh, kw = mod.kernel_size
            cin = mod.in_channels
            n, cout, ho, wo = outs[0].shape
            flops = 2 * kh * kw * cin * cout * ho * wo * n
        elif isinstance(mod, torch.nn.ConvTranspose2d):
            kh, kw = mod.kernel_size
            cout = mod.out_channels
            n, cin, hi, wi = ins[0].shape
            flops = 2 * kh * kw * cin * cout * hi * wi * n
        else:
            # norm/act/dropout: ~a few flops per element; bandwidth-bound
            flops = 5 * outs[0].numel()
        stats['flops'] += flops
        stats['bytes'] += nbytes

    for mod in model.modules():
        if len(list(mod.children())) == 0:
            mod.register_forward_hook(hook)
    return stats


def main():
    from patchgan.disc import Discriminator
    from patchgan.unet import UNet

    ap = argparse.ArgumentParser()
    ap.add_argument('--nf', type=int, default=64)
    ap.add_argument('--batch', type=int, default=16)
    args = ap.parse_args()
    BATCH = args.batch

    torch.manual_seed(0)
    gen = UNet(3, 1, nf=args.nf, final_act='sigmoid')
    disc = Discriminator(4, args.nf, n_layers=3)

    g_stats = instrument(gen)
    d_stats = instrument(disc)

    x = torch.zeros(BATCH, 3, SIZE, SIZE)
    y = torch.zeros(BATCH, 1, SIZE, SIZE)
    with torch.no_grad():
        out = gen(x)
        disc(torch.cat([x, out], dim=1))

    gf, gb = g_stats['flops'], g_stats['bytes']
    df, db = d_stats['flops'], d_stats['bytes']

    # trainer.py:50-115 composition (see module docstring)
    step_flops = gf * (1 + 2) + df * (3 + 2.5)
    step_bytes = gb * (1 + 2) + db * (3 + 3)
    n_params = (sum(p.numel() for p in gen.parameters())
                + sum(p.numel() for p in disc.parameters()))
    step_bytes += 9 * 4 * n_params  # Adam: read p,g,m,v; write p,m,v (+eps)

    result = {
        'model': f'UNet(nf={args.nf})+Disc(ndf={args.nf},n3)',
        'batch': BATCH,
        'fwd_gflops_g': round(gf / 1e9, 1),
        'fwd_gflops_d': round(df / 1e9, 1),
        'step_gflops': round(step_flops / 1e9, 1),
        'step_gbytes_eager_fp32': round(step_bytes / 1e9, 2),
        'params_m': round(n_params / 1e6, 2),
    }
    for name, hw in A100.items():
        t_flops = step_flops / (hw['tf32_tflops'] * 1e12)
        t_bytes = step_bytes / (hw['bw_gbs'] * 1e9)
        t = max(t_flops, t_bytes)
        result[f'{name}_roofline_img_s'] = round(BATCH / t, 1)
        result[f'{name}_bound'] = ('hbm' if t_bytes > t_flops else 'mxu')
    print(json.dumps(result))


if __name__ == '__main__':
    main()
