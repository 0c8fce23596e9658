"""U-Net generator (Flax, NHWC), TPU-native rebuild of the reference
generator (/root/reference/patchgan/unet.py:75-134).

Architecture parity:
- 7-level encoder with filter ladder [nf, 2nf, 4nf, 8nf, 8nf, 8nf, 8nf]
  (unet.py:84); every encoder block has instance norm.
- decoder mirrors the ladder reversed; the first up block has no norm
  (unet.py:98), inner blocks take the skip-concatenated (2x channel)
  input (unet.py:101) and use dropout when enabled, and the final block
  maps 2nf -> output_nc with ``final_act`` and no norm/dropout
  (unet.py:106).
- forward collects every encoder output, reverses the list, and
  skip-connects each decoder level except the first (unet.py:112-129);
  ``return_hidden=True`` also returns the bottleneck (unet.py:131-132).

TPU-first differences (behaviour-preserving): NHWC layout, skip concat
fused into the transposed convs, fused norm+activation epilogues, and an
optional bf16 compute dtype with fp32 parameters/statistics.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .blocks import DownBlock, UpBlock

N_LEVELS = 7


def unet_filters(nf):
    """Encoder filter ladder (reference unet.py:84)."""
    return [nf, nf * 2, nf * 4, nf * 8, nf * 8, nf * 8, nf * 8]


class UNet(nn.Module):
    input_nc: int
    output_nc: int
    nf: int = 64
    use_dropout: bool = False
    activation: str = 'tanh'
    final_act: str = 'softmax'
    dtype: Any = jnp.float32
    use_pallas: bool = True
    s2d: bool = False  # space-to-depth boundary form: input arrives as
    #   [N, H/2, W/2, 4*input_nc] and the output is produced as
    #   [N, H/2, W/2, 4*output_nc] (channel order (dy, dx, c); see
    #   ops/s2d.py). Numerically exact per pixel, identical parameter
    #   tree -- checkpoints swap freely between modes. Train-step-only
    #   optimisation: full-resolution few-channel tensors are
    #   pathological for TPU lane tiling (XLA lays C=1 out N-minor and
    #   pays relayout copies; BENCHMARKS.md round-3 trace).
    remat: Any = False  # True: checkpoint every block (recompute
    #   conv+norm+act in backward instead of storing intermediates);
    #   tuple of block names ('enc4', 'dec0', ...): checkpoint only
    #   those -- deep 512-channel blocks trade recompute for residual
    #   HBM traffic profitably, shallow ones do not (BENCHMARKS.md)

    def _remat(self, name):
        if self.remat is True or self.remat is False:
            return self.remat
        return name in self.remat

    @nn.compact
    def __call__(self, x, train=False, return_hidden=False):
        filts = unet_filters(self.nf)
        h, w = x.shape[1], x.shape[2]
        if self.s2d:
            h, w = h * 2, w * 2  # x is the s2d form of a 2h x 2w input
        stride_total = 2 ** N_LEVELS
        if h % stride_total or w % stride_total:
            # 7 stride-2 levels need spatial dims divisible by 128; the
            # torch reference has the same implicit constraint (it crashes
            # on the skip torch.cat otherwise, and its InstanceNorm
            # additionally rejects the 1x1 bottleneck below 256px).
            raise ValueError(
                f"UNet input spatial dims must be multiples of "
                f"{stride_total}; got {h}x{w}")
        x = x.astype(self.dtype)

        skips = []
        for i, f in enumerate(filts):
            x = DownBlock(f, self.activation, use_dropout=self.use_dropout,
                          dtype=self.dtype, use_pallas=self.use_pallas,
                          remat=self._remat(f'enc{i}'),
                          s2d_in=self.s2d and i == 0,
                          name=f'enc{i}')(x, train=train)
            skips.append(x)

        hidden = skips[-1]
        rev = skips[::-1]

        dec_filts = filts[:-1][::-1]  # [8nf, 8nf, 8nf, 4nf, 2nf, nf]
        x = UpBlock(dec_filts[0], self.activation, use_norm=False,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    remat=self._remat('dec0'),
                    name='dec0')(hidden, train=train)
        for i in range(1, len(dec_filts)):
            x = UpBlock(dec_filts[i], self.activation, use_norm=True,
                        use_dropout=self.use_dropout, dtype=self.dtype,
                        use_pallas=self.use_pallas,
                        remat=self._remat(f'dec{i}'),
                        name=f'dec{i}')(x, skip=rev[i], train=train)
        x = UpBlock(self.output_nc, self.final_act, use_norm=False,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    fp32_act=True,
                    remat=self._remat(f'dec{len(dec_filts)}'),
                    s2d_out=self.s2d,
                    name=f'dec{len(dec_filts)}')(x, skip=rev[len(dec_filts)],
                                                 train=train)

        if return_hidden:
            return x, hidden
        return x
