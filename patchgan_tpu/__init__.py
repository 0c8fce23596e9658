"""patchgan-tpu: TPU-native image-segmentation GAN framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
ramanakumars/patchGAN (reference: /root/reference/patchgan/__init__.py:1-8):
a U-Net generator trained adversarially against a patch-wise discriminator,
with Tversky / weighted-BCE / MAE segmentation losses, YAML-config train and
infer CLIs, overlap-tiled large-image inference, and Torch-checkpoint
transfer learning -- redesigned TPU-first (NHWC layouts, single jitted
G+D update, data-parallel sharding over an ICI mesh, fused Pallas kernels).
"""

from .data import COCOStuffDataset, DataLoader
from .models import UNet, Discriminator
from .train import Trainer
from .utils.transfer import Transferable, InvalidCheckpointError
from .version import __version__

__all__ = [
    'UNet', 'Discriminator', 'Trainer', 'Transferable',
    'InvalidCheckpointError', 'COCOStuffDataset', 'DataLoader',
    '__version__',
]
