from .unet import UNet
from .disc import Discriminator
from .blocks import DownBlock, UpBlock

__all__ = ['UNet', 'Discriminator', 'DownBlock', 'UpBlock']
