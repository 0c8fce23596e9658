from .losses import tversky, fc_tversky, mae_loss, bce_loss, weighted_bce_loss
from .conv import conv2d, conv_transpose2d
from .norm import instance_norm
from .activations import apply_activation

# torch-style alias kept for API familiarity with the reference
# (/root/reference/patchgan/losses.py:34)
MAE_loss = mae_loss

__all__ = [
    'tversky', 'fc_tversky', 'mae_loss', 'MAE_loss', 'bce_loss',
    'weighted_bce_loss', 'conv2d', 'conv_transpose2d', 'instance_norm',
    'apply_activation',
]
