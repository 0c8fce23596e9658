from .tiling import build_mask, crop_positions, n_crop
from .engine import InferenceEngine

__all__ = ['n_crop', 'build_mask', 'crop_positions', 'InferenceEngine']
