"""Batched tiled-inference engine.

The reference pushes ALL tiles of an image through the generator as one
variable-size batch (/root/reference/patchgan/infer.py:165-172), which on
TPU would retrace/recompile per distinct tile count. Here tile batches
are padded up to a fixed bucket size and run through a single jitted
forward, so arbitrary image sizes reuse one compiled program; padding
tiles are discarded before stitching.
"""

import jax
import numpy as np

from .tiling import build_mask, n_crop


def _round_up(n, m):
    return ((n + m - 1) // m) * m


class InferenceEngine:
    def __init__(self, generator, g_params, size=256, overlap=0.9,
                 threshold=0, batch_size=16, dtype=None):
        self.generator = generator
        self.g_params = g_params
        self.size = size
        self.overlap = overlap
        self.threshold = threshold
        self.batch_size = batch_size
        self._forward = jax.jit(
            lambda params, x: generator.apply({'params': params}, x,
                                              train=False))

    def predict_tiles(self, crops):
        """(N, size, size, C) -> (N, size, size, out_C), batched through a
        fixed-size jitted forward."""
        n = crops.shape[0]
        bs = min(self.batch_size, _round_up(n, 8))
        padded = _round_up(n, bs)
        if padded != n:
            pad = np.zeros((padded - n,) + crops.shape[1:], crops.dtype)
            crops = np.concatenate([crops, pad], axis=0)
        outs = []
        for i in range(0, padded, bs):
            outs.append(np.asarray(
                self._forward(self.g_params, crops[i:i + bs])))
        return np.concatenate(outs, axis=0)[:n]

    def predict_image(self, image):
        """(H, W, C) image of arbitrary size -> stitched (H, W) mask."""
        crops = n_crop(np.asarray(image, dtype=np.float32), self.size,
                       self.overlap)
        masks = self.predict_tiles(crops)
        return build_mask(masks, self.size, image.shape[:2],
                          self.threshold, self.overlap)
