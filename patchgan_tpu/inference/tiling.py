"""Overlap tiling and mask stitching for arbitrary-size inference.

Semantics follow the reference (/root/reference/patchgan/infer.py:14-68):
- crops of ``size`` x ``size`` at stride ``int(overlap * size)``, with the
  last row/column clamped to the image edge;
- stitching sums crop predictions into a canvas with a hit-count array
  and divides, then optionally binarises at ``threshold`` and arg-maxes
  over channels when multi-class.

Fixes reference quirk Q6 (SURVEY.md §5): the reference linearises tiles
as ``j * ncropsy + i`` in both directions, which silently scrambles tiles
for non-square images; we use the correct ``j * ncropsx + i`` (identical
results for square images).

Layouts are NHWC/HWC (TPU-native) rather than the reference's CHW.
"""

import math

import numpy as np


def crop_positions(image_height, image_width, size, overlap):
    """Top-left (y, x) of every tile, row-major (y outer, x inner)."""
    effective = int(overlap * size)
    ncropsy = math.ceil(image_height / effective)
    ncropsx = math.ceil(image_width / effective)
    positions = []
    for j in range(ncropsy):
        for i in range(ncropsx):
            starty = j * effective
            startx = i * effective
            starty -= max(starty + size - image_height, 0)
            startx -= max(startx + size - image_width, 0)
            positions.append((starty, startx))
    return positions


def n_crop(image, size, overlap):
    """(H, W, C) image -> (N, size, size, C) stack of overlapping tiles."""
    h, w = image.shape[:2]
    positions = crop_positions(h, w, size, overlap)
    crops = np.empty((len(positions), size, size, image.shape[2]),
                     dtype=image.dtype)
    for n, (y, x) in enumerate(positions):
        crops[n] = image[y:y + size, x:x + size]
    return crops


def build_mask(masks, crop_size, image_size, threshold, overlap):
    """Stitch (N, size, size, C) tile predictions back to the image grid.

    Returns (H, W) argmax labels when C > 1, else the (H, W) channel-0
    map (thresholded to {0,1} when threshold > 0), matching
    infer.py:59-68.
    """
    masks = np.asarray(masks, dtype=np.float32)
    c = masks.shape[-1]
    h, w = image_size
    canvas = np.zeros((h, w, c), dtype=np.float32)
    count = np.zeros((h, w, 1), dtype=np.float32)
    for n, (y, x) in enumerate(crop_positions(h, w, crop_size, overlap)):
        canvas[y:y + crop_size, x:x + crop_size] += masks[n]
        count[y:y + crop_size, x:x + crop_size] += 1.0
    canvas /= count

    if threshold > 0:
        canvas = np.where(canvas >= threshold, 1.0, 0.0)

    if c > 1:
        return np.argmax(canvas, axis=-1)
    return canvas[..., 0]
