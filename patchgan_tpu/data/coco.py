"""COCO-Stuff style dataset: paired ``*.jpg`` images and ``*.png`` masks.

Behaviour parity with the reference COCOStuffDataset
(/root/reference/patchgan/io.py:10-58):
- globs sorted ``*.jpg`` / ``*.png`` from the two folders and asserts the
  integer basename IDs line up (io.py:14-22);
- images decode to RGB floats in [0, 1]; mask label values are the PNG
  grayscale value **+ 1** (io.py:42-43);
- the one-hot mask has one channel per entry of the sorted ``labels``
  list (io.py:54-56);
- augmentation vocabulary (io.py:24-31, quirk Q3 documented in
  SURVEY.md): ``'randomcrop'`` resizes to (size, size) (the reference's
  misnomer), ``'randomcrop+flip'`` resizes and random-flips
  horizontally/vertically with p=0.25 each, and any other value
  (including the default ``'resize'``) applies no transform at all.

TPU-first deviations (deliberate fixes):
- masks are resized with NEAREST interpolation (the reference bilinearly
  interpolates label values through its stacked-tensor Resize, silently
  zeroing one-hot pixels at class boundaries);
- random flips run on-device inside the input pipeline (loader.py), not
  per-sample on the host — ``__getitem__`` stays host-only for API
  compatibility and plugin-style use;
- ``get_filename`` / ``save_mask`` are provided so the built-in dataset
  works with ``patchgan_infer`` out of the box (reference quirk Q5: its
  COCOStuffDataset lacks both and cannot be used for inference,
  infer.py:119-125).
"""

import glob
import os

import numpy as np
from PIL import Image


class COCOStuffDataset:
    augmentation = None

    def __init__(self, imgfolder, maskfolder=None, labels=(1,), size=256,
                 augmentation='resize'):
        if maskfolder is None:
            maskfolder = imgfolder
        self.images = sorted(glob.glob(os.path.join(imgfolder, '*.jpg')))
        self.masks = sorted(glob.glob(os.path.join(maskfolder, '*.png')))
        self.size = size
        self.labels = np.sort(np.asarray(labels))
        self.augmentation = augmentation

        image_ids = [int(os.path.splitext(os.path.basename(p))[0])
                     for p in self.images]
        mask_ids = [int(os.path.splitext(os.path.basename(p))[0])
                    for p in self.masks]
        # masks may legitimately be absent for inference-only use
        # (quirk Q5 fix: the built-in dataset supports patchgan_infer)
        if self.masks:
            assert image_ids == mask_ids, \
                "Image IDs and Mask IDs do not match!"

        print(f"Loaded {len(self)} images")

    def __len__(self):
        return len(self.images)

    # ------------------------------------------------------------------
    # host decode path
    # ------------------------------------------------------------------
    def _resize_enabled(self):
        return self.augmentation in ('randomcrop', 'randomcrop+flip')

    def _flip_enabled(self):
        return self.augmentation == 'randomcrop+flip'

    def load_raw(self, index):
        """Decode one (image, labelmap) pair: image HWC float32 in [0,1],
        labelmap HW int32 of PNG values + 1. Resized when the
        augmentation mode calls for it; flips are applied downstream
        on-device. Decode+resize runs through the native C++ path
        (data/native.py: libjpeg DCT prescale + fused bilinear) when
        available, with a PIL fallback."""
        from . import native
        size = self.size if self._resize_enabled() else None
        image = native.decode_jpeg_rgb(self.images[index], size)
        labelmap = native.decode_png_gray(self.masks[index], size) + 1
        return image, labelmap

    def load_raw_u8(self, index):
        """Transfer-optimal decode: (uint8 HWC image, uint8 HW RAW
        labelmap WITHOUT the +1 offset). The input pipeline normalises
        and one-hots on device (loader.py), so the host->device copy is
        a quarter of the float32 path's bytes."""
        from . import native
        size = self.size if self._resize_enabled() else None
        image = native.decode_jpeg_rgb_u8(self.images[index], size)
        labelmap = native.decode_png_gray_u8(self.masks[index], size)
        return image, labelmap

    def one_hot(self, labelmap):
        """(H, W) labelmap -> (H, W, n_labels) float32 one-hot over the
        configured labels (io.py:54-56)."""
        return (labelmap[:, :, None]
                == self.labels[None, None, :]).astype(np.float32)

    def __getitem__(self, index):
        """Full host path for API/plugin compatibility: returns
        (image HWC float32, one-hot mask HWC float32), with host-side
        random flips when augmentation='randomcrop+flip'."""
        image, labelmap = self.load_raw(index)
        if self._flip_enabled():
            if np.random.uniform() < 0.25:
                image = image[:, ::-1]
                labelmap = labelmap[:, ::-1]
            if np.random.uniform() < 0.25:
                image = image[::-1]
                labelmap = labelmap[::-1]
        return np.ascontiguousarray(image), self.one_hot(
            np.ascontiguousarray(labelmap))

    # ------------------------------------------------------------------
    # inference protocol (reference infer.py:119-123 requires these)
    # ------------------------------------------------------------------
    def get_filename(self, index):
        return os.path.basename(self.images[index])

    @staticmethod
    def save_mask(mask, output_path, fname):
        """Save a stitched prediction as PNG (uint8 label/probability
        map)."""
        arr = np.asarray(mask)
        if arr.dtype in (np.float32, np.float64):
            arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8) \
                if arr.max() <= 1.0 else arr.astype(np.uint8)
        else:
            arr = arr.astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(output_path, f'{fname}.png'))

    def get_image(self, index):
        """Inference-time image fetch: HWC uint8, original resolution
        (tiling handles arbitrary sizes). The engine normalises /255 on
        device -- 1-ulp-exact vs a host divide, 4x smaller uploads
        (and 4x less of the axon relay's upload leak,
        benchmarks/repro_axon_upload_leak.py)."""
        from . import native
        return native.decode_jpeg_rgb_u8(self.images[index], None)
