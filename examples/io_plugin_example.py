"""Example custom-dataset plugin.

Copy this file to ``io.py`` in your working directory and set
``dataset.type: NpzSegmentationDataset`` in the YAML config — both CLIs
load the class by name from the CWD ``io.py`` (the same extension
protocol as the reference, /root/reference/patchgan/train.py:57-68).

Training needs ``__len__`` + ``__getitem__`` returning
(image HWC float32 in [0,1], one-hot mask HWC float32) — or, for the
fast path with on-device augmentation, also ``load_raw(i)`` returning
(image, integer labelmap) plus ``labels``/``augmentation`` attributes.

Inference additionally needs ``get_filename(i)`` and
``save_mask(mask, output_path, fname)`` (and optionally ``get_image(i)``
for full-resolution inputs).
"""

import glob
import os

import numpy as np


class NpzSegmentationDataset:
    augmentation = None

    def __init__(self, folder, maskfolder=None, size=256,
                 augmentation='resize', labels=(1,), **kwargs):
        self.files = sorted(glob.glob(os.path.join(folder, '*.npz')))
        self.size = size
        self.labels = np.sort(np.asarray(labels))
        self.augmentation = augmentation

    def __len__(self):
        return len(self.files)

    def load_raw(self, i):
        """Fast path: (image HWC float32, labelmap HW int32)."""
        with np.load(self.files[i]) as data:
            return (data['image'].astype(np.float32),
                    data['labels'].astype(np.int32))

    def __getitem__(self, i):
        image, labelmap = self.load_raw(i)
        onehot = (labelmap[:, :, None]
                  == self.labels[None, None, :]).astype(np.float32)
        return image, onehot

    # ------------------------------------------------------------------
    # inference protocol
    # ------------------------------------------------------------------
    def get_filename(self, i):
        return os.path.basename(self.files[i])

    def get_image(self, i):
        return self.load_raw(i)[0]

    @staticmethod
    def save_mask(mask, output_path, fname):
        np.save(os.path.join(output_path, fname + '.npy'),
                np.asarray(mask))
