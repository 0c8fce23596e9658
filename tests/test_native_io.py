"""Native C++ decode library vs PIL reference (data/native.py)."""

import numpy as np
import pytest
from PIL import Image

from patchgan_tpu.data import native


@pytest.fixture
def jpeg_file(tmp_path, rng):
    arr = (rng.uniform(size=(97, 133, 3)) * 255).astype(np.uint8)
    path = tmp_path / 'img.jpg'
    Image.fromarray(arr).save(path, quality=95)
    return str(path)


@pytest.fixture
def png_file(tmp_path, rng):
    arr = rng.integers(0, 5, size=(97, 133)).astype(np.uint8)
    path = tmp_path / 'mask.png'
    Image.fromarray(arr, mode='L').save(path)
    return str(path)


def test_native_builds():
    assert native.native_available(), \
        "native imgio library failed to build (g++/libjpeg/libpng)"


def test_jpeg_native_matches_pil_decode(jpeg_file):
    got = native.decode_jpeg_rgb(jpeg_file, None)
    expected = native._pil_jpeg(jpeg_file, None)
    assert got.shape == expected.shape == (97, 133, 3)
    assert got.dtype == np.float32
    # same libjpeg underneath: decoded pixels should agree exactly or
    # within 1/255 (different IDCT settings)
    np.testing.assert_allclose(got, expected, atol=2 / 255)


def test_jpeg_native_resize_matches_torch_bilinear(jpeg_file):
    """The native resize implements torchvision-style bilinear without
    antialias (align_corners=False) — the same algorithm the reference's
    transforms.Resize(antialias=None) uses (io.py:25). torch's
    F.interpolate is the exact oracle. (PIL BILINEAR antialiases, so it
    is deliberately NOT the comparison.)"""
    torch = pytest.importorskip('torch')
    got = native.decode_jpeg_rgb(jpeg_file, 64)
    assert got.shape == (64, 64, 3)
    assert got.min() >= 0.0 and got.max() <= 1.0
    full = native.decode_jpeg_rgb(jpeg_file, None)  # native decode
    # note: libjpeg DCT prescale is disabled here (97/2 < 64), so the
    # resize runs on the full-resolution pixels, exactly like torch
    expected = torch.nn.functional.interpolate(
        torch.tensor(np.transpose(full, (2, 0, 1))[None]),
        size=(64, 64), mode='bilinear', align_corners=False,
        antialias=False)[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_png_native_exact(png_file):
    got = native.decode_png_gray(png_file, None)
    expected = native._pil_png(png_file, None)
    np.testing.assert_array_equal(got, expected)
    assert got.dtype == np.int32


def test_png_native_resize_preserves_labels(png_file):
    got = native.decode_png_gray(png_file, 32)
    assert got.shape == (32, 32)
    assert set(np.unique(got)) <= {0, 1, 2, 3, 4}


def test_dataset_uses_native(tmp_path, rng):
    (tmp_path / 'i').mkdir()
    (tmp_path / 'm').mkdir()
    arr = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / 'i' / '0.jpg')
    Image.fromarray(rng.integers(0, 3, size=(64, 64)).astype(np.uint8),
                    mode='L').save(tmp_path / 'm' / '0.png')
    from patchgan_tpu.data import COCOStuffDataset
    ds = COCOStuffDataset(str(tmp_path / 'i'), str(tmp_path / 'm'),
                          labels=[1, 2, 3], size=32,
                          augmentation='randomcrop')
    img, labelmap = ds.load_raw(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert labelmap.shape == (32, 32) and labelmap.dtype == np.int32
    assert labelmap.min() >= 1  # +1 applied (io.py:43)
