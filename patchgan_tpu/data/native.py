"""ctypes bindings for the native decode+resize library.

Builds ``libpatchgan_imgio.so`` from data/_native/imgio.cpp on first use
(g++ against the system libjpeg/libpng; pybind11 is deliberately not
used) and exposes numpy-friendly decode functions. Every entry point has
a pure-PIL fallback so the framework works without a compiler; the
native path exists for input-pipeline throughput (ctypes releases the
GIL, so the loader's thread pool decodes in true parallel).
"""

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), '_native', 'imgio.cpp')
_LIB = os.path.join(os.path.dirname(__file__), '_native',
                    'libpatchgan_imgio.so')

_lib = None
_build_failed = False


def _build():
    cmd = ['g++', '-O3', '-fPIC', '-shared', '-o', _LIB, _SRC,
           '-ljpeg', '-lpng']
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if os.environ.get('PATCHGAN_NATIVE_IO', 'on') == 'off':
        _build_failed = True
        return None
    try:
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.pg_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.pg_jpeg_decode_rgb_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.pg_jpeg_decode_rgb_resize_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.pg_png_info.argtypes = lib.pg_jpeg_info.argtypes
        lib.pg_png_decode_gray_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def native_available():
    return _load() is not None


def decode_jpeg_rgb(path, size=None):
    """Decode a JPEG to float32 HWC RGB in [0,1]; optionally resize
    (bilinear, align_corners=False) to (size, size). Falls back to PIL.
    """
    lib = _load()
    if lib is None:
        return _pil_jpeg(path, size)
    with open(path, 'rb') as f:
        data = f.read()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.pg_jpeg_info(data, len(data), ctypes.byref(h),
                        ctypes.byref(w)):
        return _pil_jpeg(path, size)
    oh, ow = (size, size) if size else (h.value, w.value)
    out = np.empty((oh, ow, 3), dtype=np.float32)
    rc = lib.pg_jpeg_decode_rgb_resize(
        data, len(data), oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        return _pil_jpeg(path, size)
    return out


def decode_jpeg_rgb_u8(path, size=None):
    """Decode a JPEG to uint8 HWC RGB; optionally resize (bilinear,
    rounded to uint8). The uint8 form keeps host->device transfers at a
    quarter of the float32 bytes; normalisation (/255) happens on device
    in the input pipeline. Falls back to PIL."""
    lib = _load()
    if lib is None:
        return _pil_jpeg_u8(path, size)
    with open(path, 'rb') as f:
        data = f.read()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.pg_jpeg_info(data, len(data), ctypes.byref(h),
                        ctypes.byref(w)):
        return _pil_jpeg_u8(path, size)
    oh, ow = (size, size) if size else (h.value, w.value)
    out = np.empty((oh, ow, 3), dtype=np.uint8)
    rc = lib.pg_jpeg_decode_rgb_resize_u8(
        data, len(data), oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc:
        return _pil_jpeg_u8(path, size)
    return out


def decode_png_gray_u8(path, size=None):
    """uint8 labelmap variant of decode_png_gray (PNG gray fits u8)."""
    return decode_png_gray(path, size).astype(np.uint8)


def decode_png_gray(path, size=None):
    """Decode a grayscale PNG to int32 HW; optionally nearest-resize to
    (size, size). Falls back to PIL."""
    lib = _load()
    if lib is None:
        return _pil_png(path, size)
    with open(path, 'rb') as f:
        data = f.read()
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.pg_png_info(data, len(data), ctypes.byref(h), ctypes.byref(w)):
        return _pil_png(path, size)
    oh, ow = (size, size) if size else (h.value, w.value)
    out = np.empty((oh, ow), dtype=np.int32)
    rc = lib.pg_png_decode_gray_resize(
        data, len(data), oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc:
        return _pil_png(path, size)
    return out


def _pil_jpeg(path, size):
    from PIL import Image
    img = Image.open(path).convert('RGB')
    if size:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def _pil_jpeg_u8(path, size):
    from PIL import Image
    img = Image.open(path).convert('RGB')
    if size:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def _pil_png(path, size):
    from PIL import Image
    mask = Image.open(path).convert('L')
    if size:
        mask = mask.resize((size, size), Image.NEAREST)
    return np.asarray(mask, dtype=np.int32)
