"""Dependency-free reader for PyTorch ``.pth`` checkpoint files.

Torch checkpoints (the zip ``torch.save`` format, torch >= 1.6) are a zip
archive holding a ``data.pkl`` pickle whose tensors are persistent-id
references into per-storage binary files. This module unpickles them into
plain numpy arrays without importing torch, so the transfer-learning path
(reference /root/reference/patchgan/transfer.py:8-22, train.py:112-116)
works on TPU hosts with no torch installation. If the file uses the
legacy (non-zip) format and torch *is* importable, we fall back to
``torch.load``.
"""

import io
import pickle
import zipfile

import numpy as np

_DTYPE_BY_STORAGE = {
    'FloatStorage': np.float32,
    'DoubleStorage': np.float64,
    'HalfStorage': np.float16,
    'LongStorage': np.int64,
    'IntStorage': np.int32,
    'ShortStorage': np.int16,
    'CharStorage': np.int8,
    'ByteStorage': np.uint8,
    'BoolStorage': np.bool_,
    'BFloat16Storage': None,  # handled specially below
}


class _Storage:
    def __init__(self, data, dtype, bf16=False):
        self.data = data
        self.dtype = dtype
        self.bf16 = bf16


def _rebuild_tensor(storage, storage_offset, size, stride, *args):
    if storage.bf16:
        # numpy has no bf16: widen to float32 by zero-extending mantissa.
        raw = np.frombuffer(storage.data, dtype=np.uint16)
        arr = (raw.astype(np.uint32) << 16).view(np.float32)
    else:
        arr = np.frombuffer(storage.data, dtype=storage.dtype)
    itemsize = arr.itemsize
    if len(size) == 0:
        return arr[storage_offset].copy()
    byte_strides = tuple(s * itemsize for s in stride)
    out = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=byte_strides)
    return out.copy()


def _noop(*args, **kwargs):
    return None


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, load_record):
        super().__init__(file)
        self._load_record = load_record

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != 'storage':
            raise pickle.UnpicklingError(f"unsupported persistent id {kind}")
        storage_type, key, _location, _numel = pid[1], pid[2], pid[3], pid[4]
        name = getattr(storage_type, '__name__', str(storage_type))
        if name == 'UntypedStorage' or isinstance(storage_type, _FakeDtype):
            # torch >= 1.13 stores (UntypedStorage, key, location, numel)
            # with dtype carried separately; _rebuild handles via dtype obj.
            dtype = getattr(storage_type, 'numpy_dtype', np.uint8)
            bf16 = getattr(storage_type, 'is_bf16', False)
        else:
            if name not in _DTYPE_BY_STORAGE:
                raise pickle.UnpicklingError(f"unknown storage {name}")
            dtype = _DTYPE_BY_STORAGE[name]
            bf16 = name == 'BFloat16Storage'
        data = self._load_record(key)
        return _Storage(data, dtype if not bf16 else np.uint16, bf16=bf16)

    def find_class(self, module, name):
        if module.startswith('torch'):
            if name == '_rebuild_tensor_v2' or name == '_rebuild_tensor':
                return _rebuild_tensor
            if name == '_rebuild_parameter':
                return lambda data, *a, **k: data
            if name == '_load_from_bytes':
                return _noop
            if name.endswith('Storage'):
                dt = _DTYPE_BY_STORAGE.get(name, np.uint8)
                return _FakeDtype(name, dt, name == 'BFloat16Storage')
            if module == 'torch' and name in _TORCH_DTYPES:
                return _FakeDtype(name, _TORCH_DTYPES[name],
                                  name == 'bfloat16')
            # OrderedDict et al. fall through below
        if module == 'collections' and name == 'OrderedDict':
            import collections
            return collections.OrderedDict
        if module == 'builtins':
            import builtins
            return getattr(builtins, name)
        raise pickle.UnpicklingError(f"forbidden global {module}.{name}")


_TORCH_DTYPES = {
    'float32': np.float32, 'float64': np.float64, 'float16': np.float16,
    'bfloat16': np.uint16, 'int64': np.int64, 'int32': np.int32,
    'int16': np.int16, 'int8': np.int8, 'uint8': np.uint8, 'bool': np.bool_,
}


class _FakeDtype:
    def __init__(self, name, numpy_dtype, is_bf16):
        self.__name__ = name
        self.numpy_dtype = numpy_dtype
        self.is_bf16 = is_bf16


def load_torch_pickle(path):
    """Load a torch ``.pth`` file into a dict of numpy arrays."""
    with open(path, 'rb') as f:
        head = f.read(4)
    if head[:2] == b'PK':
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl_name = next(n for n in names if n.endswith('data.pkl'))
            prefix = pkl_name[:-len('data.pkl')]

            def load_record(key):
                return zf.read(f'{prefix}data/{key}')

            with zf.open(pkl_name) as pf:
                data = pf.read()
            return _TorchUnpickler(io.BytesIO(data), load_record).load()
    # Legacy format: defer to torch if present.
    try:
        import torch
    except ImportError as e:
        raise RuntimeError(
            f"{path} is a legacy torch checkpoint and torch is not "
            "installed; re-save it with a recent torch version") from e
    state = torch.load(path, map_location='cpu', weights_only=True)
    return {k: v.detach().numpy() for k, v in state.items()}
