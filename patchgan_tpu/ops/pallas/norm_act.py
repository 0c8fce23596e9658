"""Fused InstanceNorm + activation Pallas TPU kernel (stub for now).

Will provide a one-read/one-write fused norm+act epilogue with a custom
VJP; until then the XLA path in ops/norm.py is used everywhere.
"""


def pallas_supported(x):
    return False


def instance_norm_act_pallas(x, eps=1e-5, activation=None):
    raise NotImplementedError
