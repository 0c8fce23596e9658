"""Test configuration: run JAX on CPU with 8 virtual devices so the
data-parallel mesh path is exercised without TPU hardware (SURVEY.md §4
"Distributed without a cluster").

Note: this environment pins JAX_PLATFORMS=axon externally, so the env var
alone does not stick; jax.config.update is authoritative.
"""

import os

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=8'
)
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
