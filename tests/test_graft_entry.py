"""Driver entry points stay healthy: single-chip jittable forward and
the 8-device mesh dry run of the full training step.

The dryrun test runs in a CLEAN SUBPROCESS that reproduces the driver
environment (JAX_PLATFORMS pinned to the external TPU plugin, no
conftest platform setup inherited): round 1's in-process test passed
while the driver failed, because conftest.py had already forced
cpu + 8 virtual devices before dryrun_multichip ran (VERDICT.md round 1,
weak #2). dryrun_multichip must do that forcing itself.
"""

import pytest
import importlib.util
import os
import subprocess
import sys

import jax

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, '__graft_entry__.py')


def _load():
    spec = importlib.util.spec_from_file_location('graft_entry', ENTRY)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles_and_runs():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 256, 256, 1)


def test_dryrun_multichip_8_driver_env():
    """Run dryrun_multichip(8) exactly the way the driver does: a fresh
    interpreter where the platform is still pinned to the external
    backend and XLA_FLAGS carries no virtual-device count."""
    env = dict(os.environ)
    # undo anything conftest.py exported into this process
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'axon'  # the external pin the driver runs under
    proc = subprocess.run(
        [sys.executable, '-c',
         'import sys; sys.path.insert(0, %r)\n'
         'import importlib.util\n'
         'spec = importlib.util.spec_from_file_location('
         '"graft_entry", %r)\n'
         'm = importlib.util.module_from_spec(spec)\n'
         'spec.loader.exec_module(m)\n'
         'm.dryrun_multichip(8)\n' % (REPO, ENTRY)],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert proc.returncode == 0, (
        f"dryrun_multichip failed in driver env\n"
        f"stdout: {proc.stdout}\nstderr: {proc.stderr}")
    assert 'dp ok' in proc.stdout
    assert 'hybrid dp x tp (2 x 4) ok' in proc.stdout
    assert 'dcn x ici (2 x 4) ok' in proc.stdout


def test_dryrun_multichip_in_process():
    """Also exercise the in-process path (backend already cpu+8 from
    conftest): the platform forcing must be a harmless no-op."""
    m = _load()
    m.dryrun_multichip(8)
