"""Driver entry points stay healthy: single-chip jittable forward and
the 8-device mesh dry run of the full training step."""

import importlib.util

import jax


def _load():
    spec = importlib.util.spec_from_file_location(
        'graft_entry', '/root/repo/__graft_entry__.py')
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles_and_runs():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 256, 256, 1)


def test_dryrun_multichip_8(capsys):
    m = _load()
    m.dryrun_multichip(8)
    assert 'ok' in capsys.readouterr().out
