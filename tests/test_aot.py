"""patchgan_aot pre-flight validator (cli/aot.py): compiles the
training step against a DETACHED v5e-8 topology and reports cost +
memory-fit. Needs a libtpu compiler on the host; skipped where
topologies are unavailable (e.g. CPU-only CI)."""

import json

import pytest

pytestmark = pytest.mark.slow


def _topology_available():
    try:
        import jax  # noqa: F401
        from jax.experimental import topologies
        topologies.get_topology_desc(platform='tpu',
                                     topology_name='v5e:2x4')
        return True
    except Exception:
        return False


needs_topology = pytest.mark.skipif(
    not _topology_available(),
    reason='no detached-TPU-topology compiler on this host')


@needs_topology
def test_aot_dp_compiles_and_reports(capsys):
    from patchgan_tpu.cli.aot import patchgan_aot
    patchgan_aot(['--topology', 'v5e:2x4', '--gen-filts', '4',
                  '--disc-filts', '4', '--batch', '16'])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec['compile_ok'] is True
    assert rec['mesh'] == {'data': 8, 'model': 1}
    assert rec['cost']['flops_per_device'] > 0
    assert rec['memory_per_device']['fits'] is True
    assert rec['memory_per_device']['peak_bytes'] > 0


@needs_topology
def test_aot_hybrid_tp_and_shadow(capsys):
    from patchgan_tpu.cli.aot import patchgan_aot
    patchgan_aot(['--topology', 'v5e:2x4', '--gen-filts', '8',
                  '--disc-filts', '8', '--dp', '4', '--tp', '2'])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec['compile_ok'] and rec['mesh'] == {'data': 4, 'model': 2}

    patchgan_aot(['--topology', 'v5e:2x4', '--gen-filts', '4',
                  '--disc-filts', '4', '--shadow'])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec['compile_ok'] and rec['shadow'] is True


@needs_topology
def test_aot_rejects_indivisible_batch():
    from patchgan_tpu.cli.aot import patchgan_aot
    with pytest.raises(SystemExit):
        patchgan_aot(['--topology', 'v5e:2x4', '--batch', '7',
                      '--gen-filts', '4', '--disc-filts', '4'])


@needs_topology
def test_aot_reads_train_config(tmp_path, capsys):
    import yaml
    cfg = {
        'dataset': {'type': 'COCOStuff', 'size': 128, 'labels': [1, 2]},
        'model_params': {'gen_filts': 4, 'disc_filts': 4,
                         'n_disc_layers': 2, 'activation': 'relu'},
        'checkpoint_path': str(tmp_path),
        'train_params': {'loss_type': 'tversky', 'seg_alpha': 200,
                         'gen_learning_rate': 1e-3,
                         'disc_learning_rate': 1e-3},
    }
    p = tmp_path / 'train.yaml'
    p.write_text(yaml.safe_dump(cfg))
    from patchgan_tpu.cli.aot import patchgan_aot
    patchgan_aot(['--topology', 'v5e:2x4', '-c', str(p)])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec['compile_ok'] and rec['size'] == 128
    assert rec['gen_filts'] == 4
