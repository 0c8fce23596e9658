"""Shared CLI plumbing: device selection, dataset construction."""

import jax
import jax.numpy as jnp


def select_device(device):
    """'auto' keeps the default backend (TPU when present); 'cpu' forces
    the host platform. Must run before any jax computation."""
    if device in ('cpu',):
        jax.config.update('jax_platforms', 'cpu')
    elif device in ('auto', 'tpu', 'cuda'):
        pass  # default backend
    else:
        raise ValueError(f"Unknown device {device!r}")
    return jax.devices()[0].platform


def compute_dtype(name, platform):
    if name == 'auto':
        return jnp.bfloat16 if platform == 'tpu' else jnp.float32
    return {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[name]


def build_dataset_factory(dataset_params):
    """Resolve the Dataset class + channel counts from the config's
    ``dataset`` section (reference train.py:50-68, infer.py:99-117)."""
    from ..data import COCOStuffDataset, load_dataset_class

    kwargs = {}
    if dataset_params['type'] == 'COCOStuff':
        cls = COCOStuffDataset
        in_channels = 3
        labels = dataset_params.get('labels', [1])
        out_channels = len(labels)
        kwargs['labels'] = labels
    elif dataset_params['type'] == 'TarShards':
        # webdataset-style tar shards (data/shards.py): the images
        # path(s) are tar files / globs; masks live inside the shards
        from ..data.shards import TarShardDataset
        cls = TarShardDataset
        in_channels = 3
        labels = dataset_params.get('labels', [1])
        out_channels = len(labels)
        kwargs['labels'] = labels
    else:
        cls = load_dataset_class(dataset_params['type'])
        in_channels = dataset_params.get('in_channels', 3)
        out_channels = dataset_params.get('out_channels', 1)
    return cls, in_channels, out_channels, kwargs
