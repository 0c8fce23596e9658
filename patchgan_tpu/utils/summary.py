"""Model summary printout: per-module parameter shapes and counts
(replacement for the reference's torchinfo.summary calls,
/root/reference/patchgan/train.py:102-104)."""

import jax
import numpy as np


def count_params(params):
    return sum(int(np.size(x))
               for x in jax.tree_util.tree_leaves(params))


def summarize_forward(model, input_shape, depth=4, **call_kwargs):
    """torchinfo-style per-layer table with input/output shapes.

    The reference prints ``torchinfo.summary(model, input_size, depth=4)``
    (/root/reference/patchgan/train.py:102-104); here Flax's tabulate
    produces the equivalent table (module tree to ``depth`` levels,
    per-layer output shapes and parameter counts) from a shape-only
    abstract evaluation -- no FLOPs are spent.
    """
    import flax.linen as nn
    import jax.numpy as jnp

    x = jnp.zeros(input_shape, jnp.float32)
    text = nn.tabulate(
        model, jax.random.PRNGKey(0), depth=depth,
        console_kwargs={'width': 100, 'force_terminal': False},
    )(x, **call_kwargs)
    print(text)
    return text


def summarize(name, params, input_shape=None):
    lines = [f"{'=' * 60}", f"{name}"]
    if input_shape is not None:
        lines.append(f"input: {tuple(input_shape)}")
    lines.append('-' * 60)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        key = '/'.join(getattr(p, 'key', str(p)) for p in path)
        lines.append(f"  {key:<40} {str(tuple(leaf.shape)):<20} "
                     f"{int(np.size(leaf)):>10,}")
    lines.append('-' * 60)
    lines.append(f"  total parameters: {count_params(params):,}")
    lines.append('=' * 60)
    text = '\n'.join(lines)
    print(text)
    return text
