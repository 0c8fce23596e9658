"""Epoch-numbered checkpoint store.

Mirrors the reference's layout (/root/reference/patchgan/trainer.py:
281-321): two files per epoch, ``generator_ep_{epoch:03d}`` and
``discriminator_ep_{epoch:03d}``, resumable by globbing both patterns and
taking the max epoch of the union. Files are ``.npz`` archives whose keys
are the TORCH state_dict names and whose arrays are in torch layouts
(see utils/transfer.py), so checkpoints interop in both directions: ours
load into the PyTorch reference, and reference ``.pth`` files load here.
"""

import glob
import os
import re

import numpy as np

from .torch_pickle import load_torch_pickle

GEN_PREFIX = 'generator_ep_'
DISC_PREFIX = 'discriminator_ep_'


def save_state_dict(path, state_dict):
    np.savez(path, **{k: np.asarray(v) for k, v in state_dict.items()})


def load_state_dict(path):
    """Load a checkpoint into {torch_key: numpy array}. Supports our
    ``.npz`` format and torch ``.pth`` files."""
    if path.endswith('.pth') or path.endswith('.pt'):
        state = load_torch_pickle(path)
        return {k: np.asarray(v) for k, v in state.items()}
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def checkpoint_epochs(savefolder, prefix):
    """Epochs present for a given prefix, over both .npz and .pth files
    (a torch-reference savefolder is directly resumable)."""
    epochs = {}
    for path in glob.glob(os.path.join(savefolder, f'{prefix}*')):
        m = re.match(rf'{re.escape(prefix)}(\d+)\.(npz|pth|pt)$',
                     os.path.basename(path))
        if m:
            epochs[int(m.group(1))] = path
    return epochs


def find_last_checkpoint(savefolder):
    """Return (epoch, gen_path, disc_path) for the latest checkpoint.

    Matches the reference resume rule (trainer.py:289-308): the start
    epoch is the max over the union of generator and discriminator
    epochs; missing counterpart files surface as errors to the caller
    (which degrades to fresh training, trainer.py:309-311).
    """
    gen = checkpoint_epochs(savefolder, GEN_PREFIX)
    disc = checkpoint_epochs(savefolder, DISC_PREFIX)
    if not gen:
        raise FileNotFoundError("No checkpoints found!")
    last = max(set(gen) | set(disc))
    return last, gen[last], disc[last]
