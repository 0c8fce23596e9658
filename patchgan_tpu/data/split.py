"""Dataset train/val splitting (replacement for torch's random_split used
at /root/reference/patchgan/train.py:75)."""

import numpy as np


class Subset:
    """Index-remapped view of a dataset; forwards the attributes the
    loader and trainer rely on (labels, augmentation, load_raw)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def load_raw(self, i):
        return self.dataset.load_raw(self.indices[i])

    @property
    def labels(self):
        return self.dataset.labels

    @property
    def augmentation(self):
        return self.dataset.augmentation


def random_split(dataset, lengths, seed=0):
    """Split by fractions (summing to ~1) or absolute lengths, matching
    torch.utils.data.random_split semantics."""
    n = len(dataset)
    lengths = list(lengths)
    if all(isinstance(x, float) for x in lengths) and \
            abs(sum(lengths) - 1.0) < 1e-6:
        counts = [int(np.floor(n * f)) for f in lengths]
        for i in range(n - sum(counts)):
            counts[i % len(counts)] += 1
    else:
        counts = [int(x) for x in lengths]
        if sum(counts) != n:
            raise ValueError(
                f"Sum of input lengths {sum(counts)} does not equal the "
                f"length of the input dataset {n}")
    perm = np.random.default_rng(seed).permutation(n)
    subsets, offset = [], 0
    for c in counts:
        subsets.append(Subset(dataset, perm[offset:offset + c]))
        offset += c
    return subsets
