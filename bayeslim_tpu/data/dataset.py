"""
Dataset: a minibatch-indexable collection of data containers.

Reference parity: bayeslim/dataset.py Dataset (:3611-3649) — a
torch.utils.data.Dataset over VisData/MapData/CalData (or file paths +
read function); `target[batch_idx]` is the minibatch fetch used by
LogProb. No torch dependency here: a plain indexable works identically.
"""
from __future__ import annotations

from .containers import VisData, MapData, CalData, TensorData, load_data

__all__ = ["Dataset"]


class Dataset:
    """Indexable list of data containers or lazy file paths
    (reference dataset.py:3611-3649)."""

    def __init__(self, data, read_fn=None):
        if isinstance(data, (VisData, MapData, CalData, TensorData)):
            data = [data]
        self.data = list(data)
        self.read_fn = read_fn

    def __len__(self):
        return len(self.data)

    @property
    def Nbatch(self):
        return len(self.data)

    def __getitem__(self, idx):
        d = self.data[idx]
        if isinstance(d, str):
            d = self.read_fn(d) if self.read_fn is not None else load_data(d)
        return d

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
