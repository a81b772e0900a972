"""Batch samplers yielding paired 2D/3D indices for MicroFlowDatasetVAE.

Contract-compatible with the reference VAE_model/utils/paired_sampler.py:
index i (2D) and i+N (3D) of the same microstructure always land in the same
batch as [i, i+N, j, j+N, ...]; the stratified variant additionally restricts
to a 70/15/15 split (random.Random(seed) membership, seed 2024).
"""
from __future__ import annotations

import random
from typing import Iterator, List


class PairedBatchSampler:
    """Yields batches [i, i+N, j, j+N, ...]; batch_size must be even."""

    def __init__(self, num_base_samples: int, batch_size: int,
                 shuffle: bool = True, seed: int | None = None):
        if batch_size % 2 != 0:
            raise ValueError(f"batch_size must be even for paired sampling, got {batch_size}")
        self.num_base_samples = num_base_samples
        self.batch_size = batch_size
        self.pairs_per_batch = batch_size // 2
        self.shuffle = shuffle
        self.seed = seed
        self.num_batches = (num_base_samples + self.pairs_per_batch - 1) // self.pairs_per_batch

    def _base_order(self) -> List[int]:
        base = list(range(self.num_base_samples))
        if self.shuffle:
            (random.Random(self.seed) if self.seed is not None else random).shuffle(base)
        return base

    def __iter__(self) -> Iterator[List[int]]:
        base = self._base_order()
        for start in range(0, self.num_base_samples, self.pairs_per_batch):
            batch = []
            for b in base[start:start + self.pairs_per_batch]:
                batch.append(b)
                batch.append(b + self.num_base_samples)
            yield batch

    def __len__(self) -> int:
        return self.num_batches


class StratifiedPairedBatchSampler(PairedBatchSampler):
    """Paired batches restricted to one split of the microstructures."""

    def __init__(self, num_base_samples: int, batch_size: int,
                 split: str = "train", train_ratio: float = 0.7,
                 val_ratio: float = 0.15, test_ratio: float = 0.15,
                 shuffle: bool = True, seed: int = 2024):
        super().__init__(num_base_samples, batch_size, shuffle, seed)
        rng = random.Random(seed)
        base = list(range(num_base_samples))
        rng.shuffle(base)
        train_size = int(train_ratio * num_base_samples)
        val_size = int(val_ratio * num_base_samples)
        if split == "train":
            self.split_indices = base[:train_size]
        elif split == "val":
            self.split_indices = base[train_size:train_size + val_size]
        elif split == "test":
            self.split_indices = base[train_size + val_size:]
        else:
            raise ValueError(f"split must be 'train', 'val', or 'test', got {split}")
        self.num_batches = (len(self.split_indices) + self.pairs_per_batch - 1) // self.pairs_per_batch

    def __iter__(self) -> Iterator[List[int]]:
        split_indices = self.split_indices.copy()
        if self.shuffle:
            random.Random(self.seed).shuffle(split_indices)
        for start in range(0, len(split_indices), self.pairs_per_batch):
            batch = []
            for b in split_indices[start:start + self.pairs_per_batch]:
                batch.append(b)
                batch.append(b + self.num_base_samples)
            yield batch
