"""Streaming statistics: Welford online mean/variance for per-gene
expression tables over the whole brain grid (reference
utils/inft_mba.py:17-45 ``OnlineVariance``)."""

from __future__ import annotations

import numpy as np


class OnlineVariance:
    """Chan/Welford parallel-merge online mean and variance over batches of
    per-element vectors (e.g. per-gene counts)."""

    def __init__(self, dim: int):
        self.n = 0.0
        self.mean = np.zeros(dim, np.float64)
        self.m2 = np.zeros(dim, np.float64)

    def update(self, batch: np.ndarray) -> None:
        """batch: (N, dim) observations."""
        b = np.asarray(batch, np.float64)
        if b.ndim == 1:
            b = b[None]
        nb = len(b)
        if nb == 0:
            return
        b_mean = b.mean(0)
        b_m2 = ((b - b_mean) ** 2).sum(0)
        delta = b_mean - self.mean
        tot = self.n + nb
        self.mean += delta * nb / tot
        self.m2 += b_m2 + delta ** 2 * self.n * nb / tot
        self.n = tot

    @property
    def variance(self) -> np.ndarray:
        return self.m2 / max(self.n - 1, 1.0)

    @property
    def std(self) -> np.ndarray:
        return np.sqrt(self.variance)
