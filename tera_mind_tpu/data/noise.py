"""Deterministic per-tile initial noise.

The tera-scale loop needs every tile's t=0 noise to be reproducible from its
grid position alone, so any worker can regenerate a neighbor's halo without
communication (reference utils/MBADataset_tst.py:11-14, 49-62: an LCG over
``row*grid_w + col`` seeds ``torch.randn``).

Two backends:
- 'torch'  — bit-exact with the reference (torch.manual_seed + randn); used
             for parity runs against published outputs.
- 'jax'    — threefry fold_in; the TPU-native default (no torch dependency
             in the hot path, generateable on-device).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def lcg(x: int, a: int = 1103515245, c: int = 12345, m: int = 2 ** 31) -> int:
    """glibc-style linear congruential step (MBADataset_tst.py:13)."""
    return (a * x + c) % m


def tile_seed(row: int, col: int, grid_w: int) -> int:
    return lcg(row * grid_w + col)


def tile_init_noise(row: int, col: int, grid_w: int,
                    shape: Tuple[int, ...], backend: str = "torch"
                    ) -> np.ndarray:
    """Initial N(0,1) state for tile (row, col); channels-last shape."""
    seed = tile_seed(row, col, grid_w)
    if backend == "torch":
        import torch
        g = torch.Generator().manual_seed(seed)
        return torch.randn(shape, generator=g).numpy()
    if backend == "jax":
        import jax
        key = jax.random.PRNGKey(seed)
        return np.asarray(jax.random.normal(key, shape, dtype=np.float32))
    raise ValueError(backend)


def grid_init_noise_jax(rows: int, cols: int, grid_w: int,
                        tile_shape: Tuple[int, ...], *, row0: int = 0,
                        col0: int = 0):
    """Device-side batch init noise for a (rows x cols) block of tiles.

    Returns a jnp array of shape (rows, cols, *tile_shape) where tile
    (r, c) is seeded from its ABSOLUTE grid position — the jax analog of
    the reference's per-tile LCG seeding, vectorized.
    """
    import jax
    import jax.numpy as jnp

    def one(seed):
        return jax.random.normal(jax.random.PRNGKey(seed), tile_shape,
                                 dtype=jnp.float32)

    seeds = ((1103515245 * ((jnp.arange(rows)[:, None] + row0) * grid_w
                            + jnp.arange(cols)[None, :] + col0) + 12345)
             % (2 ** 31)).astype(jnp.uint32)
    return jax.vmap(jax.vmap(one))(seeds)
