"""Collective halo exchange for a 2D-sharded spatial state.

This is the TPU-native replacement for the reference's filesystem halo: in
CTPLab/Tera-MIND every tile re-reads its 8 neighbors' 32-px borders from
per-timestep zarr directories with barrier synchronization
(utils/MBADataset_tst.py:91-123, test_brn.py:240-255).  Here the state
lives sharded in HBM over a ('gr','gc') mesh, and each DDIM step exchanges
edge strips with ``lax.ppermute`` inside ``shard_map`` — two phases
(columns, then rows on the widened block) so corners ride along for free.

Out-of-mesh borders (the brain boundary) are filled with ``fill`` (-1, the
reference's empty-background value, MBADataset_tst.py:95).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _shift_recv(x: jnp.ndarray, axis_name: str, direction: int,
                fill: float) -> jnp.ndarray:
    """Receive a block from the neighbor at index (i - direction).

    direction=+1: receive from the LEFT/UP neighbor (data moves +1);
    direction=-1: receive from the RIGHT/DOWN neighbor.
    Mesh-edge receivers get ``fill``.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if n == 1:
        return jnp.full_like(x, fill)
    if direction > 0:
        perm = [(i, i + 1) for i in range(n - 1)]
        is_edge = idx == 0
    else:
        perm = [(i + 1, i) for i in range(n - 1)]
        is_edge = idx == n - 1
    recv = lax.ppermute(x, axis_name, perm)
    return jnp.where(is_edge, jnp.full_like(x, fill), recv)


def exchange_halo_2d(block: jnp.ndarray, pad: int, *, row_axis: str = "gr",
                     col_axis: str = "gc", fill: float = -1.0
                     ) -> jnp.ndarray:
    """(H, W, C) local block -> (H+2p, W+2p, C) with neighbor halos.

    Must run inside shard_map over a mesh with ``row_axis``/``col_axis``.
    """
    # phase 1: columns (W axis)
    from_left = _shift_recv(block[:, -pad:], col_axis, +1, fill)
    from_right = _shift_recv(block[:, :pad], col_axis, -1, fill)
    wide = jnp.concatenate([from_left, block, from_right], axis=1)
    # phase 2: rows on the widened block (corners included)
    from_up = _shift_recv(wide[-pad:], row_axis, +1, fill)
    from_down = _shift_recv(wide[:pad], row_axis, -1, fill)
    return jnp.concatenate([from_up, wide, from_down], axis=0)


def pad_halo_single(block: jnp.ndarray, pad: int,
                    fill: float = -1.0) -> jnp.ndarray:
    """Single-device equivalent: constant-pad the full grid's image."""
    return jnp.pad(block, ((pad, pad), (pad, pad), (0, 0)),
                   constant_values=fill)
