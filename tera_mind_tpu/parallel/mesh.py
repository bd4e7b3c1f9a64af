"""Device-mesh helpers.

Replaces the reference's NCCL/mp.spawn process topology (test_brn.py:26-35,
experiment.py:485) with ``jax.sharding.Mesh`` axes:

- training: 1D ``('dp',)`` data parallelism (grad all-reduce compiled in),
- tera-scale generation: 2D ``('gr', 'gc')`` spatial grid over the brain
  tile map with collective halo exchange (SURVEY.md 5.7 design).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_names: Sequence[str] = ("dp",),
              shape: Optional[Tuple[int, ...]] = None,
              devices=None) -> Mesh:
    """Build a mesh over available devices.

    ``shape`` entries of -1 are inferred (at most one).  Defaults to all
    devices on one axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (-1,) * 1 if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis mesh")
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, (shape, n)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (replaces torch init_process_group /
    MASTER_ADDR rendezvous, test_brn.py:26-35).  No-op if single-process
    or args are unset."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def is_primary() -> bool:
    """Rank-0 gate for host-side IO (reference gpu_id==0 checks)."""
    return jax.process_index() == 0


def host_barrier(name: str = "barrier") -> None:
    """Cross-host sync point (replaces torch.distributed.barrier,
    utils/dist_utils.py:5-15).  No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def host_broadcast(value, root: int = 0):
    """Broadcast a host value from process `root` to all processes
    (replaces dist broadcast, utils/dist_utils.py:18-24)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(
        value, is_source=jax.process_index() == root)
