"""Multi-host band-parallel streaming: per-timestep edge-strip exchange.

The host-streaming generator (parallel/streaming.py) keeps the whole-grid
state in ONE host's RAM.  For a pod (e.g. v5e-64 = 16 hosts), the brain is
split into horizontal row BANDS, one per process; each process streams its
band through its local chips.  Within a band the shared double-buffered
read state keeps halos consistent automatically; ACROSS bands, each
timestep the ``pad``-pixel top/bottom edge rows of every band must reach
its neighbors — the band analog of the reference's cross-worker filesystem
halo (MBADataset_tst.py:91-123, barriers test_brn.py:240-255), done here as
a compiled ``ppermute`` over a one-device-per-process mesh (ICI/DCN on a
real pod, gloo on CPU).

Strip volume per step per band: 2 * pad * width * channels floats — for
the whole brain (pad=32, width=414*256, 100 ch) ~2.7 GB fp32, trivially
overlappable with the ~minutes-long band sweep.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class StripExchange:
    """Exchanges band edge strips between neighbor processes.

    ``__call__(top_edge, bot_edge) -> (ghost_top, ghost_bot)`` where
    ghost_top is the UPPER neighbor's bottom ``pad`` rows (None for the
    first band) and ghost_bot the LOWER neighbor's top rows (None for the
    last band).  Edges are (pad, W, C) numpy arrays.
    """

    def __init__(self, pad: int, width: int, channels: int,
                 dtype=np.float32):
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        first = {}
        for d in devs:
            first.setdefault(d.process_index, d)
        per_proc = [first[p] for p in sorted(first)]
        self.nproc = len(per_proc)
        self.rank = jax.process_index()
        self.mesh = Mesh(np.array(per_proc), ("band",))
        self.shape = (pad, width, channels)
        self.dtype = dtype
        self._sh = NamedSharding(self.mesh, P("band"))

        n = self.nproc

        def body(s):
            # s local: (1, 2, pad, W, C) = [top_edge, bot_edge]
            top, bot = s[0, 0], s[0, 1]
            # my ghost_top = upper neighbor's bottom edge (data moves down)
            gtop = lax.ppermute(bot, "band",
                                [(i, i + 1) for i in range(n - 1)])
            # my ghost_bot = lower neighbor's top edge (data moves up)
            gbot = lax.ppermute(top, "band",
                                [(i + 1, i) for i in range(n - 1)])
            return jnp.stack([gtop, gbot])[None]

        from jax.experimental.shard_map import shard_map
        self._fn = jax.jit(shard_map(
            body, mesh=self.mesh,
            in_specs=P("band"), out_specs=P("band"), check_rep=False))

    def __call__(self, top_edge: np.ndarray, bot_edge: np.ndarray
                 ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        if self.nproc == 1:
            return None, None
        local = np.stack([top_edge, bot_edge]).astype(self.dtype)[None]
        arr = jax.make_array_from_process_local_data(self._sh, local)
        out = self._fn(arr)
        shard = np.asarray(list(out.addressable_shards)[0].data)[0]
        ghost_top = shard[0] if self.rank > 0 else None
        ghost_bot = shard[1] if self.rank < self.nproc - 1 else None
        return ghost_top, ghost_bot


def band_partition(total_rows: int, nproc: int, rank: int
                   ) -> Tuple[int, int]:
    """(first_row, n_rows) of this rank's band (balanced, remainder to the
    leading bands — every process must get >= 1 row)."""
    assert total_rows >= nproc, (total_rows, nproc)
    base, rem = divmod(total_rows, nproc)
    r0 = rank * base + min(rank, rem)
    return r0, base + (1 if rank < rem else 0)
