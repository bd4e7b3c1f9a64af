"""Host-streaming whole-brain generation: state larger than HBM.

The in-HBM :class:`~tera_mind_tpu.parallel.generator.TeraGenerator` holds
the full tile-grid state on device — right for ROIs and for a multi-chip
mesh where the 286x414-tile brain shards to ~24 GB/host (SURVEY.md 7.3#5).
This module covers the complementary regime: a brain whose state exceeds
device (or even host-RAM) capacity on the available chips.

Design (timestep-major, like the reference's disk protocol
test_brn.py:232-273, but block- instead of tile-granular and with the time
loop's working set in host memory, not thousands of zarr files):

- Double-buffered host state (read = timestep t, write = t+1), plain numpy
  or disk-backed ``np.memmap`` — the same two-generation discipline as the
  reference's ``{out_dir}_{t}`` directories, so halos always read the
  previous timestep regardless of sweep order.
- Per timestep, sweep the grid in fixed (block_rows x block_cols)-tile
  windows.  The host assembles each window plus its halo from the read
  buffer (grid border filled with -1, MBADataset_tst.py:95), the device
  denoises the whole window one step (one compiled program, reused for
  every window — edge windows are shifted inward so shapes never change;
  overlapping re-computation is deterministic hence harmless), and the
  result lands in the write buffer.
- Gene data is pulled through a provider callable per tile, so the
  (potentially TB-scale) gene stack can live in zarr/tensorstore on disk
  and is never fully materialized.
- Resume/restart via :class:`StateCheckpoint` every ``checkpoint_every``
  steps (``--cur_epoch`` parity).
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tilestore import StateCheckpoint
from .generator import TeraGenerator

GeneProvider = Callable[[int, int], np.ndarray]  # (row, col) -> per-tile gene


def _as_provider(gene: Union[np.ndarray, GeneProvider]) -> GeneProvider:
    if callable(gene):
        return gene
    return lambda r, c: gene[r, c]


class HostState:
    """Double-buffered (read/write) whole-grid state on the host.

    Shape per buffer: (rows*tile, cols*tile, channels) of ``dtype``
    (default float32; the streaming generator passes its transfer dtype so
    a bf16-transfer run stores bf16 — bit-identical to an f32 store, since
    the f32 copy is cast to bf16 at every upload anyway, and it halves the
    buffer bytes and turns the per-visit staging cast into a memcpy).
    With ``memmap_dir`` the buffers are disk-backed memmaps (for state
    beyond host RAM); otherwise plain numpy arrays.
    """

    def __init__(self, rows: int, cols: int, tile: int, channels: int,
                 memmap_dir: Optional[str] = None, dtype=np.float32):
        self.rows, self.cols, self.tile, self.channels = \
            rows, cols, tile, channels
        self.dtype = np.dtype(dtype)
        shape = (rows * tile, cols * tile, channels)
        if memmap_dir is None:
            self.bufs = [np.zeros(shape, self.dtype),
                         np.zeros(shape, self.dtype)]
        else:
            d = Path(memmap_dir)
            d.mkdir(parents=True, exist_ok=True)
            self.bufs = [
                np.lib.format.open_memmap(d / f"state_{i}.npy", mode="w+",
                                          dtype=self.dtype, shape=shape)
                for i in range(2)]
            # NOTE: for ml_dtypes dtypes (bfloat16) numpy writes a raw
            # 'V2' (void) header, so the .npy files are not self-
            # describing.  They are in-process scratch (resume goes via
            # StateCheckpoint), but record the real dtype in a sidecar so
            # external tooling / debugging can reinterpret them
            # (ADVICE r3).
            (d / "state_dtype.txt").write_text(
                f"{self.dtype}\n{shape}\n")
        self.read_idx = 0

    @property
    def read(self) -> np.ndarray:
        return self.bufs[self.read_idx]

    @property
    def write(self) -> np.ndarray:
        return self.bufs[1 - self.read_idx]

    def swap(self) -> None:
        self.read_idx = 1 - self.read_idx

    def padded_window(self, r0: int, c0: int, br: int, bc: int, pad: int,
                      fill: float = -1.0,
                      ghost_top: Optional[np.ndarray] = None,
                      ghost_bot: Optional[np.ndarray] = None,
                      out: Optional[np.ndarray] = None) -> np.ndarray:
        """Window of (br x bc) tiles at tile-origin (r0, c0) with a ``pad``-px
        halo from the read buffer; outside the grid -> ``fill``, unless a
        ghost strip covers it (band-parallel mode: ghost_top/ghost_bot are
        the neighbor bands' previous-timestep edge rows, (pad, W, C)).

        ``out``: optional reusable staging buffer of the window shape (any
        float dtype — the copy casts on assignment, so a bf16 staging
        buffer also absorbs the transfer-dtype conversion).  Only the
        border strips outside the grid are re-filled, not the whole
        buffer — interior windows skip the fill entirely."""
        t = self.tile
        h0, w0 = r0 * t - pad, c0 * t - pad
        h1, w1 = (r0 + br) * t + pad, (c0 + bc) * t + pad
        shape = (h1 - h0, w1 - w0, self.channels)
        sh0, sw0 = max(h0, 0), max(w0, 0)
        sh1 = min(h1, self.rows * t)
        sw1 = min(w1, self.cols * t)
        if out is None:
            out = np.full(shape, fill, self.dtype)
        else:
            assert out.shape == shape, (out.shape, shape)
            # fill only the strips the grid copy won't overwrite
            if sh0 - h0:
                out[: sh0 - h0] = fill
            if h1 - sh1:
                out[-(h1 - sh1):] = fill
            if sw0 - w0:
                out[:, : sw0 - w0] = fill
            if w1 - sw1:
                out[:, -(w1 - sw1):] = fill
        out[sh0 - h0: sh1 - h0, sw0 - w0: sw1 - w0] = \
            self.read[sh0:sh1, sw0:sw1]
        if ghost_top is not None and h0 < 0:
            # rows [h0, 0) come from the upper band's bottom edge (the
            # ghost strip covers [-len(ghost_top), 0), which may be larger
            # than this window's pad in multi-step mode)
            out[: -h0, sw0 - w0: sw1 - w0] = \
                ghost_top[ghost_top.shape[0] + h0:, sw0:sw1]
        if ghost_bot is not None and h1 > self.rows * t:
            over = h1 - self.rows * t
            out[-over:, sw0 - w0: sw1 - w0] = ghost_bot[:over, sw0:sw1]
        return out


@dataclasses.dataclass
class StreamConfig:
    block_rows: int = 2     # tiles per device window (rows)
    block_cols: int = 2     # tiles per device window (cols)
    checkpoint_every: int = 0
    memmap_dir: Optional[str] = None
    progress: bool = True
    block_major: bool = False  # one patch grid per window (see
                               # TeraGenerator._window_update): same result,
                               # fewer patches + bigger batches
    gene_cache_windows: int = 8  # LRU bound on cached per-window gene
                                 # blocks; 0 = unbounded (small grids only —
                                 # a whole-brain sweep would otherwise grow
                                 # the cache to the full ~TB gene stack).
                                 # Peak host memory stays ~2 state buffers +
                                 # O(gene_cache_windows) gene blocks.
    transfer_dtype: str = "float32"  # host<->device state dtype.
                                 # "bfloat16" halves the dominant cost of
                                 # streaming (the per-window state round
                                 # trip); the reference round-trips fp16
                                 # through disk every step (test_brn.py
                                 # zarr f2), so reduced-precision interstep
                                 # state matches its regime.  Opt-in: f32
                                 # default keeps bit-equality with the
                                 # in-HBM generator (tests/test_streaming).
    pipeline: bool = True        # keep `inflight` windows in flight via a
                                 # small worker pool: window k+2's halo
                                 # assembly and H2D overlap window k+1's
                                 # compute and window k's D2H (this host's
                                 # tunneled PCIe moves ~30-40 MB/s each
                                 # way, so un-overlapped transfers dominate
                                 # the sweep).  Results are identical —
                                 # windows write disjoint regions and read
                                 # the immutable read buffer.
    inflight: int = 3            # windows in flight per device when
                                 # pipeline=True (3 = assemble/H2D +
                                 # compute + D2H stages in parallel).
                                 # Each worker reuses one staging buffer,
                                 # so peak extra host memory is
                                 # inflight * one padded window.
    gene_device_cache_gb: float = 4.0
                                 # HBM budget (GB per device) for keeping
                                 # window gene blocks ON DEVICE across
                                 # timestep sweeps.  Gene conditioning is
                                 # timestep-invariant, but the sweep visits
                                 # every window each step — without this
                                 # cache the same ~10 MB/tile uint8 stack
                                 # rides the slow host link every visit
                                 # (~25-40% of H2D bytes).  Pin-first
                                 # semantics, not LRU: once the budget is
                                 # full, later windows transfer per visit —
                                 # an LRU would thrash under the cyclic
                                 # sweep order and cache nothing.  0
                                 # disables (bit-identical either way; the
                                 # device array holds the same bytes).
    state_dtype: Optional[str] = None
                                 # dtype of the HOST state buffers.  None =
                                 # same as transfer_dtype, so a bf16-transfer
                                 # run stores bf16 host state: bit-identical
                                 # results (the f32 buffer was cast to bf16
                                 # at every upload anyway — storing f32 adds
                                 # no information between bf16 round trips),
                                 # half the host RAM / memmap bytes, and the
                                 # per-visit staging cast and write-back
                                 # upcast become plain memcpys (they were
                                 # the dominant host-side assembly cost).
                                 # Set "float32" explicitly to keep an f32
                                 # master copy with reduced-precision
                                 # transfers.
    steps_per_window: int = 1    # temporal halo blocking: advance K DDIM
                                 # steps per window visit using an enlarged
                                 # halo of pad + patch*(K-1) px, shrinking
                                 # the window by `patch` px per side per
                                 # inner step (keeps every inner patch grid
                                 # on the reference protocol's alignment).
                                 # Bit-exact vs K=1 (tests), cuts the
                                 # dominant host<->device state traffic ~K
                                 # times for a modest recompute overlap.
                                 # Requires field-consistent gene halos
                                 # (overlapping bins of neighboring tiles
                                 # agree — true for real data).  K=1 is
                                 # the plain one-step protocol.


class StreamingGenerator:
    """Whole-brain reverse diffusion with host-resident state.

    Wraps a :class:`TeraGenerator` (reusing its per-tile update and
    geometry) and adds the block-streaming outer loops.
    """

    def __init__(self, gen: TeraGenerator, sconf: StreamConfig,
                 devices: Optional[list] = None):
        """``devices``: local devices to stream windows through in parallel
        (default: the process default device).  All devices sweep disjoint
        windows of the SAME double-buffered host state, so the read buffer
        stays globally consistent — the multi-chip-per-host whole-brain
        mode (each chip needs only one window of state+genes in HBM)."""
        self.gen = gen
        self.sconf = sconf
        c = gen.conf
        if c.window_chunk < 0:
            # resolve AUTO (-1) for the streaming path: streaming never
            # goes through compile_step/auto_plan, so -1 used to silently
            # resolve to the safest chunk 1 via _wchunk — silently
            # changing the measured streaming default (ADVICE r4).  Pick
            # the largest z-window chunk whose patch batch stays under
            # the analytic memory bound: reproduces the measured chunk-5
            # default at block 2x2 (405 patches; BASELINE.md round-4
            # streaming attribution) and steps down for bigger blocks.
            import dataclasses as _dc
            import os as _os
            p_max = int(_os.environ.get("TMT_MAX_PATCHES", "600"))
            tpp = c.tile // c.patch
            ppw = ((sconf.block_rows * tpp + 1)
                   * (sconf.block_cols * tpp + 1)
                   if sconf.block_major else (tpp + 1) ** 2)
            wc = 1
            for d in range(1, c.n_win + 1):
                if c.n_win % d == 0 and d * ppw <= p_max:
                    wc = d
            gen.conf = c = _dc.replace(c, window_chunk=wc)
            print(f"streaming: window_chunk auto -> {wc} "
                  f"({ppw} patches/z-window)", flush=True)
        self._pad = c.pad
        self.devices = devices
        # one compiled program per run: window denoise at fixed shape
        self._window_fn = jax.jit(self._window_step)
        # temporal-blocking variants, jitted per inner-step count k
        self._ms_fns = {}
        import threading
        self._ms_lock = threading.Lock()  # window workers share the memo
        if sconf.steps_per_window > 1:
            if c.patch * (sconf.steps_per_window - 1) > c.tile + c.pad:
                raise ValueError(
                    f"steps_per_window={sconf.steps_per_window} needs a gene"
                    f" halo of {c.pad + c.patch * (sconf.steps_per_window - 1)}"
                    f" px; one neighbor-tile ring provides at most"
                    f" {c.tile + c.pad} px (max K = tile//patch + 1)")
        if devices:
            self._dev_params = {d: jax.device_put(gen.params, d)
                                for d in devices}

    def _halo_px(self, k: int) -> int:
        """Input halo (px) a k-step window visit needs."""
        c = self.gen.conf
        return c.pad + c.patch * (k - 1)

    # ---- device step over one halo-padded window ----------------------
    def _window_step(self, params, padded: jnp.ndarray,
                     gene_blk: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """padded: (br*tile+2p, bc*tile+2p, ch); gene_blk: (br, bc, ...).
        Returns (br*tile, bc*tile, ch)."""
        c = self.gen.conf
        br, bc = gene_blk.shape[:2]
        padded = padded.astype(jnp.float32)  # no-op for f32 transfers
        out_dt = getattr(jnp, self.sconf.transfer_dtype)
        if self.sconf.block_major:
            return self.gen._window_update(params, padded, gene_blk,
                                           t).astype(out_dt)

        def body(carry, idx):
            r, cc = idx // bc, idx % bc
            out = self.gen._tile_update(params, padded, gene_blk[r, cc],
                                        r, cc, t)
            return carry, out

        _, tiles = jax.lax.scan(body, 0, jnp.arange(br * bc))
        tiles = tiles.reshape(br, bc, c.tile, c.tile, c.channels)
        return tiles.transpose(0, 2, 1, 3, 4).reshape(
            br * c.tile, bc * c.tile, c.channels).astype(out_dt)

    # ---- temporal halo blocking: k steps per window visit ---------------
    def _multistep_window(self, params, padded: jnp.ndarray,
                          bin_grid: jnp.ndarray, t0: jnp.ndarray,
                          oy: jnp.ndarray, ox: jnp.ndarray, *, k: int,
                          bounds: tuple) -> jnp.ndarray:
        """Advance ``k`` DDIM steps on one window (trapezoid time-tiling).

        padded:   (B + 2*halo, ...) window where halo = pad + patch*(k-1);
                  its interior B px come out valid at t0-k.
        bin_grid: gene bins covering exactly the padded extent.
        oy/ox:    grid-local px origin of ``padded`` — can be negative at
                  grid borders; pixels outside ``bounds`` (the REAL data
                  extent: (ylo, yhi, xlo, xhi) in local px — extends past
                  the local band when neighbor bands exist) are re-pinned
                  to the protocol's -1 fill before EVERY inner step (the
                  reference refills the halo each epoch,
                  MBADataset_tst.py:95).

        Why this is exact (not an approximation): one protocol step's
        output pixel depends only on inputs within its own 64-px patch and
        the neighbor patch overlapping its shifted collage patch — i.e.
        entirely inside a window whose patch grid ALIGNS with the
        reference's (global coords ≡ pad mod patch).  Each inner step
        consumes the 2*pad border of its window and then crops a further
        2*pad so the next window's patch grid stays aligned; after k steps
        the surviving interior has only ever read protocol-exact values.
        """
        c = self.gen.conf
        p, pad, gb = c.patch, c.pad, c.gn_blk
        bshift = p // gb
        out_dt = getattr(jnp, self.sconf.transfer_dtype)
        x = padded.astype(jnp.float32)
        n0 = bin_grid.shape[0]
        m0 = bin_grid.shape[1]
        for j in range(k):
            H, W = x.shape[:2]
            gy = oy + p * j + jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
            gx = ox + p * j + jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            outside = ((gy < bounds[0]) | (gy >= bounds[1]) |
                       (gx < bounds[2]) | (gx >= bounds[3]))
            x = jnp.where(outside[:, :, None], -1.0, x)
            bins_j = bin_grid[j * bshift: n0 - j * bshift,
                              j * bshift: m0 - j * bshift]
            core = self.gen._window_update_bins(params, x, bins_j,
                                                t0 - j)
            x = core if j == k - 1 else core[pad:-pad, pad:-pad]
        return x.astype(out_dt)

    def _ms_fn(self, k: int, bounds: tuple):
        key = (k, bounds)
        with self._ms_lock:  # one jit wrapper per key across workers
            if key not in self._ms_fns:
                import functools
                self._ms_fns[key] = jax.jit(functools.partial(
                    self._multistep_window, k=k, bounds=bounds))
            return self._ms_fns[key]

    # ---- init ----------------------------------------------------------
    def init_state(self, state: HostState, *, row0: int = 1, col0: int = 1,
                   grid_w: int = 416) -> None:
        """Fill the read buffer with the deterministic per-tile init noise
        (LCG parity, MBADataset_tst.py:11-14)."""
        c = self.gen.conf
        for r in range(state.rows):
            for cc in range(state.cols):
                from ..data.noise import tile_init_noise
                n = tile_init_noise(row0 + r, col0 + cc, grid_w,
                                    (c.tile, c.tile, c.channels),
                                    backend=c.noise_backend)
                state.read[r * c.tile:(r + 1) * c.tile,
                           cc * c.tile:(cc + 1) * c.tile] = n

    # ---- the outer loop -------------------------------------------------
    def run(self, rows: int, cols: int,
            gene: Union[np.ndarray, GeneProvider], *,
            row0: int = 1, col0: int = 1, grid_w: int = 416,
            checkpoint: Optional[StateCheckpoint] = None,
            state: Optional[HostState] = None,
            start_t: Optional[int] = None,
            strip_exchange=None,
            rows_above: int = 0, rows_below: int = 0) -> HostState:
        """``state``+``start_t`` resume from an explicit timestep (the
        reference's --cur_epoch); otherwise the latest spill (if any).

        Band-parallel mode: ``rows`` is this process's BAND of the global
        grid (``row0`` its absolute first tile row) and ``strip_exchange``
        a :class:`~tera_mind_tpu.parallel.band.StripExchange` — after every
        visit each band trades its top/bottom edge rows (``pad`` px, or
        ``pad + patch*(K-1)`` with temporal blocking — size the
        StripExchange accordingly) with its neighbor bands, which feed the
        next visit's halos (parallel/band.py).  ``rows_above``/``rows_below``
        say how many tile rows of REAL data exist beyond this band (so the
        multi-step border mask only pins truly-out-of-grid pixels, and the
        gene provider is consulted for the cross-band neighbor-tile ring —
        it must accept r in [-1, rows] there)."""
        c = self.gen.conf
        s = self.sconf
        br = min(s.block_rows, rows)
        bc = min(s.block_cols, cols)
        provider = _as_provider(gene)
        T = self.gen.sampler.schedule.num_timesteps
        K = s.steps_per_window
        if strip_exchange is not None and self._halo_px(K) > rows * c.tile:
            raise ValueError(
                f"band of {rows} tile rows is shorter than the "
                f"{self._halo_px(K)}-px ghost strip steps_per_window={K} "
                f"needs")
        if state is not None and start_t is None:
            # an explicit state with no timestep would silently restart the
            # whole reverse process from T on top of it (round-1 VERDICT
            # weak #5) — make the caller say where the state sits
            raise ValueError("explicit `state` requires `start_t` (the "
                             "remaining timestep count); pass start_t=T to "
                             "really restart from pure noise")
        if start_t is None:
            start_t = T

        if state is None:
            state = HostState(rows, cols, c.tile, c.channels,
                              memmap_dir=s.memmap_dir,
                              dtype=np.dtype(getattr(
                                  jnp, s.state_dtype or s.transfer_dtype)))
            resumed = False
            if checkpoint is not None:
                latest = checkpoint.latest()
                if latest is not None:
                    grid, meta = checkpoint.load_grid(latest)
                    # state-protocol guard (reference test_brn.py:178)
                    assert meta["rows"] == rows and meta["cols"] == cols \
                        and meta["size"] == c.tile \
                        and meta["channels"] == c.channels, (meta, c)
                    for r in range(rows):
                        for cc in range(cols):
                            state.read[r * c.tile:(r + 1) * c.tile,
                                       cc * c.tile:(cc + 1) * c.tile] = \
                                grid[r, cc]
                    start_t = T - latest
                    resumed = True
            if not resumed:
                self.init_state(state, row0=row0, col0=col0, grid_w=grid_w)

        # window origins: shifted inward at the edges so every window has
        # the same (br, bc) shape -> a single compiled program
        r_orig = sorted({min(r, rows - br) for r in range(0, rows, br)})
        c_orig = sorted({min(cc, cols - bc) for cc in range(0, cols, bc)})

        # per-window gene cache (timestep-invariant), LRU-bounded so a
        # whole-brain sweep holds only O(gene_cache_windows) blocks in RAM.
        # Window workers hit it concurrently, so structural ops take a
        # lock; the (possibly slow) provider reads stay outside it — a
        # window appears at most once per sweep, so concurrent same-key
        # builds don't arise.
        import threading
        from collections import OrderedDict
        gene_cache: OrderedDict = OrderedDict()
        cache_lock = threading.Lock()

        def _cache_put(key, blk):
            with cache_lock:
                gene_cache[key] = blk
                if s.gene_cache_windows and \
                        len(gene_cache) > s.gene_cache_windows:
                    gene_cache.popitem(last=False)
            return blk

        def _cache_get(key):
            with cache_lock:
                blk = gene_cache.get(key)
                if blk is not None:
                    gene_cache.move_to_end(key)
                return blk

        def gene_block(r0: int, c0: int) -> np.ndarray:
            key = (r0, c0)
            hit = _cache_get(key)
            if hit is not None:
                return hit
            # provider takes GRID-LOCAL tile indices; a provider over a
            # global store should bake its own offsets into the closure
            tiles = [[provider(r0 + i, c0 + j)
                      for j in range(bc)] for i in range(br)]
            return _cache_put(key, np.stack([np.stack(row)
                                             for row in tiles]))

        nb, hb = c.tile // c.gn_blk, c.pad // c.gn_blk

        def gene_block_ext(r0: int, c0: int, k: int) -> np.ndarray:
            """Assembled bin grid covering the k-step padded window
            (B + 2*(pad + patch*(k-1)) px): the core tiles plus whatever
            of the one-tile neighbor ring is inside the grid; out-of-grid
            bins stay zero (they only ever condition pixels that the
            border mask re-pins to -1 before they can propagate inward).
            Paste order ring-then-core so the grid-border ring keeps the
            border tiles' own halo bins, exactly like
            :func:`~..generator.assemble_bins` on the core alone."""
            key = (r0, c0, k)
            hit = _cache_get(key)
            if hit is not None:
                return hit
            Hb = self._halo_px(k) // c.gn_blk
            gh, gw = br * nb + 2 * Hb, bc * nb + 2 * Hb
            canvas = None
            core = [(i, j) for i in range(br) for j in range(bc)]
            ring = [(i, j) for i in range(-1, br + 1)
                    for j in range(-1, bc + 1) if (i, j) not in core]
            r_lo = -1 if rows_above else 0
            r_hi = rows + (1 if rows_below else 0)
            for i, j in ring + core:
                ti, tj = r0 + i, c0 + j
                if not (r_lo <= ti < r_hi and 0 <= tj < cols):
                    continue
                arr = np.asarray(provider(ti, tj))
                if canvas is None:
                    canvas = np.zeros((gh, gw) + arr.shape[2:], arr.dtype)
                # tile bins live at [i*nb - hb, i*nb + nb + hb) relative to
                # the block; the canvas starts at -Hb
                oy, ox = i * nb - hb + Hb, j * nb - hb + Hb
                sy0, sx0 = max(0, -oy), max(0, -ox)
                sy1 = min(arr.shape[0], gh - oy)
                sx1 = min(arr.shape[1], gw - ox)
                if sy0 >= sy1 or sx0 >= sx1:
                    continue
                canvas[oy + sy0: oy + sy1, ox + sx0: ox + sx1] = \
                    arr[sy0:sy1, sx0:sx1]
            assert canvas is not None, "empty gene window"
            return _cache_put(key, canvas)

        # device-resident gene cache: the sweep re-visits every window each
        # timestep but its gene block never changes — upload once and keep
        # it in HBM up to the configured budget (pin-first, per device).
        dev_gene: dict = {}
        dev_gene_bytes: dict = {}
        dev_budget = int(self.sconf.gene_device_cache_gb * 1e9)

        def gene_on_device(r0: int, c0: int, k: int, device):
            key = (r0, c0, k, device)
            with cache_lock:
                arr = dev_gene.get(key)
            if arr is not None:
                return arr
            blk = gene_block(r0, c0) if k == 1 else gene_block_ext(r0, c0, k)
            arr = (jnp.asarray(blk) if device is None
                   else jax.device_put(blk, device))
            if dev_budget:
                with cache_lock:
                    used = dev_gene_bytes.get(device, 0)
                    if used + arr.nbytes <= dev_budget:
                        dev_gene[key] = arr
                        dev_gene_bytes[device] = used + arr.nbytes
            return arr

        windows = [(r0, c0) for r0 in r_orig for c0 in c_orig]

        # band-parallel: ghosts = neighbor bands' edge rows for the state
        # currently in the read buffer (exchanged once for the initial
        # state, then after every swap)
        ghosts = [None, None]

        def exchange_ghosts():
            if strip_exchange is None:
                return
            p = self._halo_px(K)
            ghosts[0], ghosts[1] = strip_exchange(
                np.ascontiguousarray(state.read[:p]),
                np.ascontiguousarray(state.read[-p:]))

        exchange_ghosts()

        tdt = np.dtype(getattr(jnp, self.sconf.transfer_dtype))
        cur = {"t": start_t - 1, "k": 1}  # the active visit, read by
        #                                   dispatch_window at call time

        # per-worker reusable staging buffers (the padded-window copy casts
        # straight into the transfer dtype; a worker's previous window is
        # fully fetched before it assembles the next, so reuse is safe)
        tls = threading.local()

        def _staging(shape) -> np.ndarray:
            bufs = getattr(tls, "bufs", None)
            if bufs is None:
                bufs = tls.bufs = {}
            buf = bufs.get(shape)
            if buf is None:
                buf = bufs[shape] = np.empty(shape, tdt)
            return buf

        # TMT_STREAM_TIMING=1: per-phase wall-time breakdown (host halo
        # assembly / H2D / device queue / D2H), printed at the end of the
        # run.  Adds sync points, so the pipeline overlap is disabled while
        # measuring — use it to find the bottleneck, not to bench.
        tim = ({"asm": 0.0, "h2d": 0.0, "disp": 0.0, "queue": 0.0,
                "d2h": 0.0, "n": 0}
               if os.environ.get("TMT_STREAM_TIMING") else None)

        def dispatch_window(r0: int, c0: int, device=None):
            """Assemble + enqueue one window; returns the (async) device
            output with its destination.  jax dispatch returns before the
            compute finishes, so the caller can overlap the next window's
            host-side assembly with this one's transfer + compute."""
            t0, k = cur["t"], cur["k"]
            tw0 = time.perf_counter() if tim is not None else 0.0
            halo = self._halo_px(k)
            stage = _staging((br * c.tile + 2 * halo,
                              bc * c.tile + 2 * halo, c.channels))
            padded = state.padded_window(r0, c0, br, bc, halo,
                                         ghost_top=ghosts[0],
                                         ghost_bot=ghosts[1], out=stage)
            gblk = gene_on_device(r0, c0, k, device)
            if k == 1:
                fn, args = self._window_fn, (padded, gblk, np.int32(t0))
            else:
                fn = self._ms_fn(k, (-rows_above * c.tile,
                                     (rows + rows_below) * c.tile,
                                     0, cols * c.tile))
                args = (padded, gblk, np.int32(t0),
                        np.int32(r0 * c.tile - halo),
                        np.int32(c0 * c.tile - halo))
            if tim is not None:
                tim["asm"] += time.perf_counter() - tw0
                tw0 = time.perf_counter()
                dargs = [jax.device_put(a, device) for a in args]
                jax.block_until_ready(dargs)
                tim["h2d"] += time.perf_counter() - tw0
                tim["n"] += 1
                tw0 = time.perf_counter()
                out = fn(self.gen.params if device is None
                         else self._dev_params[device], *dargs)
                tim["disp"] += time.perf_counter() - tw0
            elif device is None:
                out = fn(self.gen.params, *map(jnp.asarray, args))
            else:
                out = fn(self._dev_params[device],
                         *(jax.device_put(a, device) for a in args))
            try:
                # start the D2H as soon as the compute is enqueued, so the
                # fetch below finds the bytes already in flight (the link
                # is full-duplex: this overlaps the next window's upload)
                out.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            return out, r0, c0

        def fetch_window(pending) -> None:
            out, r0, c0 = pending
            if tim is not None:
                tq0 = time.perf_counter()
                jax.block_until_ready(out)
                tim["queue"] += time.perf_counter() - tq0
                tq0 = time.perf_counter()
                out = np.asarray(out)
                tim["d2h"] += time.perf_counter() - tq0
            ht, wt = r0 * c.tile, c0 * c.tile
            state.write[ht: ht + br * c.tile,
                        wt: wt + bc * c.tile] = \
                np.asarray(out).astype(state.dtype, copy=False)

        def do_window(r0: int, c0: int, device=None) -> None:
            fetch_window(dispatch_window(r0, c0, device))

        # worker pool: `inflight` windows in flight per device (each worker
        # owns one staging buffer and runs assemble -> H2D -> compute -> D2H
        # synchronously, so concurrency == worker count).  The timing path
        # stays sequential — its per-phase blocks would otherwise race.
        ndev = len(self.devices) if self.devices else 1
        n_workers = (max(1, self.sconf.inflight) * ndev
                     if self.sconf.pipeline and tim is None else ndev)
        pool = None
        if n_workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(n_workers)

        t = start_t - 1
        prev_epoch = T - start_t  # epochs completed before this run
        while t >= 0:
            k = min(K, t + 1)
            cur["t"], cur["k"] = t, k
            if pool is None:
                for r0, c0 in windows:
                    do_window(r0, c0, self.devices[0] if self.devices
                              else None)
            else:
                # round-robin the window sweep over local devices; writes
                # are disjoint and halos read the immutable read-buffer, so
                # per-window order is irrelevant within a timestep
                futs = [pool.submit(do_window, r0, c0,
                                    self.devices[i % ndev]
                                    if self.devices else None)
                        for i, (r0, c0) in enumerate(windows)]
                for f in futs:
                    f.result()
            state.swap()
            exchange_ghosts()
            t_last = t - k + 1        # deepest timestep just completed
            epoch = T - t_last        # epochs completed
            if s.progress:
                span = f"t={t}" if k == 1 else f"t={t}..{t_last}"
                print(f"[stream] step {span} done ({epoch}/{T})", flush=True)
            if checkpoint is not None and s.checkpoint_every and \
                    t_last > 0 and (epoch // s.checkpoint_every >
                                    prev_epoch // s.checkpoint_every):
                grid = state.read.reshape(rows, c.tile, cols, c.tile,
                                          c.channels).transpose(0, 2, 1, 3, 4)
                checkpoint.save_grid(epoch, grid, hst=row0 * c.tile,
                                     wst=col0 * c.tile, size=c.tile)
                checkpoint.prune(keep_t=epoch)
            prev_epoch = epoch
            t -= k
        if pool is not None:
            pool.shutdown()
        if tim is not None and tim["n"]:
            phases = {k2: v for k2, v in tim.items() if k2 != "n"}
            print(f"[stream timing] windows={tim['n']} " +
                  " ".join(f"{k2}={v:.2f}s" for k2, v in phases.items()) +
                  f" total={sum(phases.values()):.2f}s", flush=True)
        return state
