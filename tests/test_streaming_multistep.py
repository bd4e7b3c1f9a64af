"""Temporal halo blocking (StreamConfig.steps_per_window > 1): K DDIM
steps per window visit must be EXACT vs the plain one-step-per-sweep
protocol — the enlarged halo + per-inner-step shrink keeps every inner
patch grid on the reference's alignment, so no approximation is involved
(see StreamingGenerator._multistep_window)."""

import numpy as np
import pytest

from tera_mind_tpu.diffusion.sampler import DiffusionSampler, SamplerConfig
from tera_mind_tpu.diffusion.schedule import spaced_schedule
from tera_mind_tpu.parallel.generator import GeneratorConfig, TeraGenerator
from tera_mind_tpu.parallel.streaming import StreamConfig, StreamingGenerator

from test_streaming import _toy_model


def _mk(tile=64, patch=32, T="ddim3"):
    gconf = GeneratorConfig(tile=tile, patch=patch, gn_blk=16, snum=4,
                            n_slices=4, stains=2, gdim=8,
                            noise_backend="jax")
    sched = spaced_schedule("linear", 1000, T)
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=patch,
                                                    gn_sz=patch // 16))
    return TeraGenerator(sampler, _toy_model, gconf), gconf


def _field_gene(gconf, rows, cols, seed=5):
    """Per-tile gene arrays cut from ONE global field, so overlapping halo
    bins of neighboring tiles agree (the real-data invariant the multistep
    ring assembly relies on)."""
    nb, hb = gconf.tile // gconf.gn_blk, gconf.pad // gconf.gn_blk
    rng = np.random.default_rng(seed)
    field = (rng.random((rows * nb + 2 * hb, cols * nb + 2 * hb,
                         gconf.z_pad, gconf.gdim)) < 0.05).astype(np.uint8)
    gene = np.stack([
        np.stack([field[r * nb: r * nb + nb + 2 * hb,
                        c * nb: c * nb + nb + 2 * hb]
                  for c in range(cols)]) for r in range(rows)])
    return gene


@pytest.mark.parametrize("k", [2, 3])
def test_multistep_matches_single_step(k):
    """K-step visits == K separate one-step sweeps, including the grid
    border (-1 refill between inner steps) and non-divisible T (T=3, K=2
    runs visits of 2 then 1 steps)."""
    gen, gconf = _mk()
    rows = cols = 3
    gene = _field_gene(gconf, rows, cols)

    base = StreamingGenerator(gen, StreamConfig(
        block_rows=2, block_cols=2, progress=False, block_major=True))
    want = np.asarray(base.run(rows, cols, gene, row0=1, col0=1).read)

    ms = StreamingGenerator(gen, StreamConfig(
        block_rows=2, block_cols=2, progress=False, block_major=True,
        steps_per_window=k))
    got = np.asarray(ms.run(rows, cols, gene, row0=1, col0=1).read)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multistep_provider_and_cache():
    """Provider-fed gene (the whole-brain path) through the extended ring
    assembly + LRU cache gives the same result as the ndarray path."""
    gen, gconf = _mk()
    rows = cols = 3
    gene = _field_gene(gconf, rows, cols, seed=11)

    sc = StreamConfig(block_rows=2, block_cols=2, progress=False,
                      block_major=True, steps_per_window=3,
                      gene_cache_windows=2)
    a = np.asarray(StreamingGenerator(gen, sc).run(
        rows, cols, gene, row0=1, col0=1).read)
    calls = []

    def provider(r, c):
        calls.append((r, c))
        return gene[r, c]

    b = np.asarray(StreamingGenerator(gen, sc).run(
        rows, cols, provider, row0=1, col0=1).read)
    np.testing.assert_array_equal(a, b)
    # only in-grid tiles are ever requested
    assert all(0 <= r < rows and 0 <= c < cols for r, c in calls)


def test_multistep_k_bound_validated():
    gen, gconf = _mk()  # tile=64, patch=32 -> max K = 3
    with pytest.raises(ValueError):
        StreamingGenerator(gen, StreamConfig(steps_per_window=4))


class _ThreadExchange:
    """In-process stand-in for parallel/band.StripExchange: N band runs in
    N threads trade edge strips through a barrier-synchronized list."""

    def __init__(self, n):
        import threading
        self.n = n
        self.edges = [None] * n
        self.barrier = threading.Barrier(n)

    def for_rank(self, r):
        def exchange(top, bot):
            self.edges[r] = (np.array(top), np.array(bot))
            self.barrier.wait()
            gt = self.edges[r - 1][1] if r > 0 else None
            gb = self.edges[r + 1][0] if r < self.n - 1 else None
            gt = None if gt is None else gt.copy()
            gb = None if gb is None else gb.copy()
            self.barrier.wait()  # don't overwrite until everyone has read
            return gt, gb
        return exchange


@pytest.mark.parametrize("k", [1, 3])
def test_multistep_band_parallel(k):
    """Two row bands with ghost-strip exchange == the single full-grid
    sweep, for both plain (K=1) and temporally-blocked (K=3) visits.  K>1
    bands need the wider ghost strips, cross-band gene ring tiles and the
    band-aware border mask."""
    from concurrent.futures import ThreadPoolExecutor

    gen, gconf = _mk()
    rows, cols = 4, 3
    gene = _field_gene(gconf, rows, cols, seed=7)

    full = StreamingGenerator(gen, StreamConfig(
        block_rows=2, block_cols=2, progress=False, block_major=True,
        steps_per_window=k))
    want = np.asarray(full.run(rows, cols, gene, row0=1, col0=1).read)

    ex = _ThreadExchange(2)
    bands = [(0, 2), (2, 2)]  # (first local row in grid, band rows)

    def run_band(rank):
        b0, brows = bands[rank]
        sgen = StreamingGenerator(gen, StreamConfig(
            block_rows=2, block_cols=2, progress=False, block_major=True,
            steps_per_window=k))
        st = sgen.run(brows, cols, lambda r, c: gene[b0 + r, c],
                      row0=1 + b0, col0=1,
                      strip_exchange=ex.for_rank(rank),
                      rows_above=b0, rows_below=rows - b0 - brows)
        return np.asarray(st.read)

    with ThreadPoolExecutor(2) as pool:
        got = list(pool.map(run_band, range(2)))
    got = np.concatenate(got, axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multistep_checkpoint_cadence(tmp_path):
    """Checkpoints fire at visit boundaries whenever a multiple of
    checkpoint_every was crossed; resume completes the chain."""
    from tera_mind_tpu.data.tilestore import StateCheckpoint

    gen, gconf = _mk(T="ddim5")
    rows = cols = 2
    gene = _field_gene(gconf, rows, cols, seed=3)
    sc = StreamConfig(block_rows=2, block_cols=2, progress=False,
                      block_major=True, steps_per_window=2,
                      checkpoint_every=2)
    want = np.asarray(StreamingGenerator(gen, StreamConfig(
        block_rows=2, block_cols=2, progress=False,
        block_major=True)).run(rows, cols, gene, row0=1, col0=1).read)

    ck = StateCheckpoint(tmp_path / "st", fmt="grid")
    sgen = StreamingGenerator(gen, sc)
    got = np.asarray(sgen.run(rows, cols, gene, row0=1, col0=1,
                              checkpoint=ck).read)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert ck.latest() == 4  # epochs 2 (visit t=4..3) and 4 (t=2..1)

    # resume from the epoch-4 spill: one timestep remains.  Spills are
    # fp16 (reference zarr f2), so resumed state carries ~5e-4 quantization.
    resumed = StreamingGenerator(gen, sc).run(
        rows, cols, gene, row0=1, col0=1, checkpoint=ck)
    np.testing.assert_allclose(np.asarray(resumed.read), want, atol=5e-3)
