"""Per-region gene statistics pipeline (reference inft_mba.py parity)."""

import numpy as np

from tera_mind_tpu.metrics.gene_stats import (gene_expression_map,
                                              region_gene_stats,
                                              save_stats_csv, top_genes)


def _provider(r, c):
    rng = np.random.default_rng(r * 100 + c)
    stack = rng.poisson(lam=np.arange(1, 5)[None, None, None, :],
                        size=(4, 4, 2, 4)).astype(np.float32)
    return stack


def test_region_stats_match_naive():
    tiles = [(r, c) for r in range(3) for c in range(3)]
    ov = region_gene_stats(_provider, tiles, gdim=4)
    obs = np.concatenate([
        _provider(r, c).sum(axis=2).reshape(-1, 4) for r, c in tiles])
    np.testing.assert_allclose(ov.mean, obs.mean(0), rtol=1e-6)
    np.testing.assert_allclose(ov.std, obs.std(0, ddof=1), rtol=1e-6)


def test_region_mask_restricts_observations():
    tiles = [(0, 0), (0, 1)]

    def mask(r, c, stack):
        m = np.zeros(stack.shape[:2], bool)
        m[:2] = True          # top half of each tile only
        return m

    ov = region_gene_stats(_provider, tiles, gdim=4, mask_fn=mask)
    obs = np.concatenate([
        _provider(r, c).sum(axis=2)[:2].reshape(-1, 4) for r, c in tiles])
    np.testing.assert_allclose(ov.mean, obs.mean(0), rtol=1e-6)


def test_top_genes_and_csv(tmp_path):
    ov = region_gene_stats(_provider, [(0, 0)], gdim=4)
    names = ["a", "b", "c", "d"]
    tg = top_genes(ov, names, k=2)
    assert len(tg) == 2
    assert tg[0][1] >= tg[1][1]
    save_stats_csv(ov, names, tmp_path / "stats.csv")
    lines = (tmp_path / "stats.csv").read_text().splitlines()
    assert lines[0] == "gene,mean,std" and len(lines) == 5


def test_expression_map_stitching():
    tiles = [(r, c) for r in range(2) for c in range(2)]
    m = gene_expression_map(_provider, tiles, gene_idx=1)
    assert m.shape == (8, 8)
    np.testing.assert_allclose(m[:4, :4],
                               _provider(0, 0)[..., 1].sum(axis=2))
    np.testing.assert_allclose(m[4:, 4:],
                               _provider(1, 1)[..., 1].sum(axis=2))
