"""Attention-extraction CLI: pathway products math + end-to-end smoke."""

import sys

import numpy as np
import pytest


def test_pathway_products_math():
    from tera_mind_tpu.cli.attn import pathway_products

    rng = np.random.default_rng(0)
    G, k = 10, 3
    attn = rng.random((G, G)).astype(np.float32)
    expr = rng.random((4, 4, G)).astype(np.float32)
    glst = np.array([1, 4, 7])
    out = pathway_products(attn, expr, glst)
    assert out.shape == (4, 4, 2 * k)
    # first k channels: attention-weighted expression over the sub-panel
    want0 = sum(attn[1, g2] * expr[..., g2] for g2 in glst)
    np.testing.assert_allclose(out[..., 0], want0, rtol=1e-5)
    # last k channels: the raw expression of the selected genes
    np.testing.assert_allclose(out[..., k:], expr[..., glst], rtol=0)


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_attn_cli_synthetic(tmp_path):
    """--calc_attn + --is_vis on synthetic genes produce tiles, the
    ensemble matrix, and figures (reference test_attn.py two-phase flow)."""
    from tera_mind_tpu.cli import attn as attn_cli

    out = tmp_path / "attn"
    argv = ["attn", "--calc_attn", "--is_vis", "--synthetic",
            "--hnm", "2", "--wnm", "2", "--out_dir", str(out)]
    old = sys.argv
    sys.argv = argv
    try:
        attn_cli.main()
    finally:
        sys.argv = old
    assert (out / "attn_ensemble.npy").exists()
    ens = np.load(out / "attn_ensemble.npy")
    assert ens.shape[0] == ens.shape[1]        # G x G, row-stochastic
    np.testing.assert_allclose(ens.sum(-1), 1.0, atol=1e-2)
    assert list((out / "vis").glob("group*.png"))
    assert list((out / "vis").glob("joint_ch*.png"))
    assert list((out / "vis").glob("surface_ch*.png"))
