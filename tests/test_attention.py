"""Attention block tests: windowing, 1/d logit scaling, gene-gene symmetry,
adaLN chunk plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from tera_mind_tpu.models.attention import (CrossAttention, DiTBlock,
                                            GeneGeneBlock, _window_fold,
                                            _window_unfold)


def test_window_fold_roundtrip():
    rng = np.random.default_rng(0)
    z, s, nh, d = 2, 8, 3, 5
    t = jnp.asarray(rng.standard_normal((2, nh, z * s * s, d)), jnp.float32)
    folded = _window_fold(t, z, 2)
    assert folded.shape == (2, nh * 4, z * 4 * 4, d)
    back = _window_unfold(folded, z, 2, nh)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(t))


def test_window_fold_locality():
    """Tokens in window (0,0) come only from the top-left spatial quadrant."""
    z, s = 1, 4
    # value = 10*row + col
    grid = jnp.arange(s * s, dtype=jnp.float32).reshape(1, 1, s * s, 1)
    folded = np.asarray(_window_fold(grid, z, 2))[0, :, :, 0]
    np.testing.assert_array_equal(folded[0], [0, 1, 4, 5])     # TL quadrant
    np.testing.assert_array_equal(folded[1], [2, 3, 6, 7])     # TR
    np.testing.assert_array_equal(folded[2], [8, 9, 12, 13])   # BL


def test_cross_attention_matches_manual():
    """Windowless single-head attention must equal softmax(qn kn^T / d) v
    with per-head RMS-normed q, k (the reference's 1/d scaling)."""
    rng = np.random.default_rng(1)
    b, n, d = 2, 6, 8
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    m = CrossAttention(dim=d, num_heads=1, n_win=None)
    params = m.init(jax.random.PRNGKey(0), x, y, 1)
    out = np.asarray(m.apply(params, x, y, 1))

    p = params["params"]
    def dense(name, v):
        return v @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])
    def rms(name, v):
        w = np.asarray(p[name]["weight"])
        return w * v / np.sqrt((v ** 2).mean(-1, keepdims=True) + 1e-6)
    q = rms("q_norm", dense("q", np.asarray(x)))
    k = rms("k_norm", dense("k", np.asarray(y)))
    v = dense("v", np.asarray(y))
    logits = q @ k.transpose(0, 2, 1) / d
    attn = np.exp(logits - logits.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    want = dense("proj", attn @ v)
    # TPU f32 matmuls are bf16-reduced by default; compare loosely
    np.testing.assert_allclose(out, want, atol=3e-2)


def test_gene_block_symmetric_logits_and_shapes():
    rng = np.random.default_rng(2)
    b, z, g, gn = 2, 4, 10, 2
    x = jnp.asarray(rng.standard_normal((b, z, gn, gn, g)), jnp.float32)
    m = GeneGeneBlock(hidden_size=z * gn * gn, z_size=z)
    params = m.init(jax.random.PRNGKey(0), x, return_attn=True)
    out, attn = m.apply(params, x, return_attn=True)
    # z collapsed 4 -> 2 by the valid z-conv (kernel 3)
    assert out.shape == (b, 2, gn, gn, g)
    attn = np.asarray(attn)[:, 0]
    assert attn.shape == (b, g, g)
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)
    # logits are symmetric because k IS q: softmax rows of a symmetric
    # matrix: recover logits from attn up to per-row constant
    la = np.log(attn)
    sym_gap = (la - la.transpose(0, 2, 1))
    # row constants cancel in (la[i,j]-la[i,i]) vs (la[j,i]-la[j,j])
    resid = (la - np.diagonal(la, axis1=1, axis2=2)[:, :, None])
    np.testing.assert_allclose(resid, resid.transpose(0, 2, 1), atol=2e-2)


def test_dit_block_shapes_and_grad():
    rng = np.random.default_rng(3)
    b, z, s, c, g = 2, 2, 4, 8, 6
    x = jnp.asarray(rng.standard_normal((b, z, s, s, c)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, z, s, s, g)), jnp.float32)
    m = DiTBlock(hidden_size=c, n_win=2)
    params = m.init(jax.random.PRNGKey(0), x, cond)
    out = m.apply(params, x, cond)
    assert out.shape == x.shape

    def loss(p):
        return jnp.sum(m.apply(p, x, cond) ** 2)
    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
