"""Pallas fused attention kernel vs the XLA einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Pallas TPU kernels only lower on the TPU backend (CPU supports interpret
# mode only); the CPU fallback suite skips them.
pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pallas TPU kernels need the TPU backend")


def _xla_ref(q, k, v, scale):
    logits = jnp.einsum("bnd,bmd->bnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p.astype(v.dtype), v)


@pytest.mark.parametrize("n,d", [(128, 128), (64, 256)])
def test_fused_attention_matches_xla(n, d):
    from tera_mind_tpu.ops.attention_kernel import fused_attention

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (4, n, d), jnp.float32)
    k = jax.random.normal(kk, (4, n, d), jnp.float32)
    v = jax.random.normal(kv, (4, n, d), jnp.float32)
    scale = 1.0 / d
    got = jax.jit(lambda a, b, c: fused_attention(a, b, c, scale))(q, k, v)
    want = jax.jit(lambda a, b, c: _xla_ref(a, b, c, scale))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


def test_fused_attention_grad_matches_xla():
    from tera_mind_tpu.ops.attention_kernel import fused_attention

    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, 64, 128), jnp.float32)
    k = jax.random.normal(kk, (2, 64, 128), jnp.float32)
    v = jax.random.normal(kv, (2, 64, 128), jnp.float32)
    scale = 0.01

    def loss_f(fn):
        return lambda a, b, c: jnp.sum(fn(a, b, c, scale) ** 2)

    g1 = jax.jit(jax.grad(loss_f(fused_attention), argnums=(0, 1, 2)))(
        q, k, v)
    g2 = jax.jit(jax.grad(loss_f(_xla_ref), argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


def test_cross_attention_pallas_backend_matches_xla():
    """The CrossAttention module gives the same result under both backends."""
    from tera_mind_tpu.models.attention import CrossAttention

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 2 * 16 * 16, 64))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 2 * 16 * 16, 64))
    mx = CrossAttention(dim=64, num_heads=2, n_win=2, backend="xla")
    mp = CrossAttention(dim=64, num_heads=2, n_win=2, backend="pallas")
    p = mx.init(jax.random.PRNGKey(4), x, y, 2)
    ax = jax.jit(lambda p_, a, b: mx.apply(p_, a, b, 2))(p, x, y)
    ap = jax.jit(lambda p_, a, b: mp.apply(p_, a, b, 2))(p, x, y)
    np.testing.assert_allclose(np.asarray(ax), np.asarray(ap),
                               atol=3e-2, rtol=3e-2)


def test_rmsnorm_fused_matches_xla():
    from tera_mind_tpu.ops.rmsnorm_kernel import rmsnorm_fused, _rmsnorm_xla

    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128),
                          jnp.bfloat16) * 3
    w = jax.random.normal(jax.random.PRNGKey(1), (128,), jnp.float32)
    got = jax.jit(lambda a, b: rmsnorm_fused(a, b, 1e-6))(x, w)
    want = jax.jit(lambda a, b: _rmsnorm_xla(a, b, 1e-6))(x, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_rmsnorm_fused_grad_matches_xla():
    from tera_mind_tpu.ops.rmsnorm_kernel import rmsnorm_fused, _rmsnorm_xla

    x = jax.random.normal(jax.random.PRNGKey(2), (16, 128)) * 2
    w = jnp.ones((128,)) * 1.5

    def loss(fn):
        return lambda a, b: jnp.sum(fn(a, b, 1e-6).astype(jnp.float32) ** 2)

    gx1, gw1 = jax.jit(jax.grad(loss(rmsnorm_fused), argnums=(0, 1)))(x, w)
    gx2, gw2 = jax.jit(jax.grad(loss(_rmsnorm_xla), argnums=(0, 1)))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=3e-2, rtol=3e-2)


def test_rmsnorm_fused_odd_rows_fallback():
    """Odd row counts (gene-token norms) take the XLA fallback path."""
    from tera_mind_tpu.ops.rmsnorm_kernel import rmsnorm_fused

    x = jax.random.normal(jax.random.PRNGKey(3), (3, 229, 64), jnp.bfloat16)
    w = jnp.ones((64,))
    out = jax.jit(lambda a, b: rmsnorm_fused(a, b, 1e-6))(x, w)
    assert out.shape == x.shape
