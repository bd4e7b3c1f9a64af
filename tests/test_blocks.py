"""nn primitive + ResBlock tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tera_mind_tpu.models.blocks import ResBlock3D
from tera_mind_tpu.models.nn import (RMSNorm, downsample_2x, timestep_embedding,
                                     upsample_2x)


def test_rmsnorm_unit_scale():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 4, 8)) * 7.0, jnp.float32)
    m = RMSNorm()
    params = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(params, x))
    # per-position RMS of output must be ~1 (weights init to 1)
    rms = np.sqrt((y ** 2).mean(-1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-3)


def test_timestep_embedding_cos_first():
    emb = np.asarray(timestep_embedding(jnp.array([0]), 8))
    # at t=0: cos part == 1, sin part == 0 (reference nn.py:199-203)
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)


def test_up_down_sample():
    x = jnp.arange(2 * 1 * 2 * 2 * 3, dtype=jnp.float32).reshape(2, 1, 2, 2, 3)
    up = upsample_2x(x)
    assert up.shape == (2, 1, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(up[:, :, 0, 0]),
                                  np.asarray(up[:, :, 1, 1]))
    down = downsample_2x(up)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x))


def test_resblock_identity_at_init():
    """zero-init out conv makes the residual branch 0 at init when channels
    match (reference MBAblocks.py:187-189)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 8, 8, 16)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    blk = ResBlock3D(out_channels=16)
    params = blk.init(jax.random.PRNGKey(0), x, emb)
    y = blk.apply(params, x, emb)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_resblock_shapes_up_down():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 2, 8, 8, 12)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    down = ResBlock3D(out_channels=24, down=True)
    p = down.init(jax.random.PRNGKey(0), x, emb)
    assert down.apply(p, x, emb).shape == (2, 2, 4, 4, 24)
    up = ResBlock3D(out_channels=12, up=True)
    p = up.init(jax.random.PRNGKey(0), x, emb)
    assert up.apply(p, x, emb).shape == (2, 2, 16, 16, 12)
