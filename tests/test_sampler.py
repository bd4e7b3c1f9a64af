"""Sampler tests: eps assembly, single-step math, loss plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from tera_mind_tpu.diffusion.sampler import DiffusionSampler, SamplerConfig
from tera_mind_tpu.diffusion.schedule import spaced_schedule, train_schedule
from tera_mind_tpu.ops.collage import patchify, to_collage, unpatchify

PS = 8  # tiny patch for pure-math tests


def make_sampler(T=5):
    return DiffusionSampler(spaced_schedule("linear", 1000, f"ddim{T}"),
                            SamplerConfig(patch_size=PS, gn_sz=2))


def mock_model(eps_value):
    """Model returning constant eps on the collage grid."""
    def fn(x_patches, t, rna, p1, p2):
        n_col = x_patches.shape[0] // (p1 * p2) * (p1 - 1) * (p2 - 1)
        col = jnp.full((n_col, PS, PS, x_patches.shape[-1]), eps_value,
                       jnp.float32)
        return col, jnp.zeros_like(x_patches)
    return fn


def test_assemble_eps_border_is_minus_one():
    s = make_sampler()
    p1 = p2 = 3
    col = jnp.ones(((p1 - 1) * (p2 - 1), PS, PS, 2))
    eps_pat = s._assemble_eps(col, p1, p2)
    assert eps_pat.shape == (p1 * p2, PS, PS, 2)
    img = np.asarray(unpatchify(eps_pat, p1, p2))
    half = PS // 2
    # interior = collage value, border = -1 (reference base.py:389)
    np.testing.assert_array_equal(img[:, half:-half, half:-half], 1.0)
    np.testing.assert_array_equal(img[:, :half, :], -1.0)
    np.testing.assert_array_equal(img[:, :, -half:], -1.0)


def test_denoise_step_matches_manual_math():
    s = make_sampler()
    rng = np.random.default_rng(0)
    b, H = 2, 2 * PS
    x_pad = jnp.asarray(rng.standard_normal((b, H + PS, H + PS, 2)),
                        jnp.float32)
    rna = jnp.zeros((b * 9, 2, 2, 8))
    t = jnp.array([3, 3], dtype=jnp.int32)
    out = s.denoise_step(mock_model(0.1), x_pad, rna, t)
    assert out.shape == (b, H, H, 2)

    # manual: patchify, eps assembled (0.1 interior, -1 border), ddim update
    xp = patchify(x_pad, PS)
    eps = s._assemble_eps(jnp.full((b * 4, PS, PS, 2), 0.1), 3, 3)
    sample, _ = s.schedule.ddim_step(xp, jnp.repeat(t, 9), eps)
    want = unpatchify(sample, 3, 3)[:, PS // 2:-PS // 2, PS // 2:-PS // 2]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_sample_loop_runs_and_bounded():
    s = make_sampler(T=3)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 2 * PS, 2 * PS, 2))
    rna = jnp.zeros((9, 2, 2, 8))
    out = s.sample(mock_model(0.0), noise, rna)
    assert out.shape == (1, 2 * PS, 2 * PS, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_training_loss_finite_and_depends_on_model():
    tsched = train_schedule("linear", 1000)
    s = DiffusionSampler(tsched, SamplerConfig(patch_size=PS, gn_sz=2))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((2, 3 * PS, 3 * PS, 2)), jnp.float32)
    rna = jnp.zeros((2, 6, 6, 8))
    t = jnp.array([10, 500], dtype=jnp.int32)

    def model(xp, tm, rp, p1, p2):
        n_col = xp.shape[0] // (p1 * p2) * (p1 - 1) * (p2 - 1)
        return (jnp.zeros((n_col, PS, PS, 2)), jnp.zeros_like(xp))

    loss0 = float(s.training_loss(model, x0, rna, t, jax.random.PRNGKey(0)))
    assert np.isfinite(loss0) and loss0 > 0

    def model_biased(xp, tm, rp, p1, p2):
        a, b = model(xp, tm, rp, p1, p2)
        return a + 100.0, b + 100.0

    loss1 = float(s.training_loss(model_biased, x0, rna, t,
                                  jax.random.PRNGKey(0)))
    assert loss1 > loss0
