"""Schedule math unit tests (reference semantics: diffusion/base.py:71-105,
649-710; diffusion/diffusion.py:5-94)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tera_mind_tpu.diffusion.schedule import (
    Schedule, named_beta_schedule, space_timesteps, spaced_schedule,
    train_schedule)


def test_linear_betas_endpoints():
    b = named_beta_schedule("linear", 1000)
    assert b.dtype == np.float64
    assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)
    # scale-invariance in the T->inf limit: T=500 doubles the endpoints
    b500 = named_beta_schedule("linear", 500)
    assert np.isclose(b500[0], 2e-4) and np.isclose(b500[-1], 0.04)


def test_cosine_and_const():
    b = named_beta_schedule("cosine", 100)
    assert (b > 0).all() and (b <= 0.999).all()
    b = named_beta_schedule("const0.008", 1000)
    assert np.allclose(b, 0.008)


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim15")
    assert len(steps) == 15
    assert steps[0] == 0
    stride = steps[1] - steps[0]
    assert all(b - a == stride for a, b in zip(steps, steps[1:]))
    # section-count form
    steps = space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45


def test_spaced_schedule_alphas_match_subset():
    """Respaced alphas_cumprod must equal the original at kept steps
    (diffusion.py:84-94)."""
    full = train_schedule("linear", 1000)
    sp = spaced_schedule("linear", 1000, "ddim15")
    keep = np.asarray(sp.timestep_map)
    np.testing.assert_allclose(np.asarray(sp.alphas_cumprod),
                               np.asarray(full.alphas_cumprod)[keep],
                               rtol=1e-6)
    assert sp.num_timesteps == 15
    assert sp.original_num_timesteps == 1000


def test_q_sample_and_inversion():
    sched = train_schedule("linear", 1000)
    rngs = np.random.default_rng(0)
    x0 = jnp.asarray(rngs.standard_normal((2, 8, 8, 3)), jnp.float32)
    noise = jnp.asarray(rngs.standard_normal((2, 8, 8, 3)), jnp.float32)
    t = jnp.array([0, 500])
    xt = sched.q_sample(x0, t, noise)
    # reconstruct x0 exactly from (x_t, eps)
    rec = sched.predict_xstart_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=2e-3)
    # eps roundtrip
    eps = sched.predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), atol=2e-2)


def test_ddim_step_with_oracle_eps_moves_toward_x0():
    """With the true eps, a full DDIM chain recovers x0 (|x0|<=1)."""
    sched = spaced_schedule("linear", 1000, "ddim15")
    rngs = np.random.default_rng(1)
    x0 = jnp.asarray(np.tanh(rngs.standard_normal((1, 4, 4, 2))), jnp.float32)
    noise = jnp.asarray(rngs.standard_normal((1, 4, 4, 2)), jnp.float32)
    x = noise
    for i in range(sched.num_timesteps - 1, -1, -1):
        t = jnp.array([i])
        eps = sched.predict_eps_from_xstart(x, t, x0)
        x, pred = sched.ddim_step(x, t, eps)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_posterior_identities():
    """posterior_mean_coef1 + coef2*sqrt(abar_t)/sqrt(abar_{t-1}) ~ relations:
    check mean of q(x_{t-1}|x_t,x0) equals x0 at variance-free limit t=0."""
    sched = train_schedule("linear", 1000)
    c1 = np.asarray(sched.posterior_mean_coef1)
    c2 = np.asarray(sched.posterior_mean_coef2)
    abar = np.asarray(sched.alphas_cumprod)
    abar_prev = np.asarray(sched.alphas_cumprod_prev)
    # the two coefficients must combine x0 and x_t consistently:
    # c1 + c2 * sqrt(abar) == sqrt(abar_prev) when x_t = sqrt(abar) x0
    np.testing.assert_allclose(c1 + c2 * np.sqrt(abar), np.sqrt(abar_prev),
                               rtol=1e-5)


def test_fixed_large_variance():
    sched = train_schedule("linear", 100)
    fl = np.asarray(sched.fixed_large_variance)
    betas = np.asarray(sched.betas)
    pv = np.asarray(sched.posterior_variance)
    assert np.isclose(fl[0], pv[1])
    np.testing.assert_allclose(fl[1:], betas[1:], rtol=1e-6)


def test_model_t_mapping():
    sp = spaced_schedule("linear", 1000, "ddim15")
    t = jnp.arange(15)
    mt = np.asarray(sp.model_t(t))
    np.testing.assert_array_equal(mt, np.asarray(sp.timestep_map))
