"""Metric correctness tests (numpy-side; ssim/psnr exercised via jit)."""

import numpy as np
import pytest

from tera_mind_tpu.metrics.fid import (StreamingMoments, d_fid_from_moments,
                                       frechet_distance)
from tera_mind_tpu.metrics.stats import OnlineVariance


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.standard_normal(8)
    a = rng.standard_normal((8, 8))
    sigma = a @ a.T + np.eye(8)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_matches_closed_form_diagonal():
    """For diagonal covariances FID = |mu1-mu2|^2 + sum (sqrt(d1)-sqrt(d2))^2."""
    rng = np.random.default_rng(1)
    d1, d2 = rng.random(6) + 0.5, rng.random(6) + 0.5
    mu1, mu2 = rng.standard_normal(6), rng.standard_normal(6)
    want = ((mu1 - mu2) ** 2).sum() + ((np.sqrt(d1) - np.sqrt(d2)) ** 2).sum()
    got = frechet_distance(mu1, np.diag(d1), mu2, np.diag(d2))
    assert abs(got - want) < 1e-8


def test_streaming_moments_match_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((500, 5))
    sm = StreamingMoments(5)
    for chunk in np.array_split(x, 7):
        sm.add(chunk)
    mu, cov = sm.finalize()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-10)


def test_streaming_moments_mask():
    x = np.array([[1.0, 2.0], [100.0, 200.0], [3.0, 4.0]])
    sm = StreamingMoments(2)
    sm.add(x, mask=np.array([1, 0, 1], bool))
    mu, _ = sm.finalize()
    np.testing.assert_allclose(mu, [2.0, 3.0])


def test_d_fid_sensitivity():
    rng = np.random.default_rng(3)
    a, b = StreamingMoments(4), StreamingMoments(4)
    a.add(rng.standard_normal((300, 4)))
    b.add(rng.standard_normal((300, 4)) + 2.0)
    assert d_fid_from_moments(a, b) > 3.0


def test_online_variance_welford():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1000, 3)) * 5 + 2
    ov = OnlineVariance(3)
    for chunk in np.array_split(x, 13):
        ov.update(chunk)
    np.testing.assert_allclose(ov.mean, x.mean(0), atol=1e-9)
    np.testing.assert_allclose(ov.variance, x.var(0, ddof=1), atol=1e-9)


def test_psnr_ssim_jax():
    import jax.numpy as jnp
    from tera_mind_tpu.metrics.ssim import ms_ssim, psnr, ssim

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.random((2, 192, 192, 1)) * 2 - 1, jnp.float32)
    # identical images: psnr huge, ssim ~ 1
    p = np.asarray(psnr(a, a))
    assert (p > 80).all()
    s = np.asarray(ssim(a, a))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)
    m = np.asarray(ms_ssim(a, a))
    np.testing.assert_allclose(m, 1.0, atol=1e-3)
    # noisy copy scores lower
    b = a + 0.3 * jnp.asarray(rng.standard_normal(a.shape), jnp.float32)
    assert np.asarray(ssim(a, b)).mean() < 0.9
    assert np.asarray(psnr(a, b)).mean() < p.mean()
