"""PSNR / SSIM / MS-SSIM in JAX (channels-last images).

Standard Wang et al. SSIM with separable gaussian windows and the 5-scale
MS-SSIM weighting — capability parity with utils/metrics.py:201-541 of the
reference, implemented against the published formulas.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Peak SNR per batch element; default range 2.0 for [-1,1] images."""
    mse = jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian blur of (B, H, W, C)."""
    k = kernel.shape[0]
    kh = kernel.reshape(1, k, 1, 1, 1)
    kw = kernel.reshape(1, 1, k, 1, 1)
    # depthwise via vmap over channels using lax.conv would be heavier;
    # use windowed sums through conv_general_dilated with feature groups
    b, h, w, c = img.shape
    x = img.transpose(0, 3, 1, 2).reshape(b * c, 1, h, w)
    kern_h = kernel.reshape(1, 1, k, 1)
    kern_w = kernel.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(x, kern_h, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kern_w, (1, 1), "VALID")
    _, _, h2, w2 = x.shape
    return x.reshape(b, c, h2, w2).transpose(0, 2, 3, 1)


@partial(jax.jit, static_argnames=("win_size", "full"))
def ssim(a: jnp.ndarray, b: jnp.ndarray, *, data_range: float = 2.0,
         win_size: int = 11, sigma: float = 1.5, full: bool = False):
    """Mean SSIM over (B, H, W, C) image pairs; returns (B,) scores
    (and the contrast-structure term if ``full``, needed by MS-SSIM)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    kern = _gaussian_kernel(win_size, sigma)
    mu_a = _blur(a, kern)
    mu_b = _blur(b, kern)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = _blur(a * a, kern) - mu_aa
    var_b = _blur(b * b, kern) - mu_bb
    cov = _blur(a * b, kern) - mu_ab
    cs_map = (2 * cov + c2) / (var_a + var_b + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs_map
    axes = tuple(range(1, a.ndim))
    if full:
        return ssim_map.mean(axes), cs_map.mean(axes)
    return ssim_map.mean(axes)


def _downsample(img: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = img.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    x = img[:, :h2, :w2].reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    return x.mean(axis=(2, 4))


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, *, data_range: float = 2.0,
            win_size: int = 11) -> jnp.ndarray:
    """Multi-scale SSIM, 5 scales (needs H, W >= 11 * 2^4)."""
    weights = jnp.asarray(MS_WEIGHTS)
    vals = []
    for i in range(len(MS_WEIGHTS)):
        s, cs = ssim(a, b, data_range=data_range, win_size=win_size,
                     full=True)
        vals.append(s if i == len(MS_WEIGHTS) - 1 else cs)
        if i < len(MS_WEIGHTS) - 1:
            a, b = _downsample(a), _downsample(b)
    vals = jnp.stack(vals)  # (scales, B)
    return jnp.prod(jnp.maximum(vals, 1e-6) ** weights[:, None], axis=0)
