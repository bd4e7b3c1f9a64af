"""Patch-wise diffusion sampler: training loss, single-step denoise (the
tera-scale hook) and the full jitted DDIM/DDPM loop.

Parity reference (CTPLab/Tera-MIND):
- training loss w/ random 2x2 patch-block crop + dual-decoder loss:
  diffusion/base.py:181-289
- collage round-trip of the model eps (reassemble collage output, pad the
  half-patch border with -1, repatchify): diffusion/base.py:386-393
- one-timestep entry (``idx``) used by the tera-scale loop:
  diffusion/base.py:572, test_brn.py:209-217
- full sampling loop (pad 0 -> patchify -> step -> crop): base.py:597-631

All tensors channels-last; the timestep loop is a ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.collage import patchify, unpatchify
from .schedule import Schedule

# model_apply(x_patches, t_model, rna_patches, p1, p2) -> (pred_collage, pred_orig)
ModelFn = Callable[..., tuple[jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    patch_size: int = 64
    gn_sz: int = 4            # gene bins per patch side
    loss_type: str = "mse"    # 'mse' | 'l1'
    gen_type: str = "ddim"    # 'ddim' | 'ddpm'
    eta: float = 0.0


class DiffusionSampler:
    """Stateless sampler bound to a schedule + static geometry config."""

    def __init__(self, schedule: Schedule, conf: SamplerConfig):
        self.schedule = schedule
        self.conf = conf

    # ------------------------------------------------------------------ #
    # eps assembly: model patch outputs -> eps aligned with the padded    #
    # input patch grid (reference base.py:386-393).                       #
    # ------------------------------------------------------------------ #
    def _assemble_eps(self, pred_col: jnp.ndarray, p1: int, p2: int
                      ) -> jnp.ndarray:
        """Collage-decoder output ((p1-1)*(p2-1) patches) -> (p1*p2) patches.

        The shifted patches already tile the *interior* of the padded image;
        the outer half-patch border is filled with -1 (base.py:389).
        """
        ps = self.conf.patch_size
        half = ps // 2
        img = unpatchify(pred_col, p1 - 1, p2 - 1)
        img = jnp.pad(img, ((0, 0), (half, half), (half, half), (0, 0)),
                      constant_values=-1.0)
        return patchify(img, ps)

    # ------------------------------------------------------------------ #
    # single timestep on a padded tile — the tera-scale inner op          #
    # ------------------------------------------------------------------ #
    def denoise_step(self, model: ModelFn, x_pad: jnp.ndarray,
                     rna_pat: jnp.ndarray, t: jnp.ndarray, *,
                     rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """One reverse step.

        x_pad:   (B, H+ps, W+ps, C) half-patch-padded state (halo included)
        rna_pat: (B*p1*p2, gn_sz, gn_sz, Zrna*G) dense per-patch gene grids
        t:       (B,) int32 spaced timestep indices
        Returns the updated unpadded interior (B, H, W, C).
        """
        ps = self.conf.patch_size
        half = ps // 2
        b, hp, wp, _ = x_pad.shape
        p1, p2 = hp // ps, wp // ps

        x_patches = patchify(x_pad, ps)
        t_model = self.schedule.model_t(t)
        pred_col, _ = model(x_patches, t_model, rna_pat, p1, p2)
        eps = self._assemble_eps(pred_col, p1, p2)

        t_rep = jnp.repeat(t, p1 * p2)
        if self.conf.gen_type == "ddim" and self.conf.eta == 0.0:
            sample, _ = self.schedule.ddim_step(x_patches, t_rep, eps)
        else:
            assert rng is not None
            noise = jax.random.normal(rng, x_patches.shape, x_patches.dtype)
            if self.conf.gen_type == "ddim":
                sample, _ = self.schedule.ddim_step(
                    x_patches, t_rep, eps, eta=self.conf.eta, noise=noise)
            else:
                sample, _ = self.schedule.ddpm_step(
                    x_patches, t_rep, eps, noise)
        img = unpatchify(sample, p1, p2)
        return img[:, half:-half, half:-half, :]

    # ------------------------------------------------------------------ #
    # full sampling loop (lax.scan over the spaced timesteps)             #
    # ------------------------------------------------------------------ #
    def sample(self, model: ModelFn, noise: jnp.ndarray,
               rna_pat: jnp.ndarray, *,
               rng: Optional[jax.Array] = None,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Generate from pure noise.

        noise:   (B, H, W, C) initial x_T for the unpadded region
        rna_pat: per-patch gene grids covering the PADDED (H+ps, W+ps) grid
        mask:    optional (B, H, W, 1|C) 0/1 gene-coverage mask; after every
                 reverse step masked-out pixels are pinned to -1 (background),
                 the reference's ``rna_msk`` path (base.py:592, 629-630)
        Returns (B, H, W, C) in [-1, 1].
        """
        ps = self.conf.patch_size
        half = ps // 2
        b = noise.shape[0]
        T = self.schedule.num_timesteps
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def body(img, step):
            t = jnp.full((b,), step, dtype=jnp.int32)
            x_pad = jnp.pad(img, ((0, 0), (half, half), (half, half), (0, 0)))
            step_rng = jax.random.fold_in(rng, step)
            img = self.denoise_step(model, x_pad, rna_pat, t, rng=step_rng)
            if mask is not None:
                img = img * mask + mask - 1.0
            return img, ()

        steps = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        img, _ = jax.lax.scan(body, noise, steps)
        return img

    # ------------------------------------------------------------------ #
    # training loss (reference base.py:181-289)                           #
    # ------------------------------------------------------------------ #
    def training_loss(self, model: ModelFn, x_start_pad: jnp.ndarray,
                      rna_pad: jnp.ndarray, t: jnp.ndarray,
                      rng: jax.Array, *,
                      noise: Optional[jnp.ndarray] = None,
                      block_idx: Optional[tuple] = None) -> jnp.ndarray:
        """Dual-decoder patch loss on a random 2x2 patch block.

        x_start_pad: (B, H+ps, W+ps, C) zero-padded training image
        rna_pad:     (B, gh+gn, gw+gn, Zrna*G) zero-padded dense gene grid
        t:           (B,) int32 timesteps on the TRAIN schedule
        noise/block_idx: inject the Gaussian noise / the 2x2 crop origin
        (reference training_losses' `noise=` param and randrange crop,
        base.py:192, 221-224) — used by the cross-framework parity tests.
        """
        ps = self.conf.patch_size
        gn = self.conf.gn_sz
        half = ps // 2
        b, hp, wp, c = x_start_pad.shape
        p_x, p_y = hp // ps - 1, wp // ps - 1

        rng_noise, rng_ix, rng_iy = jax.random.split(rng, 3)
        if noise is None:
            noise = jax.random.normal(rng_noise, x_start_pad.shape,
                                      x_start_pad.dtype)
        x_t = self.schedule.q_sample(x_start_pad, t, noise)

        # interior mask: 1 inside the original image, 0 on the pad border
        # (reference experiment.py:167-168, base.py:217-218)
        mask = jnp.zeros((hp, wp), x_start_pad.dtype)
        mask = mask.at[half:-half, half:-half].set(1.0)
        mask = mask[None, :, :, None]
        x_t = x_t * mask

        # shared random 2x2-patch-block origin (base.py:221-224)
        if block_idx is None:
            ix = jax.random.randint(rng_ix, (), 0, p_x)
            iy = jax.random.randint(rng_iy, (), 0, p_y)
        else:
            ix, iy = (jnp.asarray(v, jnp.int32) for v in block_idx)

        def crop(img, scale, size, nc):
            return jax.lax.dynamic_slice(
                img, (0, ix * scale, iy * scale, 0),
                (img.shape[0], size, size, nc))

        x_blk = crop(x_t, ps, 2 * ps, c)
        n_blk = crop(noise, ps, 2 * ps, c)
        m_blk = crop(jnp.broadcast_to(mask, x_start_pad.shape), ps, 2 * ps, c)
        r_blk = crop(rna_pad, gn, 2 * gn, rna_pad.shape[-1])

        x_p = patchify(x_blk, ps)
        n_p = patchify(n_blk, ps)
        m_p = patchify(m_blk, ps)
        r_p = patchify(r_blk, gn)

        t_model = self.schedule.model_t(t)
        pred_col, pred_orig = model(x_p, t_model, r_p, 2, 2)

        # collage target: interior of the 2x2 noise block (base.py:273-278)
        n_img = unpatchify(n_p, 2, 2)
        n_shift = n_img[:, half:-half, half:-half, :]

        if self.conf.loss_type == "mse":
            loss = jnp.mean((n_shift - pred_col) ** 2)
            loss += jnp.mean((n_p - pred_orig) ** 2 * m_p)
        else:
            loss = jnp.mean(jnp.abs(n_shift - pred_col))
            loss += jnp.mean(jnp.abs(n_p - pred_orig) * m_p)
        return loss
