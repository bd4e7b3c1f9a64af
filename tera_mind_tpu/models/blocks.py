"""Residual blocks for the 3D patch UNet (channels-last).

Parity reference: CTPLab/Tera-MIND model/MBAblocks.py:75-368 (ResBlock with
RMSNorm -> SiLU -> Conv3d(3,3,3) in-layers, time-embedding scale/shift
applied after the out-norm, zero-initialized out conv, 1x1 skip).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .nn import RMSNorm, conv3d, downsample_2x, upsample_2x


class ResBlock3D(nn.Module):
    """Residual block, optionally changing channels and up/down-sampling.

    Structure (reference MBAblocks.py:127-299):
      in:   RMSNorm -> SiLU -> [resample] -> Conv3d(3,3,3)
      out:  RMSNorm -> *(1+scale)+shift (time emb) -> SiLU -> Dropout -> Conv3d(0-init)
      skip: identity | 1x1x1 conv [-> resample]
    """

    out_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    use_zero_module: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]

        dt = self.compute_dtype
        h = RMSNorm(name="in_norm")(x.astype(dt))
        h = nn.silu(h)
        if self.up:
            h, x = upsample_2x(h), upsample_2x(x)
        elif self.down:
            h, x = downsample_2x(h), downsample_2x(x)
        h = conv3d(self.out_channels, (3, 3, 3), dtype=dt,
                   name="in_conv")(h)

        h = RMSNorm(name="out_norm")(h)
        if emb is not None:
            # emb is (B, E); project to per-channel scale/shift
            # (reference MBAblocks.py:166-171, 302-368)
            emb_out = nn.Dense(2 * self.out_channels, dtype=dt,
                               name="emb_proj")(
                nn.silu(emb.astype(dt))).astype(h.dtype)
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            scale = scale[:, None, None, None, :]
            shift = shift[:, None, None, None, :]
            h = h * (1.0 + scale) + shift
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3d(self.out_channels, (3, 3, 3), dtype=dt,
                   zero_init=self.use_zero_module, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = conv3d(self.out_channels, (1, 1, 1), dtype=dt,
                       name="skip_conv")(x)
        return (x + h).astype(dt)


class Upsample(nn.Module):
    """2x nearest spatial upsample with optional conv (blocks.py:340-371)."""

    use_conv: bool = False
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_2x(x)
        if self.use_conv:
            x = conv3d(self.out_channels or x.shape[-1], (3, 3, 3),
                       name="conv")(x)
        return x


class Downsample(nn.Module):
    """2x spatial downsample: avg-pool or strided conv (blocks.py:374-403)."""

    use_conv: bool = False
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return nn.Conv(self.out_channels or x.shape[-1],
                           kernel_size=(3, 3, 3), strides=(1, 2, 2),
                           padding=[(1, 1), (1, 1), (1, 1)], name="conv")(x)
        return downsample_2x(x)
