"""Legacy-style blocks for the 'patch-dm' / 'sinf' baseline model families.

TPU-native (flax, channels-last) equivalents of the reference's 2D-era
blocks (CTPLab/Tera-MIND model/blocks.py): GroupNorm ResBlock with
time-emb scale/shift (blocks.py:82-259), 8x8-window single-head
self-attention (blocks.py:406-471), and the adaptive group-count
``normalization`` helper (model/nn.py:172-184).

These exist for capability parity with the reference's baseline methods;
the flagship model family is ``models/unet.py`` (method='ours').
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .nn import conv3d, downsample_2x, upsample_2x


def adaptive_groups(channels: int) -> int:
    """Largest of (32, 16, 8, 4, 2) dividing ``channels`` (else 1); the
    reference's ``normalization`` (model/nn.py:172-184)."""
    for g in (32, 16, 8, 4, 2):
        if channels % g == 0:
            return min(g, channels)
    return 1


class GroupNorm32(nn.Module):
    """GroupNorm over the channel (last) axis, computed in float32
    (reference model/nn.py:96-98)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        dtype = x.dtype
        y = nn.GroupNorm(num_groups=adaptive_groups(c), epsilon=1e-5,
                         dtype=jnp.float32, name="gn")(
                             x.astype(jnp.float32))
        return y.astype(dtype)


class LegacyResBlock3D(nn.Module):
    """GroupNorm residual block (reference blocks.py:82-259).

    in:   GroupNorm -> SiLU -> [resample] -> Conv3d(3,3,3)
    out:  GroupNorm -> *(1+scale)+shift (time emb) -> SiLU -> Dropout
          -> Conv3d (0-init)
    skip: identity | 1x1x1 conv
    Input is (B, Z, H, W, C).
    """

    out_channels: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    use_zero_module: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        in_ch = x.shape[-1]

        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            h, x = upsample_2x(h), upsample_2x(x)
        elif self.down:
            h, x = downsample_2x(h), downsample_2x(x)
        h = conv3d(self.out_channels, (3, 3, 3), name="in_conv")(h)

        h = GroupNorm32(name="out_norm")(h)
        if emb is not None:
            emb_out = nn.Dense(2 * self.out_channels, name="emb_proj")(
                nn.silu(emb)).astype(h.dtype)
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = h * (1.0 + scale[:, None, None, None, :]) \
                + shift[:, None, None, None, :]
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3d(self.out_channels, (3, 3, 3),
                   zero_init=self.use_zero_module, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = conv3d(self.out_channels, (1, 1, 1), name="skip_conv")(x)
        return x + h


class WindowSelfAttention(nn.Module):
    """Single-head self-attention over spatial tokens, partitioned into
    8x8 spatial windows when the map is larger (the reference's ``is_half``
    path, blocks.py:448-471).  Residual; zero-init projection.

    Input (B, Z, H, W, C); attention runs over (Z * 8 * 8) tokens per
    window with the full channel dim as one head.
    """

    window: int = 8
    is_half: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, z, hh, ww, c = x.shape
        h = GroupNorm32(name="norm")(x)
        qkv = nn.Dense(3 * c, name="qkv")(h)

        win = self.window
        use_win = self.is_half and (hh > win or ww > win)
        if use_win:
            nh, nw = hh // win, ww // win
            qkv = qkv.reshape(b, z, nh, win, nw, win, 3 * c)
            qkv = qkv.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
                b * nh * nw, z * win * win, 3 * c)
        else:
            qkv = qkv.reshape(b, z * hh * ww, 3 * c)

        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, q.dtype))
        attn = jnp.einsum("bnc,bmc->bnm", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bnm,bmc->bnc", attn, v)
        o = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj")(o)

        if use_win:
            o = o.reshape(b, nh, nw, z, win, win, c)
            o = o.transpose(0, 3, 1, 4, 2, 5, 6).reshape(b, z, hh, ww, c)
        else:
            o = o.reshape(b, z, hh, ww, c)
        return x + o
