"""Pure reshape ops for patch <-> image <-> shifted-collage conversion.

These are the spatial index gymnastics at the heart of Patch-DM-style
seamless generation (reference model/unet_ours.py:325-341 ``to_collage``,
diffusion/base.py:108-109 tile<->image rearranges).  All channels-last:

- images:  ``(B, H, W, C)`` or feature maps ``(B, Z, H, W, C)``
- patches: ``(B * p1 * p2, ..., h, w, C)`` with b-major, row-major patch order
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(img: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*p1*p2, patch, patch, C), row-major patches.

    Equivalent to 'b (p1 h) (p2 w) c -> (b p1 p2) h w c'.
    """
    b, h, w, c = img.shape
    p1, p2 = h // patch, w // patch
    x = img.reshape(b, p1, patch, p2, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * p1 * p2, patch, patch, c)


def unpatchify(patches: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """(B*p1*p2, h, w, C) -> (B, p1*h, p2*w, C)."""
    bp, h, w, c = patches.shape
    b = bp // (p1 * p2)
    x = patches.reshape(b, p1, p2, h, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, p1 * h, p2 * w, c)


def to_collage(h: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """Half-tile-shifted collage of a 5D feature-patch batch.

    (B*p1*p2, Z, hh, ww, C) -> (B*(p1-1)*(p2-1), Z, hh, ww, C): reassemble
    the patch grid into the full map, crop a half-tile border, re-tile.
    (reference unet_ours.py:325-341; half_p is always hh//2)
    """
    bp, z, hh, ww, c = h.shape
    b = bp // (p1 * p2)
    half = hh // 2
    x = h.reshape(b, p1, p2, z, hh, ww, c)
    x = x.transpose(0, 3, 1, 4, 2, 5, 6)          # b z p1 hh p2 ww c
    x = x.reshape(b, z, p1 * hh, p2 * ww, c)
    x = x[:, :, half:-half, half:-half]
    x = x.reshape(b, z, p1 - 1, hh, p2 - 1, ww, c)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)          # b p1-1 p2-1 z hh ww c
    return x.reshape(b * (p1 - 1) * (p2 - 1), z, hh, ww, c)


def pixels_to_voxels(x: jnp.ndarray, z_size: int) -> jnp.ndarray:
    """(B, H, W, S*Z) stain-major pixel channels -> (B, Z, H, W, S) voxels.

    Channel ordering matches the reference 'b (s z) h w -> b s z h w'
    (unet_ours.py:105): channel index = s * z_size + z.
    """
    b, h, w, sz = x.shape
    s = sz // z_size
    x = x.reshape(b, h, w, s, z_size)
    return x.transpose(0, 4, 1, 2, 3)


def voxels_to_pixels(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pixels_to_voxels`: (B, Z, H, W, S) -> (B, H, W, S*Z)."""
    b, z, h, w, s = x.shape
    x = x.transpose(0, 2, 3, 4, 1)  # b h w s z
    return x.reshape(b, h, w, s * z)
