"""z-packed layout: fold the z axis into channels to fill TPU lanes.

Motivation (round-1 profile): the flagship model's z=2 voxel tensors have
C=64 at the top level — the minor (lane) dimension is half-empty on a
128-lane TPU, and norms/elementwise dominate step time.  Packing
(B, Z, H, W, C) as (B, H, W, Z*C) doubles lane occupancy and removes a
dimension from every layout decision.

A 3D conv over z with kernel kz and SAME z-padding is EXACTLY a 2D conv on
the packed layout with a block-structured kernel: for output z-plane zo,
input z-plane zi contributes the 3D kernel's kz-slice (zi - zo + pad) —
see :func:`pack_conv3d_kernel`.  So the packed model is a pure
re-parameterization: weights transform, outputs match bit-for-bit up to
float reassociation.

Packing order is z-major: packed channel index = z * C + c.
"""

from __future__ import annotations

import numpy as np


def seg_perm(z: int, segments) -> np.ndarray:
    """Map segment-major packed channel indices to z-major ones.

    A PLAIN concat of per-segment z-major packed tensors yields the
    segment-major layout: idx = z*offset_s + zi*c_s + c.  The z-major
    layout over the same concatenated channels is idx = zi*Ctot + off_s + c.
    Returns ``perm`` with ``new[n] = old[perm[n]]`` — used to reorder conv
    kernel input rows so runtime concats need NO interleaving reshapes
    (the round-1 packed experiment's cost, unet_packed.py docstring).
    """
    ctot = int(sum(segments))
    perm = np.empty(z * ctot, np.int64)
    n = 0
    off = 0
    for cs in segments:
        for zi in range(z):
            for c in range(cs):
                perm[n] = zi * ctot + off + c
                n += 1
        off += cs
    return perm


def pack_conv3d_kernel(w3, z: int, segments=None):
    """(kz, ky, kx, ci, co) 3D kernel (SAME z-pad (kz-1)//2) ->
    (ky, kx, z*ci, z*co) packed 2D kernel.

    ``segments``: per-z channel counts of plainly-concatenated z-major
    inputs; when given, kernel input rows are permuted to the segment-major
    runtime layout (see :func:`seg_perm`)."""
    kz, ky, kx, ci, co = w3.shape
    pad = (kz - 1) // 2
    w2 = np.zeros((ky, kx, z * ci, z * co), w3.dtype)
    for zo in range(z):
        for zi in range(z):
            k = zi - zo + pad
            if 0 <= k < kz:
                w2[:, :, zi * ci:(zi + 1) * ci, zo * co:(zo + 1) * co] = \
                    np.asarray(w3[k])
    if segments is not None:
        assert int(sum(segments)) == ci, (segments, ci)
        w2 = w2[:, :, seg_perm(z, segments), :]
    return w2


def pack_conv3d_kernel_jnp(w3, z: int, segments=None):
    """Traceable (jnp) version of :func:`pack_conv3d_kernel`.

    Lets a packed model declare the REFERENCE-SHAPED 3D kernel as its
    parameter and build the packed 2D kernel inside the forward — so
    training in the packed layout optimizes exactly the 5D weight class
    (and checkpoints stay interchangeable with TeraUNet).  The build is a
    few concats + one static gather over kernel-sized tensors — noise next
    to the conv itself."""
    import jax.numpy as jnp
    kz, ky, kx, ci, co = w3.shape
    pad = (kz - 1) // 2
    zero = jnp.zeros_like(w3[0])
    rows = []
    for zi in range(z):
        cols = [w3[zi - zo + pad] if 0 <= zi - zo + pad < kz else zero
                for zo in range(z)]
        rows.append(jnp.concatenate(cols, axis=-1))    # (ky,kx,ci,z*co)
    w2 = jnp.concatenate(rows, axis=-2)                # (ky,kx,z*ci,z*co)
    if segments is not None:
        assert int(sum(segments)) == ci, (segments, ci)
        w2 = w2[:, :, seg_perm(z, segments), :]
    return w2


def pack_conv3d_bias(b, z: int):
    """(co,) -> (z*co,): the same bias on every z plane."""
    return np.tile(np.asarray(b), z)


def pack_channel_param(p, z: int, segments=None):
    """Per-channel vector (C,) (norm weight etc.) -> (z*C,) tiled.

    With ``segments`` the output follows the segment-major layout of a
    plain concat (each segment's C-slice tiled z times, segments
    concatenated)."""
    p = np.asarray(p)
    if segments is None:
        return np.tile(p, z)
    out, off = [], 0
    for cs in segments:
        out.append(np.tile(p[off:off + cs], z))
        off += cs
    assert off == p.shape[0], (segments, p.shape)
    return np.concatenate(out)


def pack_features(x, z: int):
    """jnp (B, Z, H, W, C) -> (B, H, W, Z*C), z-major channels."""
    b, zz, h, w, c = x.shape
    assert zz == z
    return x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, z * c)


def unpack_features(x, z: int):
    """Inverse of :func:`pack_features`: (B, H, W, Z*C) -> (B, Z, H, W, C)."""
    b, h, w, zc = x.shape
    c = zc // z
    return x.reshape(b, h, w, z, c).transpose(0, 3, 1, 2, 4)


def pixel_to_packed(x, z: int):
    """(B, H, W, S*Z) stain-major pixel channels (c = s*z + zi,
    unet_ours.py:105) -> z-major packed (B, H, W, Z*S)."""
    b, h, w, sz = x.shape
    s = sz // z
    x = x.reshape(b, h, w, s, z)
    return x.transpose(0, 1, 2, 4, 3).reshape(b, h, w, z * s)


def packed_to_pixel(x, z: int):
    """Inverse of :func:`pixel_to_packed`."""
    b, h, w, zs = x.shape
    s = zs // z
    x = x.reshape(b, h, w, z, s)
    return x.transpose(0, 1, 2, 4, 3).reshape(b, h, w, s * z)
