"""Patch/collage reshape tests — off-by-one here silently produces seams
(reference unet_ours.py:325-341, base.py:386-393)."""

import jax.numpy as jnp
import numpy as np

from tera_mind_tpu.ops.collage import (patchify, pixels_to_voxels, to_collage,
                                       unpatchify, voxels_to_pixels)


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 12, 8, 3)), jnp.float32)
    p = patchify(img, 4)
    assert p.shape == (2 * 3 * 2, 4, 4, 3)
    back = unpatchify(p, 3, 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_patchify_row_major_order():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    p = patchify(img, 2)
    # patch (0,0) is the top-left block, patch (0,1) top-right
    np.testing.assert_array_equal(np.asarray(p[0, :, :, 0]),
                                  [[0, 1], [4, 5]])
    np.testing.assert_array_equal(np.asarray(p[1, :, :, 0]),
                                  [[2, 3], [6, 7]])


def test_to_collage_is_half_shift():
    rng = np.random.default_rng(1)
    b, p1, p2, z, hh, c = 2, 3, 4, 2, 6, 5
    patches = jnp.asarray(rng.standard_normal((b * p1 * p2, z, hh, hh, c)),
                          jnp.float32)
    col = to_collage(patches, p1, p2)
    assert col.shape == (b * (p1 - 1) * (p2 - 1), z, hh, hh, c)
    # reconstruct the underlying image and verify each collage tile is the
    # half-shifted window
    img = np.asarray(patches).reshape(b, p1, p2, z, hh, hh, c)
    img = img.transpose(0, 3, 1, 4, 2, 5, 6).reshape(b, z, p1 * hh, p2 * hh, c)
    half = hh // 2
    col_np = np.asarray(col).reshape(b, p1 - 1, p2 - 1, z, hh, hh, c)
    for i in range(p1 - 1):
        for j in range(p2 - 1):
            want = img[:, :, half + i * hh: half + (i + 1) * hh,
                       half + j * hh: half + (j + 1) * hh]
            np.testing.assert_array_equal(col_np[:, i, j], want)


def test_pixels_voxels_roundtrip_and_order():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 6)), jnp.float32)
    v = pixels_to_voxels(x, z_size=3)  # 2 stains x 3 z
    assert v.shape == (3, 3, 8, 8, 2)
    # stain-major channel order: pixel channel c = s*z + zi
    np.testing.assert_array_equal(np.asarray(v[:, 1, :, :, 0]),
                                  np.asarray(x[..., 1]))
    np.testing.assert_array_equal(np.asarray(v[:, 2, :, :, 1]),
                                  np.asarray(x[..., 5]))
    back = voxels_to_pixels(v)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_collage_upsample_commute_exactly():
    """to_collage(upsample_2x(x)) == upsample_2x(to_collage(x)) for even
    patch sizes — the exactness that lets the decoder collage the RNA
    tower's pre-upsample stages at quarter size (models/rna.py)."""
    from tera_mind_tpu.models.nn import upsample_2x

    rng = np.random.default_rng(4)
    for (p1, p2, h, c, z) in [(3, 3, 8, 5, 2), (5, 5, 4, 3, 2),
                              (2, 4, 16, 7, 1)]:
        x = jnp.asarray(rng.normal(0, 1, (2 * p1 * p2, z, h, h, c))
                        .astype(np.float32))
        a = to_collage(upsample_2x(x), p1, p2)
        b = upsample_2x(to_collage(x, p1, p2))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
