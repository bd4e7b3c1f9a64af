"""Baseline model families (patch-dm, sinf), EquiGroupNorm, sampler mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_patch_dm_forward_shapes():
    from tera_mind_tpu.models.unet_patch_dm import PatchDMUNetConfig

    conf = PatchDMUNetConfig(image_size=32, in_channels=4, out_channels=4,
                             model_channels=8, embed_channels=32,
                             rna_tpl=(0, 1, 2, 3), rna_num=16, gn_sz=2,
                             dropout=0.0)
    model = conf.make_model()
    x = jnp.zeros((4, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    rna = jnp.zeros((4, 2, 2, 4 * 16))
    params = jax.jit(lambda k: model.init(k, x, t, rna, 2, 2))(
        jax.random.PRNGKey(0))
    col, orig = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, 2, 2))(params, x, t, rna)
    assert col.shape == (1, 32, 32, 4)
    assert orig.shape == (4, 32, 32, 4)
    assert np.isfinite(np.asarray(col)).all()
    assert np.isfinite(np.asarray(orig)).all()


def test_sinf_forward_shapes_and_collage_consistency():
    from tera_mind_tpu.models.unet_sinf import SinfNetConfig
    from tera_mind_tpu.ops.collage import to_collage

    conf = SinfNetConfig(image_size=32, in_channels=4, out_channels=4,
                         model_channels=8, depth=4,
                         rna_tpl=(0, 1, 2, 3), rna_num=16, gn_sz=2)
    model = conf.make_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    rna = jnp.zeros((4, 2, 2, 4 * 16))
    params = jax.jit(lambda k: model.init(k, x, t, rna, 2, 2))(
        jax.random.PRNGKey(0))
    col, orig = jax.jit(
        lambda p, a, b, c: model.apply(p, a, b, c, 2, 2))(params, x, t, rna)
    assert col.shape == (1, 32, 32, 4)
    assert orig.shape == (4, 32, 32, 4)
    # sinf's collage output is exactly the shifted reassembly of pred_orig
    want = np.asarray(to_collage(jnp.asarray(orig)[:, None], 2, 2)[:, 0])
    np.testing.assert_allclose(np.asarray(col), want, rtol=1e-6)


def test_equi_group_norm_matches_plain_gn_on_full_window():
    """ksize=None -> plain GroupNorm semantics (reference nn.py:70-72)."""
    from tera_mind_tpu.models.nn import EquiGroupNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
    m = EquiGroupNorm(num_groups=4)
    p = m.init(jax.random.PRNGKey(1), x)
    y = jax.jit(m.apply)(p, x)
    xr = np.asarray(x).reshape(2, 8, 8, 4, 2)
    mean = xr.mean(axis=(1, 2, 4), keepdims=True)
    var = xr.var(axis=(1, 2, 4), keepdims=True)
    want = ((xr - mean) / np.sqrt(var + 1e-5)).reshape(2, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(y), want, atol=3e-2)


def test_equi_group_norm_shift_equivariance():
    """Sliding-window stats commute with translation in the interior —
    the property that motivates the block (reference nn.py:218-262)."""
    from tera_mind_tpu.models.nn import EquiGroupNorm

    k = 3
    m = EquiGroupNorm(num_groups=2, ksize=k, pad=(k - 1) // 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 12, 4))
    p = m.init(jax.random.PRNGKey(3), x)
    apply = jax.jit(m.apply)
    y = np.asarray(apply(p, x))
    assert y.shape == x.shape
    xs = jnp.roll(x, shift=2, axis=1)
    ys = np.asarray(apply(p, xs))
    # interior rows (away from both boundaries) must match the rolled output
    np.testing.assert_allclose(ys[:, 4:10], np.roll(y, 2, axis=1)[:, 4:10],
                               atol=3e-2)


def test_sampler_mask_pins_background():
    """rna_msk path: masked-out pixels end at exactly -1 (base.py:629-630)."""
    from tera_mind_tpu.diffusion.sampler import DiffusionSampler, SamplerConfig
    from tera_mind_tpu.diffusion.schedule import spaced_schedule

    sched = spaced_schedule("linear", 1000, "ddim3")
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=8, gn_sz=1))

    def model(xp, tm, rp, p1, p2):
        col = jnp.zeros((xp.shape[0] // (p1 * p2) * (p1 - 1) * (p2 - 1),
                         8, 8, xp.shape[-1]))
        return col, jnp.zeros_like(xp)

    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 2))
    rna = jnp.zeros((9, 1, 1, 4))
    mask = jnp.zeros((1, 16, 16, 1)).at[:, :8].set(1.0)
    out = jax.jit(lambda n: sampler.sample(model, n, rna, mask=mask))(noise)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, 8:], -1.0, atol=1e-6)
    assert not np.allclose(out[:, :8], -1.0)


def test_decode_original_skip_matches_collage_output():
    """decode_original=False must return the IDENTICAL collage prediction
    (sampling consumes only model_forward.pred, reference base.py:387) while
    skipping the second decoder pass."""
    from tera_mind_tpu.models.unet import TeraUNetConfig

    conf = TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16,
                          rna_tpl=(0, 1, 2, 3), in_channels=4,
                          out_channels=4, model_channels=8,
                          embed_channels=32, dropout=0.0)
    model = conf.make_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 4))
    t = jnp.array([500], jnp.int32)
    rna = jnp.zeros((4, 2, 2, 64))
    params = jax.jit(lambda k: model.init(k, x, t, rna, 2, 2))(
        jax.random.PRNGKey(1))
    col_full, orig = jax.jit(
        lambda p: model.apply(p, x, t, rna, 2, 2))(params)
    col_only, none = jax.jit(
        lambda p: model.apply(p, x, t, rna, 2, 2,
                              decode_original=False))(params)
    assert none is None
    assert orig is not None
    np.testing.assert_array_equal(np.asarray(col_full), np.asarray(col_only))
