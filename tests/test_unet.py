"""TeraUNet structural tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tera_mind_tpu.models.unet import TeraUNet, TeraUNetConfig

TINY = TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16, rna_tpl=(0, 1, 2, 3),
                      in_channels=4, out_channels=4, model_channels=8,
                      embed_channels=32, dropout=0.0)


@pytest.fixture(scope="module")
def tiny_model():
    model = TINY.make_model()
    b, p1, p2 = 1, 2, 2
    x = jnp.zeros((b * p1 * p2, 32, 32, 4))
    t = jnp.array([500], dtype=jnp.int32)
    rna = jnp.zeros((b * p1 * p2, 2, 2, 4 * 16))
    params = model.init(jax.random.PRNGKey(0), x, t, rna, p1, p2)
    return model, params


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_forward_shapes_train_grid(tiny_model):
    model, params = tiny_model
    b, p1, p2 = 2, 2, 2
    x = jnp.ones((b * p1 * p2, 32, 32, 4))
    t = jnp.array([3, 800], dtype=jnp.int32)
    rna = jnp.ones((b * p1 * p2, 2, 2, 64))
    pred_col, pred_orig = model.apply(params, x, t, rna, p1, p2)
    assert pred_col.shape == (b * 1 * 1, 32, 32, 4)
    assert pred_orig.shape == (b * 4, 32, 32, 4)


def test_forward_shapes_sampling_grid(tiny_model):
    """Sampling uses (tiles+1)^2 patches; collage output is tiles^2
    (reference unet_ours.py:361-365)."""
    model, params = tiny_model
    b, p1, p2 = 1, 3, 3
    x = jnp.ones((b * p1 * p2, 32, 32, 4))
    t = jnp.array([10], dtype=jnp.int32)
    rna = jnp.ones((b * p1 * p2, 2, 2, 64))
    pred_col, pred_orig = model.apply(params, x, t, rna, p1, p2)
    assert pred_col.shape == (b * 4, 32, 32, 4)
    assert pred_orig.shape == (b * 9, 32, 32, 4)


def test_decoder_weight_sharing(tiny_model):
    """Both decoder passes must use the same parameters — one dec_*_res
    tree, no *_1 duplicates (reference runs output_blocks twice,
    unet_ours.py:397-425)."""
    _, params = tiny_model
    names = set(params["params"].keys())
    assert "dec_0_res" in names
    assert not any(n.startswith("dec_0_res_") for n in names)
    # encoder depth: stem + 4 levels * 2 blocks + 3 downsamples = 12
    enc = [n for n in names if n.startswith("enc_")]
    assert len(enc) >= 11


def test_rna_conditioning_matters(tiny_model):
    """Different gene inputs must change the prediction."""
    model, params = tiny_model
    x = jnp.ones((4, 32, 32, 4))
    t = jnp.array([100], dtype=jnp.int32)
    r0 = jnp.zeros((4, 2, 2, 64))
    r1 = 5.0 * jnp.ones((4, 2, 2, 64))
    out0, _ = model.apply(params, x, t, r0, 2, 2)
    out1, _ = model.apply(params, x, t, r1, 2, 2)
    assert float(jnp.abs(out0 - out1).max()) > 1e-4


def test_time_conditioning_matters():
    """Time enters only via the residual out-convs, which are
    zero-initialized by default (faithful to the reference's zero_module,
    MBAblocks.py:187-189) — so probe with use_zero_module=False."""
    import dataclasses
    conf = dataclasses.replace(TINY, use_zero_module=False)
    model = conf.make_model()
    x = jnp.ones((4, 32, 32, 4))
    rna = jnp.ones((4, 2, 2, 64))
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.array([0], jnp.int32), rna, 2, 2)
    out0, _ = model.apply(params, x, jnp.array([0], jnp.int32), rna, 2, 2)
    out1, _ = model.apply(params, x, jnp.array([999], jnp.int32), rna, 2, 2)
    assert float(jnp.abs(out0 - out1).max()) > 1e-4


def test_zero_module_identity_residuals(tiny_model):
    """At init with zero_module, changing t must NOT change the output —
    this pins the init behavior the reference relies on."""
    model, params = tiny_model
    x = jnp.ones((4, 32, 32, 4))
    rna = jnp.ones((4, 2, 2, 64))
    out0, _ = model.apply(params, x, jnp.array([0], jnp.int32), rna, 2, 2)
    out1, _ = model.apply(params, x, jnp.array([999], jnp.int32), rna, 2, 2)
    assert float(jnp.abs(out0 - out1).max()) < 1e-5
