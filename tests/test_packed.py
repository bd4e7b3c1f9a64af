"""z-packed model: exact re-parameterization of the 5D flagship model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from pathlib import Path

GOLDEN = Path(__file__).parent / "golden" / "teraunet_tiny.npz"


def test_pack_conv3d_kernel_math():
    """Packed 2D conv == 3D conv over z for both kernel shapes used."""
    from tera_mind_tpu.ops.zpack import (pack_conv3d_bias,
                                         pack_conv3d_kernel, pack_features,
                                         unpack_features)

    rng = np.random.default_rng(0)
    z, h, w, ci, co = 2, 8, 8, 5, 7
    x5 = jnp.asarray(rng.normal(0, 1, (3, z, h, w, ci)).astype(np.float32))
    for kz in (1, 3):
        w3 = rng.normal(0, 0.3, (kz, 3, 3, ci, co)).astype(np.float32)
        b3 = rng.normal(0, 0.1, (co,)).astype(np.float32)
        pad_z = (kz - 1) // 2
        want = jax.lax.conv_general_dilated(
            x5, jnp.asarray(w3), (1, 1, 1),
            [(pad_z, pad_z), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b3
        w2 = jnp.asarray(pack_conv3d_kernel(w3, z))
        b2 = jnp.asarray(pack_conv3d_bias(b3, z))
        xp = pack_features(x5, z)
        got = jax.lax.conv_general_dilated(
            xp, w2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
        got5 = unpack_features(got, z)
        np.testing.assert_allclose(np.asarray(got5), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_pixel_pack_roundtrip():
    from tera_mind_tpu.ops.zpack import packed_to_pixel, pixel_to_packed

    x = jnp.arange(2 * 4 * 4 * 8).reshape(2, 4, 4, 8).astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(packed_to_pixel(pixel_to_packed(x, 2), 2)), np.asarray(x))
    # semantic check: pixel channel c = s*z + zi maps to packed zi*S + s
    p = pixel_to_packed(x, 2)
    np.testing.assert_array_equal(np.asarray(p[..., 0]),
                                  np.asarray(x[..., 0]))   # zi=0,s=0 <- s=0,zi=0
    np.testing.assert_array_equal(np.asarray(p[..., 1]),
                                  np.asarray(x[..., 2]))   # zi=0,s=1 <- c=1*2+0


def test_seg_perm_and_segmented_kernel():
    """A plain concat of z-major packed segments + seg-permuted kernel ==
    3D conv on the 5D concat."""
    from tera_mind_tpu.ops.zpack import (pack_conv3d_kernel, pack_features,
                                         seg_perm, unpack_features)

    rng = np.random.default_rng(1)
    z, h, w = 2, 8, 8
    segs = (5, 3, 4)
    ci, co = sum(segs), 6
    x5 = [jnp.asarray(rng.normal(0, 1, (2, z, h, w, c)).astype(np.float32))
          for c in segs]
    cat5 = jnp.concatenate(x5, axis=-1)
    w3 = rng.normal(0, 0.3, (3, 3, 3, ci, co)).astype(np.float32)
    want = jax.lax.conv_general_dilated(
        cat5, jnp.asarray(w3), (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    # runtime: plain concat of per-segment packed tensors
    catP = jnp.concatenate([pack_features(x, z) for x in x5], axis=-1)
    w2 = jnp.asarray(pack_conv3d_kernel(w3, z, segments=segs))
    got = jax.lax.conv_general_dilated(
        catP, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(unpack_features(got, z)),
                               np.asarray(want), atol=1e-4, rtol=1e-4)
    # permutation is a bijection
    p = seg_perm(z, segs)
    assert sorted(p.tolist()) == list(range(z * ci))


def test_grouped_rmsnorm_segmented():
    """Segment-aware GroupedRMSNorm == 5D RMSNorm on the concatenated
    channels."""
    from tera_mind_tpu.models.nn import RMSNorm
    from tera_mind_tpu.models.unet_packed import GroupedRMSNorm
    from tera_mind_tpu.ops.zpack import pack_channel_param, pack_features

    rng = np.random.default_rng(2)
    z, segs = 2, (5, 3)
    ctot = sum(segs)
    x5 = [jnp.asarray(rng.normal(0, 2, (3, z, 6, 6, c)).astype(np.float32))
          for c in segs]
    cat5 = jnp.concatenate(x5, axis=-1)
    w = rng.normal(1, 0.2, (ctot,)).astype(np.float32)
    want = RMSNorm().apply({"params": {"weight": jnp.asarray(w)}}, cat5)

    catP = jnp.concatenate([pack_features(x, z) for x in x5], axis=-1)
    wP = jnp.asarray(pack_channel_param(w, z, segments=segs))
    got = GroupedRMSNorm(z=z, segments=segs).apply(
        {"params": {"weight": wP}}, catP)
    off, parts = 0, []
    for c in segs:  # expected, repacked segment-major
        parts.append(pack_features(want[..., off:off + c], z))
        off += c
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.concatenate(parts, axis=-1)),
                               atol=1e-5, rtol=1e-5)


def _tiny_conf():
    from tera_mind_tpu.models.unet import TeraUNetConfig
    return TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16,
                          rna_tpl=(0, 1, 2, 3), in_channels=4,
                          out_channels=4, model_channels=8,
                          embed_channels=32, dropout=0.0)


def test_packed_from_5d_exact():
    """PackedTeraUNet(from_5d=True) consumes TeraUNet's param tree AS-IS:
    identical init tree, matching outputs, matching gradients — the
    packed-speed TRAINING path optimizes exactly the 5D weight class."""
    from tera_mind_tpu.models.unet_packed import PackedTeraUNet

    conf = _tiny_conf()
    model5 = conf.make_model()
    modelP = PackedTeraUNet(conf, from_5d=True)
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([123], jnp.int32)

    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = jax.jit(lambda k: modelP.init(k, x, t, rna, 2, 2))(kp)
    # identical param trees (same shapes, names, rng paths)
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=0),
        params5, paramsP)
    del chex_equal

    col5, orig5 = jax.jit(lambda p: model5.apply(p, x, t, rna, 2, 2))(
        params5)
    colP, origP = jax.jit(lambda p: modelP.apply(p, x, t, rna, 2, 2))(
        params5)  # 5D tree fed straight in
    # TPU f32 convs run with excess-precision reassociation (bf16x3), so
    # the two conv formulations drift ~2e-3 there; CPU is f32-exact
    tpu = jax.default_backend() in ("tpu", "axon")
    atol = 5e-3 if tpu else 2e-4
    np.testing.assert_allclose(np.asarray(colP), np.asarray(col5),
                               atol=atol, rtol=1e-3 if tpu else 1e-4)
    np.testing.assert_allclose(np.asarray(origP), np.asarray(orig5),
                               atol=atol, rtol=1e-3 if tpu else 1e-4)

    def loss(model):
        def f(p):
            c, o = model.apply(p, x, t, rna, 2, 2)
            return jnp.mean(c ** 2) + jnp.mean(o ** 2)
        return f

    g5 = jax.jit(jax.grad(loss(model5)))(params5)
    gP = jax.jit(jax.grad(loss(modelP)))(params5)
    flat5 = jax.tree_util.tree_leaves_with_path(g5)
    flatP = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(gP)}
    gatol = 5e-3 if tpu else 5e-4
    for k, v5 in flat5:
        vP = flatP[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(vP), np.asarray(v5), atol=gatol, rtol=5e-3,
            err_msg=jax.tree_util.keystr(k))


def test_packed_model_matches_golden():
    """PackedTeraUNet with transformed params reproduces the 5D golden
    outputs (proves the layout change is a pure re-parameterization)."""
    from tera_mind_tpu.models.unet import TeraUNetConfig
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)

    conf = TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16,
                          rna_tpl=(0, 1, 2, 3), in_channels=4,
                          out_channels=4, model_channels=8,
                          embed_channels=32, dropout=0.0)
    model5 = conf.make_model()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(42), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 3
    t = jnp.array([500], jnp.int32)
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)

    packed = PackedTeraUNet(conf)
    paramsP = pack_unet_params(params5, conf)
    colP, origP = jax.jit(
        lambda p: packed.apply(p, x, t, rna, 2, 2))(paramsP)

    gold = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(colP), gold["col"],
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(origP), gold["orig"],
                               atol=2e-2, rtol=2e-2)


def test_packed_attn_token_order_equivalent():
    """packed_attn=True runs the DiT blocks directly on the (h,w,z)-token
    packed layout — same params, no 5D pack/unpack transposes.  Attention
    is permutation-equivariant over tokens, so outputs must match the
    default path up to float reassociation in the softmax/value sums."""
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)

    conf = _tiny_conf()
    model5 = conf.make_model()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(17), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([321], jnp.int32)
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)

    base = PackedTeraUNet(conf)
    fast = PackedTeraUNet(conf, packed_attn=True)
    cb, ob = jax.jit(lambda p: base.apply(p, x, t, rna, 2, 2))(paramsP)
    cf, of = jax.jit(lambda p: fast.apply(p, x, t, rna, 2, 2))(paramsP)
    tpu = jax.default_backend() in ("tpu", "axon")
    atol = 5e-3 if tpu else 1e-4
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cb), atol=atol,
                               rtol=1e-3 if tpu else 1e-4)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ob), atol=atol,
                               rtol=1e-3 if tpu else 1e-4)


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_packed_attn_with_quant():
    """packed_attn composes with the int8 path (quant_attn): weight/
    activation quantization is order-free (abs-max over a permutation is
    identical), so the combined mode must track the plain quant_attn
    outputs closely."""
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import prequantize_params

    conf = _tiny_conf()
    model5 = conf.make_model()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(19), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([77], jnp.int32)
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)
    paramsQ = prequantize_params(paramsP, attn=True)

    a = PackedTeraUNet(conf, quant="int8", prequant=True, quant_attn=True)
    b = PackedTeraUNet(conf, quant="int8", prequant=True, quant_attn=True,
                       packed_attn=True)
    ca, oa = jax.jit(lambda p: a.apply(p, x, t, rna, 2, 2))(paramsQ)
    cb, ob = jax.jit(lambda p: b.apply(p, x, t, rna, 2, 2))(paramsQ)
    for u, v in ((ca, cb), (oa, ob)):
        u, v = np.asarray(u), np.asarray(v)
        assert np.isfinite(v).all()
        scale = np.abs(u).max() + 1e-6
        # int8 rounding can flip on reassociated f32 inputs near .5 —
        # gate statistically like the other quant-chain tests
        assert np.mean(np.abs(u - v)) / scale < 5e-3
        assert np.corrcoef(u.ravel(), v.ravel())[0, 1] > 0.999


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_packed_attn_from_5d_training_grads():
    """packed_attn composes with from_5d (the training path): outputs and
    gradients track the plain from_5d model, so --packed --packed_attn
    training optimizes the identical reference weight class."""
    from tera_mind_tpu.models.unet_packed import PackedTeraUNet

    conf = _tiny_conf()
    base = PackedTeraUNet(conf, from_5d=True)
    fast = PackedTeraUNet(conf, from_5d=True, packed_attn=True)
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(23), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([99], jnp.int32)
    params = jax.jit(lambda k: base.init(k, x, t, rna, 2, 2))(kp)
    # same init tree (packed_attn adds no params)
    paramsF = jax.jit(lambda k: fast.init(k, x, t, rna, 2, 2))(kp)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0), params, paramsF)

    def loss(model):
        def f(p):
            c, o = model.apply(p, x, t, rna, 2, 2)
            return jnp.mean(c ** 2) + jnp.mean(o ** 2)
        return f

    tpu = jax.default_backend() in ("tpu", "axon")
    atol = 5e-3 if tpu else 5e-4
    lb = jax.jit(loss(base))(params)
    lf = jax.jit(loss(fast))(params)
    np.testing.assert_allclose(float(lf), float(lb), atol=atol, rtol=1e-4)
    gb = jax.jit(jax.grad(loss(base)))(params)
    gf = jax.jit(jax.grad(loss(fast)))(params)
    flatB = jax.tree_util.tree_leaves_with_path(gb)
    flatF = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(gf)}
    for k, vb in flatB:
        vf = flatF[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vb), atol=5e-3 if tpu else 1e-3,
            rtol=5e-3, err_msg=jax.tree_util.keystr(k))
