"""int8 dynamic-quant inference path (ops/quant.py, PackedTeraUNet quant).

A TPU-side extension (the reference has no quantized path): the packed
model's resblock convs run int8 on the MXU at 2x the bf16 peak.  These
tests pin (a) the quantized conv's error bound vs the f32 conv, (b) that
the quant model consumes the UNCHANGED packed/5D param trees, and (c) the
end-to-end output error of the quantized model stays small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tera_mind_tpu.ops.quant import (quant_conv2d, quantize_tensor,
                                     quantize_weight)


def test_quantize_roundtrip_bounds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    xq, s = quantize_tensor(x)
    assert xq.dtype == jnp.int8
    back = np.asarray(xq, np.float32) * float(s)
    # symmetric per-tensor: error <= s/2 per element
    assert np.max(np.abs(back - np.asarray(x))) <= float(s) / 2 + 1e-7

    w = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) *
                    rng.uniform(0.1, 10, (32,)), jnp.float32)
    wq, sw = quantize_weight(w)
    backw = np.asarray(wq, np.float32) * np.asarray(sw)
    colmax = np.abs(np.asarray(w)).max(axis=(0, 1, 2))
    assert np.all(np.abs(backw - np.asarray(w)).max(axis=(0, 1, 2))
                  <= colmax / 254 + 1e-7)


def test_quant_conv2d_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 24, 40)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((40,)), jnp.float32)
    pad = [(1, 1), (1, 1)]
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = quant_conv2d(x, w, b, pad, out_dtype=jnp.float32)
    want, got = np.asarray(want), np.asarray(got)
    # error budget: ~sqrt(9*24) accumulations of (s_x/2 * |w|) products
    denom = np.abs(want).max()
    assert np.max(np.abs(got - want)) / denom < 0.02
    assert np.mean(np.abs(got - want)) / denom < 0.004


def _tiny_conf():
    from tera_mind_tpu.models.unet import TeraUNetConfig
    return TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16,
                          rna_tpl=(0, 1, 2, 3), in_channels=4,
                          out_channels=4, model_channels=8,
                          embed_channels=32, dropout=0.0)


def test_quant_model_same_tree_and_close_output():
    """quant='int8' must not change the param tree (pure execution-mode
    choice) and its outputs must track the exact model closely."""
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([77], jnp.int32)

    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)

    exact = PackedTeraUNet(conf)
    quant = PackedTeraUNet(conf, quant="int8")

    # identical tree: the quant model initializes the same shapes/names
    treeQ = jax.jit(lambda k: quant.init(k, x, t, rna, 2, 2))(kp)
    jax.tree.map(lambda a, b: (np.testing.assert_array_equal(
        np.asarray(a).shape, np.asarray(b).shape)), paramsP, treeQ)

    ce, oe = jax.jit(lambda p: exact.apply(p, x, t, rna, 2, 2))(paramsP)
    cq, oq = jax.jit(lambda p: quant.apply(p, x, t, rna, 2, 2))(paramsP)
    for a, b in ((ce, cq), (oe, oq)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = np.abs(a).max() + 1e-6
        assert np.max(np.abs(a - b)) / scale < 0.15, \
            np.max(np.abs(a - b)) / scale
        assert np.mean(np.abs(a - b)) / scale < 0.02, \
            np.mean(np.abs(a - b)) / scale


def test_quant_model_from_5d_tree():
    """The from_5d=True quant path consumes the 5D tree unchanged."""
    from tera_mind_tpu.models.unet_packed import PackedTeraUNet

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([11], jnp.int32)

    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    c5, _ = jax.jit(lambda p: model5.apply(p, x, t, rna, 2, 2))(params5)
    quant = PackedTeraUNet(conf, from_5d=True, quant="int8")
    cq, _ = jax.jit(lambda p: quant.apply(p, x, t, rna, 2, 2))(params5)
    a, b = np.asarray(c5), np.asarray(cq)
    scale = np.abs(a).max() + 1e-6
    assert np.isfinite(b).all()
    assert np.max(np.abs(a - b)) / scale < 0.15


@pytest.mark.slow
def test_quant_generation_chain_quality():
    """Error must stay bounded through a full multi-step DDIM chain (each
    step feeds the quantized model's output back in, so single-forward
    error compounds); this is the deployment-relevant quality gate for
    --quant int8 whole-brain generation."""
    from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,
                                                 SamplerConfig)
    from tera_mind_tpu.diffusion.schedule import spaced_schedule
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.parallel.generator import (GeneratorConfig,
                                                  TeraGenerator)

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(9), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([0], jnp.int32)
    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)

    gconf = GeneratorConfig(tile=64, patch=32, gn_blk=16, snum=4,
                            n_slices=6, stains=2, gdim=16,
                            noise_backend="jax")
    sched = spaced_schedule("linear", 1000, "ddim5")
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=32,
                                                    gn_sz=2))
    rng = np.random.default_rng(2)
    gene = (rng.random((2, 2, gconf.gsz, gconf.gsz, gconf.z_pad,
                        gconf.gdim)) < 0.05).astype(np.uint8)

    outs = {}
    for mode in (None, "int8"):
        model = PackedTeraUNet(conf, quant=mode)

        def mf(xp, tm, rp, p1, p2):
            return model.apply(paramsP, xp, tm, rp, p1, p2,
                               decode_original=False)

        gen = TeraGenerator(sampler, mf, gconf)
        outs[mode] = gen.run(gene, row0=1, col0=1, progress=False)

    a, b = outs[None], outs["int8"]
    assert np.isfinite(b).all()
    # DDIM's 1/sqrt(alpha_bar) re-derivation amplifies per-step rounding,
    # so ISOLATED pixels may take a different (valid) trajectory — the
    # chain is gated statistically, like comparing two seeds of the same
    # sampler: tiny mean error, near-perfect correlation, equal moments.
    # (Measured: mean |d| 0.0095, corr 0.9977, p99 |d| 0.31 on this conf.)
    d = np.abs(a - b)
    assert np.mean(d) < 0.03, np.mean(d)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    assert abs(a.mean() - b.mean()) < 0.01
    assert abs(a.std() - b.std()) / a.std() < 0.02


def test_prequant_bitexact_vs_dynamic():
    """prequant=True (int8 kernels baked into the param tree) must equal
    the dynamic path BIT-EXACTLY: prequantize_params uses the same
    quantize_weight the dynamic path calls at apply time, and activation
    quantization is unchanged — hoisting weight quantization out of the
    z-window loop is a pure scheduling change (~15% of the int8 step)."""
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import prequantize_params

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(13), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([42], jnp.int32)

    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)
    paramsQ = prequantize_params(paramsP)

    # the transform replaced kernels exactly in the resblock convs
    flatP = jax.tree_util.tree_leaves_with_path(paramsP)
    flatQ = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(paramsQ)}
    n_q = sum(1 for k in flatQ if "kernel_q" in k)
    assert n_q > 0 and len(flatQ) == len(flatP) + n_q  # +w_scale per conv
    assert all(v.dtype == jnp.int8 for k, v in flatQ.items()
               if "kernel_q" in k)

    dyn = PackedTeraUNet(conf, quant="int8")
    pre = PackedTeraUNet(conf, quant="int8", prequant=True)
    cd, od = jax.jit(lambda p: dyn.apply(p, x, t, rna, 2, 2))(paramsP)
    cp, op = jax.jit(lambda p: pre.apply(p, x, t, rna, 2, 2))(paramsQ)
    # bit-exact on TPU (verified); XLA:CPU compiles the two programs with
    # different fusion/FMA choices -> 1-2 ulp drift in the dequant chain
    atol = 0 if jax.default_backend() in ("tpu", "axon") else 1e-6
    np.testing.assert_allclose(np.asarray(cd), np.asarray(cp), atol=atol)
    np.testing.assert_allclose(np.asarray(od), np.asarray(op), atol=atol)


def test_static_act_conv_bitexact_and_model_close():
    """(a) A single QuantConv2p with a_scale calibrated on its own input
    reproduces the dynamic path bit-exactly (the baked scale IS the
    dynamic scale, in identical f32 arithmetic).  (b) At the model level
    bit-exactness is impossible by design — decoder modules run twice
    (collage + original pass) sharing one static scale where the dynamic
    path used two — so the full static model is gated with the same
    statistical bounds as the dynamic one."""
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  QuantConv2p,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import (bake_act_scales,
                                         prequantize_params, _path_names)

    # (a) single conv: calibrate-on-input => bit-exact vs dynamic
    kx, kp = jax.random.split(jax.random.PRNGKey(17))
    xc = jax.random.normal(kx, (2, 16, 16, 8), jnp.float32)
    dynconv = QuantConv2p(features=12)
    pc = dynconv.init(kp, xc)
    (yd, cal) = dynconv.apply(pc, xc, mutable=["calib"])
    amax = float(np.asarray(cal["calib"]["a_max"][0]))
    pcs = dict(pc)
    from tera_mind_tpu.ops.quant import quantize_weight
    wq, sw = quantize_weight(pc["params"]["kernel"])
    pcs["params"] = {"bias": pc["params"]["bias"],
                     "kernel_q": wq, "w_scale": sw}
    pcs["params"]["a_scale"] = np.maximum(
        np.float32(amax) / np.float32(127.0), np.float32(1e-8))
    staconv = QuantConv2p(features=12, prequant=True, static_act=True)
    ys = staconv.apply({"params": pcs["params"]}, xc)
    np.testing.assert_array_equal(np.asarray(yd), np.asarray(ys))

    # (b) full model: statistical gate vs the EXACT model
    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(19), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([7], jnp.int32)
    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)
    paramsQ = prequantize_params(paramsP)

    dyn = PackedTeraUNet(conf, quant="int8", prequant=True)
    (cd, od), cal = jax.jit(
        lambda p: dyn.apply(p, x, t, rna, 2, 2, mutable=["calib"])
    )(paramsQ)
    # sown tuples carry one entry per module invocation (decoder modules
    # have 2) — max-reduce duplicates like make_calibrating_model_fn does
    accum = {}
    for k, v in jax.tree_util.tree_leaves_with_path(cal):
        key = _path_names(k)
        accum[key] = max(accum.get(key, 0.0), float(np.max(np.asarray(v))))
    paramsS = bake_act_scales(paramsQ, accum)

    sta = PackedTeraUNet(conf, quant="int8", prequant=True,
                         static_act=True)
    cs, os_ = jax.jit(lambda p: sta.apply(p, x, t, rna, 2, 2))(paramsS)
    exact = PackedTeraUNet(conf)
    ce, oe = jax.jit(lambda p: exact.apply(p, x, t, rna, 2, 2))(paramsP)
    for a, b in ((ce, cs), (oe, os_)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = np.abs(a).max() + 1e-6
        assert np.max(np.abs(a - b)) / scale < 0.15, \
            np.max(np.abs(a - b)) / scale
        assert np.mean(np.abs(a - b)) / scale < 0.02, \
            np.mean(np.abs(a - b)) / scale


@pytest.mark.slow
def test_static_act_chain_quality_and_calibration_fn():
    """End-to-end: calibrate through a TeraGenerator chain with
    make_calibrating_model_fn (io_callback inside lax.scan), bake, and
    check the static-int8 chain stays statistically faithful to the
    exact chain (same gates as the dynamic-int8 chain test)."""
    from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,
                                                 SamplerConfig)
    from tera_mind_tpu.diffusion.schedule import spaced_schedule
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import (bake_act_scales,
                                         make_calibrating_model_fn,
                                         prequantize_params)
    from tera_mind_tpu.parallel.generator import (GeneratorConfig,
                                                  TeraGenerator)

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(21), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([0], jnp.int32)
    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)
    paramsQ = prequantize_params(paramsP)

    gconf = GeneratorConfig(tile=64, patch=32, gn_blk=16, snum=4,
                            n_slices=6, stains=2, gdim=16,
                            noise_backend="jax")
    sched = spaced_schedule("linear", 1000, "ddim5")
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=32,
                                                    gn_sz=2))
    rng = np.random.default_rng(4)
    gene = (rng.random((2, 2, gconf.gsz, gconf.gsz, gconf.z_pad,
                        gconf.gdim)) < 0.05).astype(np.uint8)

    # exact reference chain
    exact = PackedTeraUNet(conf)

    def mf_exact(xp, tm, rp, p1, p2):
        return exact.apply(paramsP, xp, tm, rp, p1, p2,
                           decode_original=False)

    a = TeraGenerator(sampler, mf_exact, gconf).run(gene, row0=1, col0=1,
                                                    progress=False)

    # calibration chain (dynamic int8, instrumented)
    dyn = PackedTeraUNet(conf, quant="int8", prequant=True)
    accum = {}
    cgen = TeraGenerator(sampler, make_calibrating_model_fn(dyn, accum),
                         gconf, params=paramsQ)
    cgen.run(gene, row0=1, col0=1, progress=False)
    assert accum and all(k[0] == "calib" and k[-1] == "a_max"
                         for k in accum)
    assert all(v > 0 for v in accum.values())

    paramsS = bake_act_scales(paramsQ, accum)
    sta = PackedTeraUNet(conf, quant="int8", prequant=True,
                         static_act=True)

    def mf_sta(p, xp, tm, rp, p1, p2):
        return sta.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    b = TeraGenerator(sampler, mf_sta, gconf, params=paramsS).run(
        gene, row0=1, col0=1, progress=False)

    assert np.isfinite(b).all()
    d = np.abs(a - b)
    assert np.mean(d) < 0.03, np.mean(d)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    assert abs(a.mean() - b.mean()) < 0.01
    assert abs(a.std() - b.std()) / a.std() < 0.02


@pytest.mark.slow
def test_calibrate_generator_callback_free():
    """calibrate_generator (the axon-safe path: amaxes as jit outputs,
    no host callbacks) produces baked scales whose static chain matches
    the exact chain under the statistical gates."""
    from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,
                                                 SamplerConfig)
    from tera_mind_tpu.diffusion.schedule import spaced_schedule
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import (calibrate_generator,
                                         prequantize_params)
    from tera_mind_tpu.parallel.generator import (GeneratorConfig,
                                                  TeraGenerator)

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(23), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([0], jnp.int32)
    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)
    paramsQ = prequantize_params(paramsP)

    gconf = GeneratorConfig(tile=64, patch=32, gn_blk=16, snum=4,
                            n_slices=6, stains=2, gdim=16,
                            noise_backend="jax")
    sched = spaced_schedule("linear", 1000, "ddim5")
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=32,
                                                    gn_sz=2))
    rng = np.random.default_rng(6)
    gene = (rng.random((2, 2, gconf.gsz, gconf.gsz, gconf.z_pad,
                        gconf.gdim)) < 0.05).astype(np.uint8)

    exact = PackedTeraUNet(conf)

    def mf_exact(xp, tm, rp, p1, p2):
        return exact.apply(paramsP, xp, tm, rp, p1, p2,
                           decode_original=False)

    a = TeraGenerator(sampler, mf_exact, gconf).run(gene, row0=1, col0=1,
                                                    progress=False)

    dyn = PackedTeraUNet(conf, quant="int8", prequant=True)

    def mf_dyn(p, xp, tm, rp, p1, p2):
        return dyn.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    cgen = TeraGenerator(sampler, mf_dyn, gconf, params=paramsQ)
    paramsS = calibrate_generator(cgen, dyn, paramsQ, gene, steps=5)
    # every resblock conv got a scale
    n_scales = sum(1 for k, _ in jax.tree_util.tree_leaves_with_path(
        paramsS) if getattr(k[-1], "key", None) == "a_scale")
    n_kq = sum(1 for k, _ in jax.tree_util.tree_leaves_with_path(
        paramsS) if getattr(k[-1], "key", None) == "kernel_q")
    assert n_scales == n_kq > 0, (n_scales, n_kq)

    sta = PackedTeraUNet(conf, quant="int8", prequant=True,
                         static_act=True)

    def mf_sta(p, xp, tm, rp, p1, p2):
        return sta.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    b = TeraGenerator(sampler, mf_sta, gconf, params=paramsS).run(
        gene, row0=1, col0=1, progress=False)

    assert np.isfinite(b).all()
    d = np.abs(a - b)
    assert np.mean(d) < 0.03, np.mean(d)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    assert abs(a.mean() - b.mean()) < 0.01
    assert abs(a.std() - b.std()) / a.std() < 0.02

    # regression (round-5 rehearsal, cli.generate --quant int8_static
    # with the --window_chunk -1 AUTO default): `window_chunk or n_win`
    # on -1 made the calibration window loop an EMPTY negative range —
    # zero amaxes recorded, the static model later died on missing
    # a_scale.  The auto plan must resolve inside calibrate_generator.
    import dataclasses
    gconf_auto = dataclasses.replace(gconf, window_chunk=-1)
    cgen_auto = TeraGenerator(sampler, mf_dyn, gconf_auto, params=paramsQ)
    paramsA = calibrate_generator(cgen_auto, dyn, paramsQ, gene, steps=2)
    n_auto = sum(1 for k, _ in jax.tree_util.tree_leaves_with_path(
        paramsA) if getattr(k[-1], "key", None) == "a_scale")
    assert n_auto == n_kq, (n_auto, n_kq)


@pytest.mark.slow
def test_streaming_quant_matches_in_hbm():
    """--stream --quant: the host-streaming path (state beyond HBM,
    parallel/streaming.py) must reproduce the in-HBM quantized chain, so
    the whole-brain deployment mode gets the int8 speedup
    (cli.generate --stream --quant, scripts/bench_ladder.py --quant).
    Both paths denoise each tile with the same fixed-shape model call, so
    results agree to jit-boundary fusion noise."""
    from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,
                                                 SamplerConfig)
    from tera_mind_tpu.diffusion.schedule import spaced_schedule
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import (calibrate_generator,
                                         prequantize_params)
    from tera_mind_tpu.parallel.generator import (GeneratorConfig,
                                                  TeraGenerator)
    from tera_mind_tpu.parallel.streaming import (StreamConfig,
                                                  StreamingGenerator)

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(29), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([0], jnp.int32)
    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)
    paramsQ = prequantize_params(paramsP)

    gconf = GeneratorConfig(tile=64, patch=32, gn_blk=16, snum=4,
                            n_slices=6, stains=2, gdim=16,
                            noise_backend="jax")
    sched = spaced_schedule("linear", 1000, "ddim5")
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=32,
                                                    gn_sz=2))
    rows = cols = 3
    rng = np.random.default_rng(8)
    gene = (rng.random((rows, cols, gconf.gsz, gconf.gsz, gconf.z_pad,
                        gconf.gdim)) < 0.05).astype(np.uint8)

    dyn = PackedTeraUNet(conf, quant="int8", prequant=True)

    def mf_dyn(p, xp, tm, rp, p1, p2):
        return dyn.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    # calibrate on the first 2x2 block (the bench_ladder/CLI protocol)
    cgen = TeraGenerator(sampler, mf_dyn, gconf, params=paramsQ)
    paramsS = calibrate_generator(cgen, dyn, paramsQ, gene[:2, :2],
                                  steps=5)

    sta = PackedTeraUNet(conf, quant="int8", prequant=True,
                         static_act=True)

    def mf_sta(p, xp, tm, rp, p1, p2):
        return sta.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    gen = TeraGenerator(sampler, mf_sta, gconf, params=paramsS)
    want = gen.run(gene, row0=1, col0=1, progress=False)

    sgen = StreamingGenerator(gen, StreamConfig(block_rows=2, block_cols=2,
                                                progress=False))
    got = np.asarray(sgen.run(rows, cols, gene, row0=1, col0=1).read)

    assert np.isfinite(got).all()
    # identical per-tile math; XLA may fuse the streamed window program
    # differently from the whole-grid program (ulp-level), amplified by
    # the 5-step DDIM chain -> tight numeric + statistical gates
    np.testing.assert_allclose(got, want, atol=5e-4)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999


def test_quant_attn_model_close_and_prequant_exact():
    """quant_attn=True (int8 DiT dense projections — adaLN, q/k/v/proj,
    MLP; ops/quant.py QuantDense) must stay close to the exact model, and
    prequantized dense kernels must reproduce the dynamic path (same
    quantize_weight, hoisted)."""
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import prequantize_params

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(31), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([55], jnp.int32)

    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)

    exact = PackedTeraUNet(conf)
    dyn = PackedTeraUNet(conf, quant="int8", quant_attn=True)
    ce, oe = jax.jit(lambda p: exact.apply(p, x, t, rna, 2, 2))(paramsP)
    cd, od = jax.jit(lambda p: dyn.apply(p, x, t, rna, 2, 2))(paramsP)
    for a, b in ((ce, cd), (oe, od)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        scale = np.abs(a).max() + 1e-6
        assert np.max(np.abs(a - b)) / scale < 0.15, \
            np.max(np.abs(a - b)) / scale
        assert np.mean(np.abs(a - b)) / scale < 0.02, \
            np.mean(np.abs(a - b)) / scale

    paramsQ = prequantize_params(paramsP, attn=True)
    n_dense_q = sum(
        1 for k, v in jax.tree_util.tree_leaves_with_path(paramsQ)
        if getattr(k[-1], "key", None) == "kernel_q" and v.ndim == 2)
    assert n_dense_q > 0  # DiT denses actually got quantized
    pre = PackedTeraUNet(conf, quant="int8", prequant=True,
                         quant_attn=True)
    cp, op = jax.jit(lambda p: pre.apply(p, x, t, rna, 2, 2))(paramsQ)
    atol = 0 if jax.default_backend() in ("tpu", "axon") else 1e-5
    np.testing.assert_allclose(np.asarray(cd), np.asarray(cp), atol=atol)
    np.testing.assert_allclose(np.asarray(od), np.asarray(op), atol=atol)


@pytest.mark.slow
def test_quant_attn_chain_quality_static():
    """Deployment gate for the quant_attn int8_static mode (the bench/CLI
    default when --quant is on): calibrate through calibrate_generator
    with DiT denses quantized, run the static chain, compare to the exact
    chain with the same statistical gates as the conv-only mode."""
    from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,
                                                 SamplerConfig)
    from tera_mind_tpu.diffusion.schedule import spaced_schedule
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.ops.quant import (calibrate_generator,
                                         prequantize_params)
    from tera_mind_tpu.parallel.generator import (GeneratorConfig,
                                                  TeraGenerator)

    conf = _tiny_conf()
    kx, kr, kp = jax.random.split(jax.random.PRNGKey(37), 3)
    x = jax.random.normal(kx, (4, 32, 32, 4), jnp.float32)
    rna = (jax.random.uniform(kr, (4, 2, 2, 64)) < 0.2
           ).astype(jnp.float32) * 2
    t = jnp.array([0], jnp.int32)
    model5 = conf.make_model()
    params5 = jax.jit(lambda k: model5.init(k, x, t, rna, 2, 2))(kp)
    paramsP = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), conf)
    paramsQ = prequantize_params(paramsP, attn=True)

    gconf = GeneratorConfig(tile=64, patch=32, gn_blk=16, snum=4,
                            n_slices=6, stains=2, gdim=16,
                            noise_backend="jax")
    sched = spaced_schedule("linear", 1000, "ddim5")
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=32,
                                                    gn_sz=2))
    rng = np.random.default_rng(10)
    gene = (rng.random((2, 2, gconf.gsz, gconf.gsz, gconf.z_pad,
                        gconf.gdim)) < 0.05).astype(np.uint8)

    exact = PackedTeraUNet(conf)

    def mf_exact(xp, tm, rp, p1, p2):
        return exact.apply(paramsP, xp, tm, rp, p1, p2,
                           decode_original=False)

    a = TeraGenerator(sampler, mf_exact, gconf).run(gene, row0=1, col0=1,
                                                    progress=False)

    dyn = PackedTeraUNet(conf, quant="int8", prequant=True,
                         quant_attn=True)

    def mf_dyn(p, xp, tm, rp, p1, p2):
        return dyn.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    cgen = TeraGenerator(sampler, mf_dyn, gconf, params=paramsQ)
    paramsS = calibrate_generator(cgen, dyn, paramsQ, gene, steps=5)
    # every quantized kernel (convs AND denses) got a calibrated scale
    n_scales = sum(1 for k, _ in jax.tree_util.tree_leaves_with_path(
        paramsS) if getattr(k[-1], "key", None) == "a_scale")
    n_kq = sum(1 for k, _ in jax.tree_util.tree_leaves_with_path(
        paramsS) if getattr(k[-1], "key", None) == "kernel_q")
    assert n_scales == n_kq > 0, (n_scales, n_kq)

    sta = PackedTeraUNet(conf, quant="int8", prequant=True,
                         static_act=True, quant_attn=True)

    def mf_sta(p, xp, tm, rp, p1, p2):
        return sta.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    b = TeraGenerator(sampler, mf_sta, gconf, params=paramsS).run(
        gene, row0=1, col0=1, progress=False)

    assert np.isfinite(b).all()
    d = np.abs(a - b)
    assert np.mean(d) < 0.03, np.mean(d)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    assert abs(a.mean() - b.mean()) < 0.01
    assert abs(a.std() - b.std()) / a.std() < 0.02


def test_to_inference_dtype_preserves_quant_leaves():
    """floats -> bf16 but int8 kernels and f32 w_scale/a_scale survive
    (static-path bit-exactness depends on f32 scale arithmetic)."""
    from tera_mind_tpu.ops.quant import (prequantize_params,
                                         to_inference_dtype)

    tree = {"params": {
        "enc_1_res": {"in_conv": {"kernel": jnp.ones((3, 3, 4, 8)),
                                  "bias": jnp.zeros((8,))}},
        "stem": {"kernel": jnp.ones((3, 3, 4, 8)),
                 "bias": jnp.zeros((8,))}}}
    q = prequantize_params(tree)
    q["params"]["enc_1_res"]["in_conv"]["a_scale"] = \
        jnp.float32(0.01234567)
    c = to_inference_dtype(q)
    conv = c["params"]["enc_1_res"]["in_conv"]
    assert conv["kernel_q"].dtype == jnp.int8
    assert conv["w_scale"].dtype == jnp.float32
    assert conv["a_scale"].dtype == jnp.float32
    assert float(conv["a_scale"]) == float(np.float32(0.01234567))
    assert conv["bias"].dtype == jnp.bfloat16
    assert c["params"]["stem"]["kernel"].dtype == jnp.bfloat16
