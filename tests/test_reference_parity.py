"""Cross-framework numerical parity vs the LIVE torch reference model.

These tests instantiate the reference's real ``BeatGANsUNetModel`` and
``SpacedDiffusionBeatGans`` (CTPLab/Tera-MIND model/unet_ours.py:82-432,
diffusion/base.py:334-631) on CPU with random weights, convert the torch
state dict with ``tera_mind_tpu.convert``, and assert that:

1. the flax TeraUNet forward matches both decoder outputs,
2. one DDIM step via ``denoise_step`` matches ``sample(idx=...)`` — the
   tera-scale single-step hook (test_brn.py:209-217, base.py:572),
3. the full T_eval-step DDIM loop matches ``ddm_sample_loop`` end to end,
4. the same holds at the full 638850-flagship model size (forward only).

This is the direct evidence for the <=1e-3 per-patch MAE target
(BASELINE.json): any semantic drift between the frameworks fails here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tera_mind_tpu.convert import convert_unet_params  # noqa: E402
from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,  # noqa: E402
                                             SamplerConfig)
from tera_mind_tpu.diffusion.schedule import spaced_schedule  # noqa: E402
from tera_mind_tpu.models.unet import TeraUNetConfig  # noqa: E402
from tera_mind_tpu.ops.collage import patchify  # noqa: E402

from reference_compat import (build_reference_model,  # noqa: E402
                              build_reference_sampler,
                              torch_state_dict_numpy)

# f32 CPU agreement is ~1e-6..1e-5; on TPU the MXU (even at "highest"
# precision) + reassociation across the DDIM 1/sqrt(alpha_bar) amplification
# needs a looser bound.  Both are far inside the 1e-3 north-star.
_ON_CPU = jax.default_backend() == "cpu"
FWD_TOL = 5e-5 if _ON_CPU else 2e-3
LOOP_TOL = 2e-4 if _ON_CPU else 5e-3

G_DATA = 500  # the data pipeline always carries 500-gene arrays
              # (reference MBADataset.py, get_rna g=500 at unet_ours.py:308)


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


@pytest.fixture(scope="module")
def tiny_pair():
    """(torch_model, our_model, our_params, our_conf) at toy size."""
    torch.manual_seed(0)
    tmodel, _ = build_reference_model(
        image_size=32, in_channels=4, model_channels=8, embed_channels=32,
        rna_num=16)
    conf = TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16,
                          rna_tpl=(0, 1, 2, 3), in_channels=4, out_channels=4,
                          model_channels=8, embed_channels=32, dropout=0.0)
    params = convert_unet_params(torch_state_dict_numpy(tmodel), conf)
    params = jax.tree.map(jnp.asarray, params)
    return tmodel, conf.make_model(), params, conf


def _torch_forward(tmodel, x, t, rna, *, do_train, ps, p1=2, p2=2):
    """x, rna channels-last numpy; returns (pred, pred2) channels-last."""
    imgs = torch.zeros((1, x.shape[-1], (p1 - 1) * ps, (p2 - 1) * ps))
    with torch.no_grad():
        out = tmodel(_nchw(x), torch.from_numpy(t), rna=torch.from_numpy(rna),
                     imgs=imgs, do_train=do_train, patch_size=ps)
    to_np = lambda v: v.numpy().transpose(0, 2, 3, 1)
    return to_np(out.pred), to_np(out.pred2)


def test_forward_parity_tiny(tiny_pair):
    tmodel, model, params, conf = tiny_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 32, 32, 4)).astype(np.float32)
    rna = rng.integers(0, 3, (4, 2, 2, 4 * G_DATA)).astype(np.float32)
    t = np.array([500], np.int32)

    ref_col, ref_orig = _torch_forward(tmodel, x, t, rna, do_train=True,
                                       ps=32)
    with jax.default_matmul_precision("highest"):
        got_col, got_orig = jax.jit(
            lambda p, a, b, c: model.apply(p, a, b, c, 2, 2))(
                params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(rna))
    mae_col = float(jnp.abs(got_col - ref_col).mean())
    mae_orig = float(jnp.abs(got_orig - ref_orig).mean())
    assert mae_col < FWD_TOL, f"collage decoder MAE {mae_col}"
    assert mae_orig < FWD_TOL, f"original decoder MAE {mae_orig}"


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_ddim_single_step_parity(tiny_pair):
    """denoise_step == reference sample(idx=...) on a 2x2-tile state
    (the tera-scale inner op, reference test_brn.py:209-217)."""
    tmodel, model, params, _ = tiny_pair
    ps, gn, T_eval = 32, 2, 5
    rng = np.random.default_rng(2)
    x_pad = rng.standard_normal((1, 96, 96, 4)).astype(np.float32)
    rna9 = rng.integers(0, 3, (9, gn, gn, 4 * G_DATA)).astype(np.float32)

    ref_sampler = build_reference_sampler(T_eval=T_eval, image_size=ps)
    ours = DiffusionSampler(spaced_schedule("linear", 1000, f"ddim{T_eval}"),
                            SamplerConfig(patch_size=ps, gn_sz=gn))

    xp = np.asarray(patchify(jnp.asarray(x_pad), ps))  # (9, 32, 32, 4)

    def model_fn(xpat, tm, rpat, p1, p2):
        return model.apply(params, xpat, tm, rpat, p1, p2)

    for idx in (T_eval - 1, 2, 0):
        with torch.no_grad():
            ref = ref_sampler.sample(
                model=tmodel, shape=(1, 4, 64, 64), imgs=_nchw(xp),
                noise=_nchw(xp), r_start=torch.from_numpy(rna9),
                patch_size=ps, idx=idx, model_kwargs=None)
        ref = ref.numpy().transpose(0, 2, 3, 1)
        with jax.default_matmul_precision("highest"):
            got = ours.denoise_step(model_fn, jnp.asarray(x_pad),
                                    jnp.asarray(rna9),
                                    jnp.array([idx], jnp.int32))
        mae = float(jnp.abs(got - ref).mean())
        assert mae < LOOP_TOL, f"idx={idx} MAE {mae}"


def test_full_ddim_loop_parity(tiny_pair):
    """Full T_eval-step generation: our lax.scan loop vs the reference's
    ddm_sample_loop (base.py:538-631), identical x_T."""
    tmodel, model, params, _ = tiny_pair
    ps, gn, T_eval = 32, 2, 5
    rng = np.random.default_rng(3)
    rna9 = rng.integers(0, 3, (9, gn, gn, 4 * G_DATA)).astype(np.float32)

    ref_sampler = build_reference_sampler(T_eval=T_eval, image_size=ps)
    ours = DiffusionSampler(spaced_schedule("linear", 1000, f"ddim{T_eval}"),
                            SamplerConfig(patch_size=ps, gn_sz=gn))

    # the reference loop draws x_T itself (base.py:566: th.randn(shapes)) —
    # reproduce it by seeding and pre-capturing the same draw
    torch.manual_seed(7)
    img0 = torch.randn((1, 4, 64, 64)).numpy().transpose(0, 2, 3, 1)
    torch.manual_seed(7)
    with torch.no_grad():
        ref = ref_sampler.sample(
            model=tmodel, shape=(1, 4, 64, 64), imgs=None,
            noise=torch.zeros((1, 1, ps, 1)),  # only shape[2]=patch_size used
            r_start=torch.from_numpy(rna9), patch_size=ps, idx=None,
            model_kwargs=None)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    def model_fn(xpat, tm, rpat, p1, p2):
        return model.apply(params, xpat, tm, rpat, p1, p2)

    with jax.default_matmul_precision("highest"):
        got = jax.jit(lambda n, r: ours.sample(model_fn, n, r))(
            jnp.asarray(img0), jnp.asarray(rna9))
    mae = float(jnp.abs(got - ref).mean())
    assert mae < LOOP_TOL, f"15-step-loop MAE {mae}"
    assert float(jnp.abs(got).max()) <= 1.0 + 1e-6


@pytest.mark.slow
def test_forward_parity_flagship_size(tmp_path):
    """Same check at the real 638850 config (net_ch=64, 229-plex, 64px
    patches, ~210M params) — catches any size-dependent drift."""
    torch.manual_seed(0)
    tmodel, _ = build_reference_model(
        image_size=64, in_channels=4, model_channels=64, embed_channels=512,
        rna_num=229)
    conf = TeraUNetConfig(image_size=64, gn_sz=4, rna_num=229,
                          rna_tpl=(0, 1, 2, 3), in_channels=4, out_channels=4,
                          model_channels=64, embed_channels=512, dropout=0.0)
    params = convert_unet_params(torch_state_dict_numpy(tmodel), conf)
    params = jax.tree.map(jnp.asarray, params)
    model = conf.make_model()

    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 64, 64, 4)).astype(np.float32)
    rna = rng.integers(0, 3, (4, 4, 4, 4 * G_DATA)).astype(np.float32)
    t = np.array([500], np.int32)

    ref_col, ref_orig = _torch_forward(tmodel, x, t, rna, do_train=True,
                                       ps=64)
    with jax.default_matmul_precision("highest"):
        got_col, got_orig = jax.jit(
            lambda p, a, b, c: model.apply(p, a, b, c, 2, 2))(
                params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(rna))
    mae_col = float(jnp.abs(got_col - ref_col).mean())
    mae_orig = float(jnp.abs(got_orig - ref_orig).mean())
    # the BASELINE.json north-star bound, directly
    assert mae_col < 1e-3, f"flagship collage MAE {mae_col}"
    assert mae_orig < 1e-3, f"flagship original MAE {mae_orig}"


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_training_loss_parity(tiny_pair, monkeypatch):
    """Dual-decoder patch-block training loss vs reference training_losses
    (base.py:181-289), same noise, same crop origin, same timestep."""
    from reference_compat import import_reference
    _, _, ref_base, _choices = import_reference()
    tmodel, model, params, _ = tiny_pair
    ps, gn, b = 32, 2, 1
    hp = wp = 3 * ps          # padded image: 2x2-patch crop + half-pad
    rng = np.random.default_rng(6)
    x_pad = np.zeros((b, hp, wp, 4), np.float32)
    x_pad[:, ps // 2:-ps // 2, ps // 2:-ps // 2] = rng.standard_normal(
        (b, hp - ps, wp - ps, 4)).clip(-1, 1)
    rna_pad = np.zeros((b, hp // 16, wp // 16, 4 * G_DATA), np.float32)
    rna_pad[:, 1:-1, 1:-1] = rng.integers(
        0, 3, (b, hp // 16 - 2, wp // 16 - 2, 4 * G_DATA))
    noise = rng.standard_normal(x_pad.shape).astype(np.float32)
    t0, ix, iy = 700, 1, 0

    # ---- reference: full-T spaced sampler (identity timestep map, so the
    # _WrappedModel r->rna translation happens like in training,
    # diffusion.py:123-161), sparse rna tuple, cuda shims
    sampler_t = build_reference_sampler(T=1000, T_eval=1000, image_size=ps)

    orig_tensor = torch.tensor

    def cpu_tensor(*a, **k):
        if k.get("device") == "cuda":
            k["device"] = "cpu"
        return orig_tensor(*a, **k)
    monkeypatch.setattr(ref_base.th, "tensor", cpu_tensor)
    crops = iter([ix, iy])
    monkeypatch.setattr(ref_base.random, "randrange",
                        lambda n: next(crops))

    nz = np.nonzero(rna_pad)
    r_start = (torch.from_numpy(rna_pad[nz].astype(np.float32)),
               torch.from_numpy(np.stack(nz).astype(np.int64)),
               torch.Size(rna_pad.shape))
    loss_mask = np.zeros((b, 1, hp, wp), np.float32)
    loss_mask[:, :, ps // 2:-ps // 2, ps // 2:-ps // 2] = 1.0
    with torch.no_grad():
        terms = sampler_t.training_losses(
            model=tmodel,
            x_start=torch.from_numpy(x_pad.transpose(0, 3, 1, 2)),
            r_start=r_start,
            imgs=torch.zeros((b, 4, hp - ps, wp - ps)),
            t=torch.tensor([t0]),
            pos=torch.zeros((hp // ps, wp // ps, 2)),
            loss_mask=torch.from_numpy(loss_mask),
            idx=torch.tensor([0]),
            patch_size=ps,
            noise=torch.from_numpy(noise.transpose(0, 3, 1, 2)))
    want = float(terms["loss"])

    # ---- ours: same noise/crop/timestep; q_sample noise layout matches
    from tera_mind_tpu.diffusion.schedule import train_schedule
    ours = DiffusionSampler(train_schedule("linear", 1000),
                            SamplerConfig(patch_size=ps, gn_sz=gn))

    def model_fn(xp, tm, rp, p1, p2):
        return model.apply(params, xp, tm, rp, p1, p2)

    with jax.default_matmul_precision("highest"):
        got = float(ours.training_loss(
            model_fn, jnp.asarray(x_pad), jnp.asarray(rna_pad),
            jnp.array([t0], jnp.int32), jax.random.PRNGKey(0),
            noise=jnp.asarray(noise), block_idx=(ix, iy)))
    assert abs(got - want) < (1e-5 if _ON_CPU else 1e-3), (got, want)
