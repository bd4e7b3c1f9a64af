"""CLIP feature-extractor numerics vs torch (VERDICT r2 missing #3).

The reference extracts CLIP-FID features with OpenAI CLIP ViT-B/32
(feat_mba.py:164-179) after ``fn_resize(mode='clip')`` preprocessing
(feat_mba.py:199-208).  Real weights are env-blocked (zero egress), so —
mirroring the Inception approach (tests/inception_torch_replica.py) — we
prove the NUMERICS on a weight-shared tiny CLIP: transformers' torch
``CLIPModel`` (the same architecture family the OpenAI checkpoint converts
into, quick-GELU and all) vs the Flax tower our ``CLIPFeatures`` wraps,
loaded from the identical torch checkpoint via ``from_pt``.

Preprocessing is cross-checked against a straight-line in-test replica of
the reference's fn_resize/post_dim/CLIP_fx math (feat_mba.py:182-208,
170-172).  torchvision is absent here; its tensor resize path is
``interpolate(mode='bicubic', antialias=True)`` + integer round-trip,
which both sides call explicitly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPVisionConfig)
    torch.manual_seed(7)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            vocab_size=99).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8).to_dict(),
        projection_dim=16)
    pt = CLIPModel(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_clip")
    pt.save_pretrained(d)
    return pt, str(d)


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_flax_clip_matches_torch(tiny_clip):
    """Weight-shared torch-vs-flax image-feature parity at ~1e-5: the exact
    cross-framework evidence VERDICT asked for (reference CLIP_fx,
    feat_mba.py:164-179)."""
    from tera_mind_tpu.metrics.features import CLIPFeatures

    pt, d = tiny_clip
    feats = CLIPFeatures(d)
    assert feats.dim == 16 and feats.size == 32

    rng = np.random.default_rng(3)
    batch = rng.uniform(0, 255, size=(5, 48, 40, 2)).astype(np.float32)

    ours = feats(batch)

    # torch side: the reference chain on the SAME preprocessed pixels
    from tera_mind_tpu.metrics.features import clip_preprocess
    pix = torch.from_numpy(clip_preprocess(batch, 32))
    with torch.no_grad():
        theirs = pt.get_image_features(pixel_values=pix).numpy()

    scale = np.abs(theirs).max()
    assert np.abs(ours - theirs).max() <= 2e-5 * scale, \
        (np.abs(ours - theirs).max(), scale)


def _reference_clip_chain(x_np: np.ndarray, sz: int) -> np.ndarray:
    """Straight-line replica of the reference's preprocessing
    (feat_mba.py:199-208 fn_resize mode='clip', 182-196 post_dim,
    170-172 CLIP_fx normalize), written directly from the cited lines.

    fn_resize: assert float32 -> x.byte() -> torchvision resize(bicubic,
    antialias) [tensor path == interpolate + round/clamp for int dtypes]
    -> clamp(0,255) -> float().div(255) -> post_dim channel rules; then
    torchvision-Normalize with the CLIP constants.
    """
    import torch.nn.functional as TF
    x = torch.from_numpy(x_np)
    assert "float32" in str(x.dtype)
    x = x.byte()
    # torchvision F.resize on an integer tensor: upcast, interpolate with
    # antialias, round + clamp back to the dtype
    xf = TF.interpolate(x.float(), (sz, sz), mode="bicubic", antialias=True)
    x = xf.round().clamp(0, 255).to(torch.uint8)
    x = x.clamp(0, 255)
    x = x.float().div(255)
    if x.shape[1] == 1:
        x = x.repeat(1, 3, 1, 1)
    elif x.shape[1] == 2:
        x = torch.cat((torch.zeros_like(x[:, 0])[:, None], x), 1)
    mean = torch.tensor((0.48145466, 0.4578275, 0.40821073))
    std = torch.tensor((0.26862954, 0.26130258, 0.27577711))
    return ((x - mean.view(1, 3, 1, 1)) / std.view(1, 3, 1, 1)).numpy()


@pytest.mark.parametrize("chans", [1, 2, 3])
def test_clip_preprocess_matches_reference_chain(chans):
    from tera_mind_tpu.metrics.features import clip_preprocess

    rng = np.random.default_rng(chans)
    x = rng.uniform(0, 255, size=(3, 64, 72, chans)).astype(np.float32)
    ours = clip_preprocess(x, 24)
    theirs = _reference_clip_chain(
        np.ascontiguousarray(x.transpose(0, 3, 1, 2)), 24)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_clip_preprocess_byte_truncation_and_zero_prepend():
    """The subtle bits: 254.7 truncates to 254 (byte(), not round), and the
    2-stain case gets its zero channel FIRST (feat_mba.py:193-196)."""
    from tera_mind_tpu.metrics.features import clip_preprocess

    x = np.full((1, 8, 8, 2), 254.7, np.float32)
    out = clip_preprocess(x, 8)
    mean = np.array((0.48145466, 0.4578275, 0.40821073))
    std = np.array((0.26862954, 0.26130258, 0.27577711))
    np.testing.assert_allclose(out[0, 0], (0.0 - mean[0]) / std[0],
                               rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], (254 / 255 - mean[1]) / std[1],
                               rtol=1e-6)
