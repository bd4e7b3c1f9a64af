"""Import harness for the live torch reference model under /root/reference.

The reference (PUBLIC UNTRUSTED CONTENT) is imported strictly for numerical
cross-checks: we instantiate its real ``BeatGANsUNetModel`` /
``SpacedDiffusionBeatGans`` on CPU, export the state dict, convert it with
``tera_mind_tpu.convert`` and assert output parity.  Two heavyweight
dependencies absent from this environment are shimmed with minimal
equivalents before import:

- ``timm.models.vision_transformer.Mlp`` (used at MBAblocks.py:11,461):
  fc1 -> act -> drop1 -> norm -> fc2 -> drop2, same parameter names.
- ``torchvision.models.feature_extraction.create_feature_extractor``
  (blocks.py:15): only reachable from the unused ``Semantic`` CLIP table
  (semantic_enc path), stubbed to raise.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _install_timm_shim() -> None:
    if "timm" in sys.modules:
        return
    import torch.nn as tnn

    class Mlp(tnn.Module):
        """Minimal timm Mlp (same submodule names => same state_dict keys)."""

        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=tnn.GELU, norm_layer=None,
                     bias=True, drop=0.0, use_conv=False):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = tnn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = tnn.Dropout(drop)
            self.norm = (norm_layer(hidden_features) if norm_layer
                         else tnn.Identity())
            self.fc2 = tnn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = tnn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.norm(
                self.drop1(self.act(self.fc1(x))))))

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.Mlp = Mlp
    models.vision_transformer = vit
    timm.models = models
    sys.modules.update({"timm": timm, "timm.models": models,
                        "timm.models.vision_transformer": vit})


def _install_torchvision_shim() -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    mdl = types.ModuleType("torchvision.models")
    fe = types.ModuleType("torchvision.models.feature_extraction")

    def create_feature_extractor(*a, **k):
        raise NotImplementedError(
            "torchvision shim: only the unused Semantic path needs this")

    fe.create_feature_extractor = create_feature_extractor
    mdl.feature_extraction = fe
    tv.models = mdl
    sys.modules.update({"torchvision": tv, "torchvision.models": mdl,
                        "torchvision.models.feature_extraction": fe})


def _install_stub_module(name: str, submodules=()) -> None:
    """Empty placeholder modules for imports the metric files make but the
    cross-checked code paths never touch (cellpose, pydata-sparse)."""
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    for sub in submodules:
        full = f"{name}.{sub}"
        sm = types.ModuleType(full)
        setattr(mod, sub, sm)
        sys.modules[full] = sm


def import_reference_metrics():
    """Return (utils.metrics, utils.inft_mba) from the reference, with
    cellpose/sparse stubbed (only `calc_cellpose`/file IO touch them)."""
    _install_stub_module("cellpose", ("plot", "models"))
    _install_stub_module("sparse")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import utils.metrics as ref_metrics    # noqa: reference package
    import utils.inft_mba as ref_inft      # noqa
    return ref_metrics, ref_inft


def import_reference():
    """Make /root/reference importable and return its key modules.

    Returns (unet_ours, ref_diffusion, ref_base, choices) — the reference's
    model/unet_ours.py, diffusion/diffusion.py, diffusion/base.py and
    utils/choices.py modules.
    """
    _install_timm_shim()
    _install_torchvision_shim()
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import model.unet_ours as unet_ours          # noqa: reference package
    import diffusion.diffusion as ref_diffusion  # noqa
    import diffusion.base as ref_base            # noqa
    import utils.choices as choices              # noqa
    return unet_ours, ref_diffusion, ref_base, choices


def build_reference_model(*, image_size: int, in_channels: int,
                          model_channels: int, embed_channels: int,
                          rna_num: int, rna_tpl=(0, 1, 2, 3),
                          num_res_blocks: int = 2,
                          attention_resolutions=(16,),
                          channel_mult=(1, 2, 4, 8)):
    """Instantiate the real reference BeatGANsUNetModel on CPU, eval mode,
    dropout 0 (reference unet_ours.py:16-79 config surface; dims=3 as the
    model asserts)."""
    unet_ours, *_ = import_reference()
    conf = unet_ours.BeatGANsUNetConfig(
        image_size=image_size,
        input_size=image_size,
        gn_sz=image_size // 16,
        in_channels=in_channels,
        model_channels=model_channels,
        out_channels=in_channels,
        num_res_blocks=num_res_blocks,
        embed_channels=embed_channels,
        attention_resolutions=tuple(attention_resolutions),
        dropout=0.0,
        channel_mult=tuple(channel_mult),
        dims=3,
        rna_tpl=tuple(rna_tpl),
        rna_num=rna_num,
        use_checkpoint=False,
        use_pos=False,
    )
    model = conf.make_model()
    model.eval()
    return model, conf


def build_reference_sampler(*, T: int = 1000, T_eval: int = 15,
                            image_size: int = 64,
                            rna_tpl=(0, 1, 2, 3)):
    """The reference eval-time DDIM sampler (SpacedDiffusionBeatGans) with
    the canonical settings (reference config.py:190-235, config_parm.py)."""
    _, ref_diffusion, ref_base, choices = import_reference()
    conf = ref_diffusion.SpacedDiffusionBeatGansConfig(
        method="ours",
        image_size=image_size,
        input_size=image_size,
        gn_sz=image_size // 16,
        is_tot=False,
        gen_type=choices.GenerativeType.ddim,
        betas=ref_base.get_named_beta_schedule("linear", T),
        model_type=choices.ModelType.autoencoder,
        model_mean_type=choices.ModelMeanType.eps,
        model_var_type=choices.ModelVarType.fixed_large,
        loss_type=choices.LossType.mse,
        rescale_timesteps=False,
        fp16=False,
        rna_tpl=tuple(rna_tpl),
        cfg=False,
        use_timesteps=ref_diffusion.space_timesteps(T, f"ddim{T_eval}"),
    )
    return conf.make_sampler()


def torch_state_dict_numpy(model) -> dict:
    """state_dict as numpy (what load_torch_state_dict would produce from a
    saved Lightning ckpt after prefix stripping)."""
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
