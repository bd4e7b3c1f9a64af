"""Torch (Lightning) checkpoint -> flax parameter conversion.

Maps the reference's ``last.ckpt`` state dict (keys like
``model.input_blocks.3.0.in_layers.2.weight``; loaders strip the ``model.``
prefix and drop ``ema_model`` keys — reference experiment.py:52-58,
test_brn.py:140-147) onto this package's TeraUNet param tree, so released
Zenodo checkpoints run natively on TPU.

Weight layout transforms:
- Linear  (out,in)          -> Dense kernel (in,out)
- Conv3d  (O,I,kz,kh,kw)    -> Conv kernel (kz,kh,kw,I,O)
- RMSNorm (1,C,1,1) or (C,) -> (C,)
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from .models.unet import TeraUNetConfig


def _lin(sd, name):
    return {"kernel": sd[f"{name}.weight"].T.copy(),
            "bias": sd[f"{name}.bias"].copy()}


def _conv(sd, name):
    w = sd[f"{name}.weight"]
    return {"kernel": np.transpose(w, (2, 3, 4, 1, 0)).copy(),
            "bias": sd[f"{name}.bias"].copy()}


def _norm(sd, name):
    return {"weight": sd[f"{name}.weight"].reshape(-1).copy()}


def _resblock(sd, pfx) -> Dict:
    out = {
        "in_norm": _norm(sd, f"{pfx}.in_layers.0"),
        "in_conv": _conv(sd, f"{pfx}.in_layers.2"),
        "emb_proj": _lin(sd, f"{pfx}.emb_layers.1"),
        "out_norm": _norm(sd, f"{pfx}.out_layers.0"),
        "out_conv": _conv(sd, f"{pfx}.out_layers.3"),
    }
    if f"{pfx}.skip_connection.weight" in sd:
        out["skip_conv"] = _conv(sd, f"{pfx}.skip_connection")
    return out


def _attn_common(sd, pfx) -> Dict:
    return {
        "q": _lin(sd, f"{pfx}.attn.q"),
        "v": _lin(sd, f"{pfx}.attn.v"),
        "proj": _lin(sd, f"{pfx}.attn.proj"),
        "q_norm": _norm(sd, f"{pfx}.attn.q_norm"),
    }


def _dit_block(sd, pfx) -> Dict:
    attn = _attn_common(sd, pfx)
    attn["k"] = _lin(sd, f"{pfx}.attn.k")
    attn["k_norm"] = _norm(sd, f"{pfx}.attn.k_norm")
    return {
        "attn": attn,
        "norm1": _norm(sd, f"{pfx}.norm1"),
        "norm2": _norm(sd, f"{pfx}.norm2"),
        "mlp": {"fc1": _lin(sd, f"{pfx}.mlp.fc1"),
                "fc2": _lin(sd, f"{pfx}.mlp.fc2")},
        "adaLN": _lin(sd, f"{pfx}.adaLN_modulation.1"),
    }


def _gene_block(sd, pfx) -> Dict:
    return {
        **_attn_common(sd, pfx),
        "norm2": _norm(sd, f"{pfx}.norm2"),
        "mlp": {"fc1": _lin(sd, f"{pfx}.mlp.fc1"),
                "fc2": _lin(sd, f"{pfx}.mlp.fc2")},
        "down_z": _conv(sd, f"{pfx}.down_z"),
    }


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load the Lightning ckpt, strip 'model.' prefix and ema keys."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["state_dict"] if "state_dict" in state else state
    out = {}
    for k, v in sd.items():
        if "ema_model" in k:
            continue
        out[k.removeprefix("model.")] = v.detach().cpu().numpy()
    return out


def load_pretrain_params(path: str | Path, conf: TeraUNetConfig) -> Dict:
    """Parameters to INITIALIZE training from (the reference's
    pretrain/``continue_from`` seam, experiment.py:50-58, 464-473):
    either a torch Lightning ``.ckpt`` (converted here; ``ema_model``
    keys dropped by :func:`load_torch_state_dict`, exactly as the
    reference strips them) or an orbax CheckpointManager dir written by
    ``Trainer.save``.  Returns the flax param tree (5D TeraUNet layout,
    consumed as-is by both TeraUNet and PackedTeraUNet(from_5d=True))."""
    path = Path(path)
    if path.suffix == ".ckpt":
        return convert_unet_params(load_torch_state_dict(path), conf)
    if path.is_dir():
        import orbax.checkpoint as ocp
        mgr = ocp.CheckpointManager(path.absolute())
        step = mgr.latest_step()
        assert step is not None, f"no orbax steps under {path}"
        restored = mgr.restore(step)
        return restored.get("ema_params") or restored["params"]
    raise ValueError(f"unrecognized pretrain checkpoint: {path} "
                    "(expected a .ckpt file or an orbax directory)")


def convert_unet_params(sd: Dict[str, np.ndarray],
                        conf: TeraUNetConfig) -> Dict:
    """Build the flax param tree for TeraUNet from a reference state dict."""
    nrb = conf.num_res_blocks
    nlvl = len(conf.channel_mult)
    p: Dict = {}

    # time embed (use_pos=False in the canonical preset)
    p["time_embed"] = {"time_0": _lin(sd, "time_embed.time_embed.0"),
                       "time_2": _lin(sd, "time_embed.time_embed.2")}

    # RNA tower
    tower: Dict = {"gene_attn": _gene_block(sd, "rna_blocks.0.0")}
    for rid in range(1, 4):
        tower[f"conv_{rid}"] = _conv(sd, f"rna_blocks.{rid}.1")
    p["rna_tower"] = tower

    # encoder
    p["stem"] = _conv(sd, "input_blocks.0.0")
    resolution = conf.image_size
    k = 1
    for lvl in range(nlvl):
        if lvl > 0:
            p[f"enc_{k}_res"] = _resblock(sd, f"input_blocks.{k}.0")
            resolution //= 2
            k += 1
        for _ in range(nrb):
            p[f"enc_{k}_res"] = _resblock(sd, f"input_blocks.{k}.0")
            if resolution in conf.attention_resolutions:
                p[f"enc_{k}_attn"] = _dit_block(sd, f"input_blocks.{k}.1")
            k += 1

    # middle
    p["mid_res0"] = _resblock(sd, "middle_block.0")
    p["mid_attn"] = _dit_block(sd, "middle_block.1")
    p["mid_res1"] = _resblock(sd, "middle_block.2")

    # decoder
    res = resolution
    k = 0
    for i in range(nlvl):
        lvl = nlvl - 1 - i
        for j in range(nrb + 1):
            p[f"dec_{k}_res"] = _resblock(sd, f"output_blocks.{k}.0")
            li = 1
            if res in conf.attention_resolutions:
                p[f"dec_{k}_attn"] = _dit_block(sd, f"output_blocks.{k}.{li}")
                li += 1
            if lvl > 0 and j == nrb:
                p[f"dec_{k}_up"] = _resblock(sd, f"output_blocks.{k}.{li}")
                res *= 2
            k += 1

    p["out_norm"] = _norm(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")
    return {"params": p}


def check_against_model(params: Dict, model, example_inputs) -> None:
    """Shape-check converted params against a fresh init of the model."""
    import jax

    ref = model.init(jax.random.PRNGKey(0), *example_inputs)
    ref_flat = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
    got_flat = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, params))[0])
    missing = set(ref_flat) - set(got_flat)
    extra = set(got_flat) - set(ref_flat)
    if missing or extra:
        raise ValueError(
            f"param tree mismatch:\nmissing={sorted(map(str, missing))}\n"
            f"extra={sorted(map(str, extra))}")
    for key, val in ref_flat.items():
        g = got_flat[key]
        if tuple(g.shape) != tuple(val.shape):
            raise ValueError(f"shape mismatch at {jax.tree_util.keystr(key)}: "
                             f"ckpt {g.shape} vs model {val.shape}")
