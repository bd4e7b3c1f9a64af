"""Checkpoint-converter tests: build a reference-style torch state dict
from a flax init (inverse layout transforms), convert it back, and require
the round trip to reproduce the param tree exactly — this pins the
name mapping against the reference's module structure
(unet_ours.py:82-296)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tera_mind_tpu.convert import (check_against_model, convert_unet_params,
                                   load_torch_state_dict)
from tera_mind_tpu.models.unet import TeraUNetConfig

TINY = TeraUNetConfig(image_size=32, gn_sz=2, rna_num=16, rna_tpl=(0, 1, 2, 3),
                      in_channels=4, out_channels=4, model_channels=8,
                      embed_channels=32, dropout=0.0)


def _flax_to_torch_sd(params, conf):
    """Inverse of convert_unet_params: emit reference-named numpy arrays."""
    p = params["params"]
    sd = {}

    def lin(tname, node):
        sd[f"{tname}.weight"] = np.asarray(node["kernel"]).T
        sd[f"{tname}.bias"] = np.asarray(node["bias"])

    def conv(tname, node):
        k = np.asarray(node["kernel"])  # (kz,kh,kw,I,O)
        sd[f"{tname}.weight"] = k.transpose(4, 3, 0, 1, 2)
        sd[f"{tname}.bias"] = np.asarray(node["bias"])

    def norm(tname, node, chan_first=False):
        w = np.asarray(node["weight"])
        if chan_first:
            w = w.reshape(1, -1, 1, 1)
        sd[f"{tname}.weight"] = w

    def resblock(tname, node):
        norm(f"{tname}.in_layers.0", node["in_norm"], True)
        conv(f"{tname}.in_layers.2", node["in_conv"])
        lin(f"{tname}.emb_layers.1", node["emb_proj"])
        norm(f"{tname}.out_layers.0", node["out_norm"], True)
        conv(f"{tname}.out_layers.3", node["out_conv"])
        if "skip_conv" in node:
            conv(f"{tname}.skip_connection", node["skip_conv"])

    def dit(tname, node):
        for q in ("q", "k", "v", "proj"):
            lin(f"{tname}.attn.{q}", node["attn"][q])
        norm(f"{tname}.attn.q_norm", node["attn"]["q_norm"])
        norm(f"{tname}.attn.k_norm", node["attn"]["k_norm"])
        norm(f"{tname}.norm1", node["norm1"])
        norm(f"{tname}.norm2", node["norm2"])
        lin(f"{tname}.mlp.fc1", node["mlp"]["fc1"])
        lin(f"{tname}.mlp.fc2", node["mlp"]["fc2"])
        lin(f"{tname}.adaLN_modulation.1", node["adaLN"])

    def gene(tname, node):
        for q in ("q", "v", "proj"):
            lin(f"{tname}.attn.{q}", node[q])
        norm(f"{tname}.attn.q_norm", node["q_norm"])
        norm(f"{tname}.norm2", node["norm2"])
        lin(f"{tname}.mlp.fc1", node["mlp"]["fc1"])
        lin(f"{tname}.mlp.fc2", node["mlp"]["fc2"])
        conv(f"{tname}.down_z", node["down_z"])

    lin("time_embed.time_embed.0", p["time_embed"]["time_0"])
    lin("time_embed.time_embed.2", p["time_embed"]["time_2"])
    gene("rna_blocks.0.0", p["rna_tower"]["gene_attn"])
    for rid in range(1, 4):
        conv(f"rna_blocks.{rid}.1", p["rna_tower"][f"conv_{rid}"])
    conv("input_blocks.0.0", p["stem"])
    for name, node in p.items():
        if name.startswith("enc_") and name.endswith("_res"):
            k = int(name.split("_")[1])
            resblock(f"input_blocks.{k}.0", node)
        elif name.startswith("enc_") and name.endswith("_attn"):
            k = int(name.split("_")[1])
            dit(f"input_blocks.{k}.1", node)
    resblock("middle_block.0", p["mid_res0"])
    dit("middle_block.1", p["mid_attn"])
    resblock("middle_block.2", p["mid_res1"])

    nlvl, nrb = len(conf.channel_mult), conf.num_res_blocks
    res = conf.image_size // 2 ** (nlvl - 1)
    k = 0
    for i in range(nlvl):
        lvl = nlvl - 1 - i
        for j in range(nrb + 1):
            resblock(f"output_blocks.{k}.0", p[f"dec_{k}_res"])
            li = 1
            if res in conf.attention_resolutions:
                dit(f"output_blocks.{k}.{li}", p[f"dec_{k}_attn"])
                li += 1
            if lvl > 0 and j == nrb:
                resblock(f"output_blocks.{k}.{li}", p[f"dec_{k}_up"])
                res *= 2
            k += 1
    norm("out.0", p["out_norm"], True)
    conv("out.2", p["out_conv"])
    return sd


@pytest.fixture(scope="module")
def init_params():
    model = TINY.make_model()
    x = jnp.zeros((4, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    rna = jnp.zeros((4, 2, 2, 64))
    return model, (x, t, rna, 2, 2), model.init(
        jax.random.PRNGKey(0), x, t, rna, 2, 2)


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_convert_round_trip(init_params):
    model, inputs, params = init_params
    sd = _flax_to_torch_sd(params, TINY)
    back = convert_unet_params(sd, TINY)
    check_against_model(back, model, inputs)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, back))[0])
    for path, val in flat_a:
        np.testing.assert_array_equal(np.asarray(val),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_lightning_prefix_stripping(tmp_path, init_params):
    """load_torch_state_dict strips 'model.' and drops ema keys
    (reference experiment.py:52-58)."""
    torch = pytest.importorskip("torch")
    model, inputs, params = init_params
    sd = _flax_to_torch_sd(params, TINY)
    wrapped = {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    wrapped["ema_model.out.0.weight"] = torch.zeros(1)
    torch.save({"state_dict": wrapped}, tmp_path / "last.ckpt")
    loaded = load_torch_state_dict(tmp_path / "last.ckpt")
    assert "out.0.weight" in loaded
    assert not any("ema" in k for k in loaded)
    back = convert_unet_params(loaded, TINY)
    check_against_model(back, model, inputs)
