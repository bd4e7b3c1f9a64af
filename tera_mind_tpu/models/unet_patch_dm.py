"""Patch-DM baseline UNet (method='patch-dm').

TPU-native rebuild of the reference baseline (CTPLab/Tera-MIND
model/unet_patch_dm.py): the same dual-decoder collage scheme as the
flagship model, but with the original Patch-DM design choices —

- legacy GroupNorm ResBlocks and 8x8-window single-head self-attention
  (blocks.py) instead of RMSNorm/DiT blocks,
- RNA features concatenated ONLY in the decoder (unet_patch_dm.py:228-239);
  no adaLN conditioning and no gene cross-attention,
- explicit per-patch sinusoidal positional embeddings combined with the
  time embedding ([time_half | pos_half], unet_patch_dm.py:376-454): the
  encoder/original-decoder pass uses the caller patch grid, the collage
  pass uses shifted patch-center positions.

API matches ``ModelFn``: ``__call__(x, t, rna, p1, p2) -> (pred_col,
pred_orig)`` so it plugs into DiffusionSampler/TeraGenerator unchanged.
The reference's classifier-free pos dropout (``pos_random``) is part of its
dead CFG machinery (SURVEY.md 7.4) and is not ported.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.collage import to_collage
from .legacy_blocks import GroupNorm32, LegacyResBlock3D, WindowSelfAttention
from .nn import TimeEmbed, conv3d, timestep_embedding
from .rna import RNATower, rna_grid_from_dense


@dataclasses.dataclass(frozen=True)
class PatchDMUNetConfig:
    """Structural hyperparameters (reference unet_patch_dm.py:30-106)."""

    image_size: int = 64
    in_channels: int = 4
    model_channels: int = 64
    out_channels: int = 4
    num_res_blocks: int = 2
    embed_channels: int = 512
    attention_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_heads: int = 1
    rna_tpl: Tuple[int, ...] = (0, 1, 2, 3)
    rna_num: int = 500
    gn_sz: int = 4
    use_pos: bool = True          # patch-dm default (unet_patch_dm.py:142)
    use_zero_module: bool = True
    dtype_name: str = "float32"

    @property
    def z_size(self) -> int:
        return math.ceil(len(self.rna_tpl) / 2)

    @property
    def stains(self) -> int:
        return self.in_channels // self.z_size

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32

    def make_model(self) -> "PatchDMUNet":
        return PatchDMUNet(self)


def _grid_pos_emb(p1: int, p2: int, b: int, dim: int = 64) -> jnp.ndarray:
    """Sinusoidal embedding of patch-center positions (i+0.5, j+0.5) for a
    (p1 x p2) grid, tiled over the batch (unet_patch_dm.py:430-435)."""
    xs = jnp.arange(p1, dtype=jnp.float32) + 0.5
    ys = jnp.arange(p2, dtype=jnp.float32) + 0.5
    px = timestep_embedding(jnp.repeat(xs, p2), dim)
    py = timestep_embedding(jnp.tile(ys, p1), dim)
    e = jnp.concatenate([px, py], axis=-1)          # (p1*p2, 2*dim)
    return jnp.tile(e, (b, 1))


class PatchDMUNet(nn.Module):
    """See module docstring."""

    conf: PatchDMUNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, rna: jnp.ndarray,
                 p1: int, p2: int, *, deterministic: bool = True,
                 decode_original: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conf = self.conf
        dt = conf.dtype
        z_size = conf.z_size
        z_rna = len(conf.rna_tpl)
        nrb = conf.num_res_blocks
        nlvl = len(conf.channel_mult)
        b = t.shape[0]

        # ---- time(+pos) embeddings, one per decoder grid ------------------
        time_embed = TimeEmbed(conf.embed_channels, use_pos=conf.use_pos,
                               name="time_embed")

        def grid_emb(g1: int, g2: int) -> jnp.ndarray:
            te = timestep_embedding(jnp.repeat(t, g1 * g2),
                                    conf.model_channels)
            pe = _grid_pos_emb(g1, g2, b) if conf.use_pos else None
            return time_embed(te, pe)

        emb_orig = grid_emb(p1, p2)
        emb_col = grid_emb(p1 - 1, p2 - 1)

        # ---- RNA tower (decoder-only conditioning) ------------------------
        rna_grid = rna_grid_from_dense(rna.astype(dt), z_rna, conf.rna_num)
        rna_feats, _, _ = RNATower(rna_num=conf.rna_num, z_rna=z_rna,
                                gn_sz=conf.gn_sz, dtype=dt,
                                name="rna_tower")(rna_grid)

        # ---- pixel -> voxel ----------------------------------------------
        bp, ps, _, _ = x.shape
        h = x.astype(dt).reshape(bp, ps, ps, conf.stains, z_size)
        h = h.transpose(0, 4, 1, 2, 3)

        # ---- encoder (no RNA; unet_patch_dm.py:464-476) -------------------
        h = conv3d(conf.model_channels, (1, 3, 3), name="stem")(h)
        hid: List[List[jnp.ndarray]] = [[h]]
        resolution = conf.image_size
        k = 1
        for lvl, mult in enumerate(conf.channel_mult):
            if lvl > 0:
                h = LegacyResBlock3D(out_channels=h.shape[-1], down=True,
                                     dropout=conf.dropout,
                                     use_zero_module=conf.use_zero_module,
                                     name=f"enc_{k}_res")(
                                         h, emb_orig,
                                         deterministic=deterministic)
                resolution //= 2
                k += 1
                hid.append([h])
            for _ in range(nrb):
                h = LegacyResBlock3D(out_channels=mult * conf.model_channels,
                                     dropout=conf.dropout,
                                     use_zero_module=conf.use_zero_module,
                                     name=f"enc_{k}_res")(
                                         h, emb_orig,
                                         deterministic=deterministic)
                if resolution in conf.attention_resolutions:
                    h = WindowSelfAttention(name=f"enc_{k}_attn")(h)
                hid[lvl].append(h)
                k += 1

        # ---- middle -------------------------------------------------------
        h = LegacyResBlock3D(out_channels=h.shape[-1], dropout=conf.dropout,
                             use_zero_module=conf.use_zero_module,
                             name="mid_res0")(h, emb_orig,
                                              deterministic=deterministic)
        h = WindowSelfAttention(name="mid_attn")(h)
        h = LegacyResBlock3D(out_channels=h.shape[-1], dropout=conf.dropout,
                             use_zero_module=conf.use_zero_module,
                             name="mid_res1")(h, emb_orig,
                                              deterministic=deterministic)

        # ---- dual decoder (unet_patch_dm.py:478-527) ----------------------
        dec_res, dec_attn, dec_up = [], [], []
        res = resolution
        k = 0
        for i in range(nlvl):
            lvl = nlvl - 1 - i
            mult = conf.channel_mult[lvl]
            for j in range(nrb + 1):
                dec_res.append(LegacyResBlock3D(
                    out_channels=mult * conf.model_channels,
                    dropout=conf.dropout,
                    use_zero_module=conf.use_zero_module,
                    name=f"dec_{k}_res"))
                dec_attn.append(WindowSelfAttention(name=f"dec_{k}_attn")
                                if res in conf.attention_resolutions else None)
                if lvl > 0 and j == nrb:
                    dec_up.append(LegacyResBlock3D(
                        out_channels=mult * conf.model_channels, up=True,
                        dropout=conf.dropout,
                        use_zero_module=conf.use_zero_module,
                        name=f"dec_{k}_up"))
                    res *= 2
                else:
                    dec_up.append(None)
                k += 1
        out_norm = GroupNorm32(name="out_norm")
        out_conv = conv3d(conf.stains, (1, 3, 3),
                          zero_init=conf.use_zero_module, name="out_conv")

        preds = []
        for o in range(2 if decode_original else 1):
            hdec = h
            emb = emb_col if o == 0 else emb_orig
            skips = [list(level) for level in hid]
            k = 0
            for i in range(nlvl):
                lvl = nlvl - 1 - i
                rcnd = rna_feats[i]
                if o == 0:
                    if i == 0:
                        hdec = to_collage(hdec, p1, p2)
                    rcnd = to_collage(rcnd, p1, p2)
                for j in range(nrb + 1):
                    hcnd = skips[lvl].pop()
                    if o == 0:
                        hcnd = to_collage(hcnd, p1, p2)
                    hdec = jnp.concatenate([hdec, hcnd, rcnd], axis=-1)
                    hdec = dec_res[k](hdec, emb,
                                      deterministic=deterministic)
                    if dec_attn[k] is not None:
                        hdec = dec_attn[k](hdec)
                    if dec_up[k] is not None:
                        hdec = dec_up[k](hdec, emb,
                                         deterministic=deterministic)
                    k += 1

            out = out_norm(hdec)
            out = nn.silu(out)
            out = out_conv(out)
            b2 = out.shape[0]
            out = out.transpose(0, 2, 3, 4, 1).reshape(
                b2, ps, ps, conf.out_channels)
            preds.append(out.astype(jnp.float32))

        return preds[0], (preds[1] if decode_original else None)
