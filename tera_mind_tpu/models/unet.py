"""TeraUNet: dual-decoder ("collage") 3D patch UNet with mRNA conditioning.

TPU-native rebuild of the reference's main model (CTPLab/Tera-MIND
model/unet_ours.py:82-432).  The network is trained on small patches but
decodes twice with shared weights — once on the original patch grid and
once on a half-patch-shifted collage reassembled from neighboring patches —
which is what makes arbitrarily-large generation seamless.

Differences from the reference by design (TPU-first):
- channels-last (B, Z, H, W, C) feature maps,
- patch/collage moves are pure reshapes under jit (ops/collage.py),
- no data-dependent control flow: p1/p2 are static; both decoder passes are
  unrolled at trace time.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.collage import to_collage
from .attention import DiTBlock
from .blocks import ResBlock3D
from .nn import (RMSNorm, TimeEmbed, conv3d, timestep_embedding,
                 upsample_2x)
from .rna import RNATower, rna_grid_from_dense


@dataclasses.dataclass(frozen=True)
class TeraUNetConfig:
    """Structural hyperparameters (reference unet_ours.py:16-79 defaults,
    preset values from config_parm.py:11-59)."""

    image_size: int = 64          # patch size the UNet operates on
    in_channels: int = 4          # pixel channels = stains * z_size
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
    gn_sz: int = 4                # gene bins per patch side
    use_pos: bool = False
    use_zero_module: bool = True  # zero-init residual out-convs
    dtype_name: str = "float32"   # compute dtype: float32 | bfloat16

    @property
    def z_size(self) -> int:
        """Image z-voxels per patch = ceil(len(rna_tpl)/2) (unet_ours.py:103)."""
        return math.ceil(len(self.rna_tpl) / 2)

    @property
    def stains(self) -> int:
        return self.in_channels // self.z_size

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32

    def make_model(self) -> "TeraUNet":
        return TeraUNet(self)


# RNA tower output channels per stage (reference unet_ours.py:278-279).
def _rna_channels(rna_num: int) -> List[int]:
    return [rna_num, 128, 64, 32]


class TeraUNet(nn.Module):
    """See module docstring.  Forward operates on a patch batch:

    x:   (B*p1*p2, ps, ps, in_channels) noisy pixel patches (stain-major
         channel order: c = s*z_size + z)
    t:   (B,) int32 timesteps on the ORIGINAL T scale
    rna: (B*p1*p2, gn_sz, gn_sz, z_rna*G) dense binned gene counts (z-major)
    p1, p2: static patch-grid dims (2 for training crops, tiles/patch+1 at
         sampling time; reference unet_ours.py:361-365)

    Returns (pred_collage, pred_original):
      pred_collage:  (B*(p1-1)*(p2-1), ps, ps, out_channels)
      pred_original: (B*p1*p2, ps, ps, out_channels)
    """

    conf: TeraUNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, rna: jnp.ndarray,
                 p1: int, p2: int, *, deterministic: bool = True,
                 decode_original: bool = True,
                 pos_emb: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conf = self.conf
        dt = conf.dtype
        z_size = conf.z_size
        z_rna = len(conf.rna_tpl)
        nrb = conf.num_res_blocks
        nlvl = len(conf.channel_mult)
        rna_och = _rna_channels(conf.rna_num)

        # ---- time embeddings for the two decoder passes (unet_ours.py:367-374)
        t_emb = timestep_embedding(t, conf.model_channels)
        emb_b = TimeEmbed(conf.embed_channels, use_pos=conf.use_pos,
                          name="time_embed")(t_emb, pos_emb)
        emb_orig = jnp.repeat(emb_b, p1 * p2, axis=0)
        emb_col = jnp.repeat(emb_b, (p1 - 1) * (p2 - 1), axis=0)

        # ---- RNA tower (stage r has spatial 2^(r+1)*gn_sz, matching level
        #      resolutions from the bottom up; unet_ours.py:277-296)
        rna_grid = rna_grid_from_dense(rna.astype(dt), z_rna, conf.rna_num)
        rna_feats, rna_pres, _ = RNATower(rna_num=conf.rna_num, z_rna=z_rna,
                                          gn_sz=conf.gn_sz, dtype=dt,
                                          name="rna_tower")(rna_grid)

        # ---- pixel -> voxel
        bp, ps, _, _ = x.shape
        h = x.astype(dt).reshape(bp, ps, ps, conf.stains, z_size)
        h = h.transpose(0, 4, 1, 2, 3)  # (Bp, Z, ps, ps, S)

        # ---- encoder ---------------------------------------------------
        # hid[level] collects every block output for the skip connections
        # (unet_ours.py:381-390); rna_feats[-lvl-1] is concatenated on
        # channels for all non-first blocks of a level AND fed as adaLN cond
        # to the attention blocks.
        h = conv3d(conf.model_channels, (1, 3, 3), dtype=dt,
                   name="stem")(h)
        hid: List[List[jnp.ndarray]] = [[h]]
        resolution = conf.image_size
        k = 1
        for lvl, mult in enumerate(conf.channel_mult):
            if lvl > 0:
                # transition: downsampling ResBlock registered as this
                # level's first block (unet_ours.py:166-190)
                h = ResBlock3D(out_channels=h.shape[-1], down=True,
                               dropout=conf.dropout,
                               use_zero_module=conf.use_zero_module,
                               compute_dtype=dt, name=f"enc_{k}_res")(
                                   h, emb_orig, deterministic=deterministic)
                resolution //= 2
                k += 1
                hid.append([h])
            rfeat = rna_feats[nlvl - 1 - lvl]
            for _ in range(nrb):
                h = jnp.concatenate([h, rfeat], axis=-1)
                h = ResBlock3D(out_channels=mult * conf.model_channels,
                               dropout=conf.dropout, compute_dtype=dt,
                               use_zero_module=conf.use_zero_module,
                               name=f"enc_{k}_res")(
                                   h, emb_orig, deterministic=deterministic)
                if resolution in conf.attention_resolutions:
                    h = DiTBlock(hidden_size=h.shape[-1],
                                 num_heads=conf.num_heads, n_win=2,
                                 dtype=dt, name=f"enc_{k}_attn")(h, rfeat)
                hid[lvl].append(h)
                k += 1

        # ---- middle (unet_ours.py:192-214, 392-394) ---------------------
        h = jnp.concatenate([h, rna_feats[0]], axis=-1)
        h = ResBlock3D(out_channels=h.shape[-1] - rna_och[0],
                       dropout=conf.dropout, compute_dtype=dt,
                       use_zero_module=conf.use_zero_module,
                       name="mid_res0")(h, emb_orig,
                                        deterministic=deterministic)
        h = DiTBlock(hidden_size=h.shape[-1], num_heads=conf.num_heads,
                     n_win=2, dtype=dt, name="mid_attn")(h, rna_feats[0])
        h = ResBlock3D(out_channels=h.shape[-1], dropout=conf.dropout,
                       use_zero_module=conf.use_zero_module,
                       compute_dtype=dt, name="mid_res1")(
                           h, emb_orig, deterministic=deterministic)

        # ---- dual decoder (unet_ours.py:397-425) -------------------------
        # o=0: half-patch-shifted collage pass; o=1: original patches.
        # Weights are SHARED between the passes: each block module is
        # created once and invoked twice.
        dec_res, dec_attn, dec_up = [], [], []
        res = resolution
        k = 0
        for i in range(nlvl):              # i=0 is the deepest level
            lvl = nlvl - 1 - i
            mult = conf.channel_mult[lvl]
            for j in range(nrb + 1):
                dec_res.append(ResBlock3D(
                    out_channels=mult * conf.model_channels,
                    dropout=conf.dropout, compute_dtype=dt,
                    use_zero_module=conf.use_zero_module,
                    name=f"dec_{k}_res"))
                dec_attn.append(DiTBlock(
                    hidden_size=mult * conf.model_channels,
                    num_heads=conf.num_heads, n_win=2, dtype=dt,
                    name=f"dec_{k}_attn")
                    if res in conf.attention_resolutions else None)
                if lvl > 0 and j == nrb:
                    dec_up.append(ResBlock3D(
                        out_channels=mult * conf.model_channels, up=True,
                        dropout=conf.dropout, compute_dtype=dt,
                        use_zero_module=conf.use_zero_module,
                        name=f"dec_{k}_up"))
                    res *= 2
                else:
                    dec_up.append(None)
                k += 1
        out_norm = RMSNorm(name="out_norm")
        out_conv = conv3d(conf.stains, (1, 3, 3), dtype=dt,
                          name="out_conv")

        # Sampling consumes ONLY the collage decode (reference
        # p_mean_variance reads model_forward.pred, base.py:387); skipping
        # the original-grid pass (o=1) at inference saves ~the whole second
        # decoder.  Training needs both for the dual loss.
        preds = []
        for o in range(2 if decode_original else 1):
            hdec = h
            emb = emb_col if o == 0 else emb_orig
            skips = [list(level) for level in hid]
            k = 0
            for i in range(nlvl):
                lvl = nlvl - 1 - i
                if o == 0:
                    if i == 0:
                        hdec = to_collage(hdec, p1, p2)
                    # collage the PRE-upsample rna stage (4x fewer elements)
                    # and upsample after — exactly equal (rna.py docstring)
                    rcnd = upsample_2x(to_collage(rna_pres[i], p1, p2))
                else:
                    rcnd = rna_feats[i]
                for j in range(nrb + 1):
                    hcnd = skips[lvl].pop()
                    if o == 0:
                        hcnd = to_collage(hcnd, p1, p2)
                    hdec = jnp.concatenate([hdec, hcnd, rcnd], axis=-1)
                    hdec = dec_res[k](hdec, emb, deterministic=deterministic)
                    if dec_attn[k] is not None:
                        hdec = dec_attn[k](hdec, rcnd)
                    if dec_up[k] is not None:
                        hdec = dec_up[k](hdec, emb,
                                         deterministic=deterministic)
                    k += 1

            out = out_norm(hdec)
            out = nn.silu(out)
            out = out_conv(out)
            # voxel -> pixel: (B, Z, ps, ps, S) -> (B, ps, ps, S*Z)
            b2 = out.shape[0]
            out = out.transpose(0, 2, 3, 4, 1).reshape(
                b2, ps, ps, conf.out_channels)
            preds.append(out.astype(jnp.float32))

        return preds[0], (preds[1] if decode_original else None)
