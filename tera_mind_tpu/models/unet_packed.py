"""z-packed TeraUNet: the flagship model with z folded into channels.

Same architecture and parameters as :class:`~.unet.TeraUNet`, but every
voxel tensor (B, Z, H, W, C) is carried as (B, H, W, Z*C) — doubling TPU
lane occupancy at the top level (C=64 -> 128 lanes) and removing the z
axis from every norm/elementwise/copy op, which the round-1 profile
showed dominate step time (convs are ~2%).

Measured result (round 1, bench.py BENCH_PACKED=1): 0.0889 tiles/s vs
0.0946 for the 5D layout — the z-group concat reshapes (strided scatters
per skip/rna concat) cost more than the lane-occupancy win, so the 5D
layout REMAINS THE DEFAULT.  Kept as an exact-reparameterization tool and
a starting point for a block-contiguous-packing variant (plain concats,
permutation absorbed into conv kernels) if revisited.

Equivalence: a trained 5D model's params convert EXACTLY via
:func:`pack_unet_params` (3D kernels become block-structured 2D kernels,
ops/zpack.py) — outputs match the 5D model up to float reassociation
(golden-tested).  Attention blocks and the RNA tower run unchanged in 5D
(resolution-16 tensors are small; the pack/unpack there is two cheap
reshapes), so their param subtrees are shared verbatim.

Note on fresh training: a freshly initialized packed conv mixes all
(z, c) pairs — a strictly larger weight class than the z-convolutional 3D
kernel.  Train the 5D model and convert for exact parity; train packed
directly only if the wider class is acceptable.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.collage import to_collage
from ..ops.zpack import (group_concat, pack_conv3d_bias, pack_conv3d_kernel,
                         pack_channel_param, pack_features, packed_to_pixel,
                         pixel_to_packed, unpack_features)
from .attention import DiTBlock
from .nn import TimeEmbed, timestep_embedding
from .rna import RNATower, rna_grid_from_dense
from .unet import TeraUNetConfig, _rna_channels

import jax


class GroupedRMSNorm(nn.Module):
    """RMSNorm over each z-group of C channels of a (.., Z*C) tensor.

    Param shape (Z*C,) = the 5D norm's (C,) weight tiled z times, so
    converted params load directly."""

    z: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        zc = x.shape[-1]
        c = zc // self.z
        weight = self.param("weight", nn.initializers.ones, (zc,))
        lead = x.shape[:-1]
        xg = x.reshape(*lead, self.z, c)
        var = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        inv = jax.lax.rsqrt(var + self.eps)
        y = (xg * inv.astype(x.dtype)).reshape(*lead, zc)
        return (y * weight.astype(x.dtype)).astype(x.dtype)


def _up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _down2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def conv2p(features, kernel=(3, 3), *, zero_init=False, dtype=None,
           name=None):
    pad = [((k - 1) // 2,) * 2 for k in kernel]
    init = nn.initializers.zeros if zero_init \
        else nn.initializers.lecun_normal()
    return nn.Conv(features, kernel_size=tuple(kernel), padding=pad,
                   use_bias=True, kernel_init=init, dtype=dtype, name=name)


class PackedResBlock(nn.Module):
    """ResBlock3D on the packed layout; param names match ResBlock3D."""

    out_channels: int          # per-z channels C (NOT Z*C)
    z: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    use_zero_module: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        dt = self.compute_dtype
        z = self.z
        in_zc = x.shape[-1]
        out_zc = z * self.out_channels

        h = GroupedRMSNorm(z=z, name="in_norm")(x.astype(dt))
        h = nn.silu(h)
        if self.up:
            h, x = _up2(h), _up2(x)
        elif self.down:
            h, x = _down2(h), _down2(x)
        h = conv2p(out_zc, (3, 3), dtype=dt, name="in_conv")(h)

        h = GroupedRMSNorm(z=z, name="out_norm")(h)
        if emb is not None:
            emb_out = nn.Dense(2 * self.out_channels, dtype=dt,
                               name="emb_proj")(
                nn.silu(emb.astype(dt))).astype(h.dtype)
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            # per-C scale/shift broadcast over z (tile z-major)
            scale = jnp.tile(scale, (1, z))[:, None, None, :]
            shift = jnp.tile(shift, (1, z))[:, None, None, :]
            h = h * (1.0 + scale) + shift
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv2p(out_zc, (3, 3), zero_init=self.use_zero_module,
                   dtype=dt, name="out_conv")(h)

        if in_zc != out_zc:
            x = conv2p(out_zc, (1, 1), dtype=dt, name="skip_conv")(x)
        return (x + h).astype(dt)


def _collage4(x: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """to_collage on packed 4D tensors (insert a dummy z axis)."""
    return to_collage(x[:, None], p1, p2)[:, 0]


class PackedTeraUNet(nn.Module):
    """See module docstring; API identical to TeraUNet."""

    conf: TeraUNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, rna: jnp.ndarray,
                 p1: int, p2: int, *, deterministic: bool = True,
                 decode_original: bool = True,
                 pos_emb: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conf = self.conf
        dt = conf.dtype
        z = conf.z_size
        z_rna = len(conf.rna_tpl)
        nrb = conf.num_res_blocks
        nlvl = len(conf.channel_mult)
        rna_och = _rna_channels(conf.rna_num)

        t_emb = timestep_embedding(t, conf.model_channels)
        emb_b = TimeEmbed(conf.embed_channels, use_pos=conf.use_pos,
                          name="time_embed")(t_emb, pos_emb)
        emb_orig = jnp.repeat(emb_b, p1 * p2, axis=0)
        emb_col = jnp.repeat(emb_b, (p1 - 1) * (p2 - 1), axis=0)

        rna_grid = rna_grid_from_dense(rna.astype(dt), z_rna, conf.rna_num)
        rna_feats5, _ = RNATower(rna_num=conf.rna_num, z_rna=z_rna,
                                 gn_sz=conf.gn_sz, dtype=dt,
                                 name="rna_tower")(rna_grid)
        rna_feats = [pack_features(f, z) for f in rna_feats5]

        bp, ps, _, _ = x.shape
        h = pixel_to_packed(x.astype(dt), z)

        def attn(block: DiTBlock, hp, cond5):
            h5 = unpack_features(hp, z)
            return pack_features(block(h5, cond5), z)

        h = conv2p(z * conf.model_channels, (3, 3), dtype=dt,
                   name="stem")(h)
        hid: List[List[jnp.ndarray]] = [[h]]
        resolution = conf.image_size
        k = 1
        for lvl, mult in enumerate(conf.channel_mult):
            if lvl > 0:
                h = PackedResBlock(out_channels=h.shape[-1] // z, z=z,
                                   down=True, dropout=conf.dropout,
                                   use_zero_module=conf.use_zero_module,
                                   compute_dtype=dt, name=f"enc_{k}_res")(
                                       h, emb_orig,
                                       deterministic=deterministic)
                resolution //= 2
                k += 1
                hid.append([h])
            rfeat = rna_feats[nlvl - 1 - lvl]
            rfeat5 = rna_feats5[nlvl - 1 - lvl]
            for _ in range(nrb):
                h = group_concat(h, rfeat, z)
                h = PackedResBlock(out_channels=mult * conf.model_channels,
                                   z=z, dropout=conf.dropout,
                                   compute_dtype=dt,
                                   use_zero_module=conf.use_zero_module,
                                   name=f"enc_{k}_res")(
                                       h, emb_orig,
                                       deterministic=deterministic)
                if resolution in conf.attention_resolutions:
                    blk = DiTBlock(hidden_size=h.shape[-1] // z,
                                   num_heads=conf.num_heads, n_win=2,
                                   dtype=dt, name=f"enc_{k}_attn")
                    h = attn(blk, h, rfeat5)
                hid[lvl].append(h)
                k += 1

        h = group_concat(h, rna_feats[0], z)
        h = PackedResBlock(out_channels=h.shape[-1] // z - rna_och[0], z=z,
                           dropout=conf.dropout, compute_dtype=dt,
                           use_zero_module=conf.use_zero_module,
                           name="mid_res0")(h, emb_orig,
                                            deterministic=deterministic)
        blk = DiTBlock(hidden_size=h.shape[-1] // z,
                       num_heads=conf.num_heads, n_win=2, dtype=dt,
                       name="mid_attn")
        h = attn(blk, h, rna_feats5[0])
        h = PackedResBlock(out_channels=h.shape[-1] // z, z=z,
                           dropout=conf.dropout,
                           use_zero_module=conf.use_zero_module,
                           compute_dtype=dt, name="mid_res1")(
                               h, emb_orig, deterministic=deterministic)

        dec_res, dec_attn, dec_up = [], [], []
        res = resolution
        k = 0
        for i in range(nlvl):
            lvl = nlvl - 1 - i
            mult = conf.channel_mult[lvl]
            for j in range(nrb + 1):
                dec_res.append(PackedResBlock(
                    out_channels=mult * conf.model_channels, z=z,
                    dropout=conf.dropout, compute_dtype=dt,
                    use_zero_module=conf.use_zero_module,
                    name=f"dec_{k}_res"))
                dec_attn.append(DiTBlock(
                    hidden_size=mult * conf.model_channels,
                    num_heads=conf.num_heads, n_win=2, dtype=dt,
                    name=f"dec_{k}_attn")
                    if res in conf.attention_resolutions else None)
                if lvl > 0 and j == nrb:
                    dec_up.append(PackedResBlock(
                        out_channels=mult * conf.model_channels, z=z,
                        up=True, dropout=conf.dropout, compute_dtype=dt,
                        use_zero_module=conf.use_zero_module,
                        name=f"dec_{k}_up"))
                    res *= 2
                else:
                    dec_up.append(None)
                k += 1
        out_norm = GroupedRMSNorm(z=z, name="out_norm")
        out_conv = conv2p(z * conf.stains, (3, 3), dtype=dt,
                          name="out_conv")

        preds = []
        for o in range(2 if decode_original else 1):
            hdec = h
            emb = emb_col if o == 0 else emb_orig
            skips = [list(level) for level in hid]
            rna5_dec = rna_feats5
            k = 0
            for i in range(nlvl):
                lvl = nlvl - 1 - i
                rcnd = rna_feats[i]
                rcnd5 = rna5_dec[i]
                if o == 0:
                    if i == 0:
                        hdec = _collage4(hdec, p1, p2)
                    rcnd = _collage4(rcnd, p1, p2)
                    rcnd5 = to_collage(rcnd5, p1, p2)
                for j in range(nrb + 1):
                    hcnd = skips[lvl].pop()
                    if o == 0:
                        hcnd = _collage4(hcnd, p1, p2)
                    hdec = group_concat(group_concat(hdec, hcnd, z),
                                        rcnd, z)
                    hdec = dec_res[k](hdec, emb,
                                      deterministic=deterministic)
                    if dec_attn[k] is not None:
                        hdec = attn(dec_attn[k], hdec, rcnd5)
                    if dec_up[k] is not None:
                        hdec = dec_up[k](hdec, emb,
                                         deterministic=deterministic)
                    k += 1

            out = out_norm(hdec)
            out = nn.silu(out)
            out = out_conv(out)
            out = packed_to_pixel(out, z).astype(jnp.float32)
            preds.append(out)

        return preds[0], (preds[1] if decode_original else None)


# --------------------------------------------------------------------- #
# 5D -> packed parameter transform                                       #
# --------------------------------------------------------------------- #
def pack_unet_params(params5: Dict, conf: TeraUNetConfig) -> Dict:
    """Transform a TeraUNet param tree into PackedTeraUNet's.

    Conv3d kernels become block-structured 2D kernels; norm weights tile
    over z; attention / RNA tower / time-embed subtrees pass through."""
    z = conf.z_size
    p5 = params5["params"] if "params" in params5 else params5
    out: Dict = {}
    for name, sub in p5.items():
        if name.endswith("_res") or name in ("mid_res0", "mid_res1") \
                or name.endswith("_up"):
            blk = {}
            for lname, lv in sub.items():
                if lname in ("in_conv", "out_conv", "skip_conv"):
                    blk[lname] = {
                        "kernel": pack_conv3d_kernel(
                            np.asarray(lv["kernel"]), z),
                        "bias": pack_conv3d_bias(lv["bias"], z)}
                elif lname in ("in_norm", "out_norm"):
                    blk[lname] = {"weight": pack_channel_param(
                        lv["weight"], z)}
                else:
                    blk[lname] = lv
            out[name] = blk
        elif name in ("stem", "out_conv"):
            out[name] = {"kernel": pack_conv3d_kernel(
                np.asarray(sub["kernel"]), z),
                "bias": pack_conv3d_bias(sub["bias"], z)}
        elif name == "out_norm":
            out[name] = {"weight": pack_channel_param(sub["weight"], z)}
        else:
            out[name] = sub
    return {"params": out}
