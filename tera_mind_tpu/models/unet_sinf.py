"""'sinf' baseline: flat ConvNeXt denoiser (method='sinf').

TPU-native rebuild of the reference baseline (CTPLab/Tera-MIND
model/unet_sinf.py): a depth-16 chain of ConvNeXt blocks at full patch
resolution with U-style residual pops — the first half pushes activations,
the second half consumes cat(x, residual, rna).  RNA conditioning reuses
the 4-stage tower; only its full-resolution output feeds this model
(unet_sinf.py:174, 266).

The reference model predicts a single eps per patch (no dual decoder; its
training path is dead code there, SURVEY.md 2.4/7.4).  To plug into our
DiffusionSampler/TeraGenerator API unchanged, ``__call__`` additionally
returns the half-patch-shifted collage of the per-patch predictions as
``pred_col`` — output-level collage instead of feature-level (a documented
design difference; the per-patch prediction itself is faithful).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.collage import to_collage
from .rna import RNATower, rna_grid_from_dense


@dataclasses.dataclass(frozen=True)
class SinfNetConfig:
    """Reference unet_sinf.py:81-150 (filters_per_layer=64, depth=16)."""

    image_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 64      # filters per layer
    depth: int = 16
    mlp_mult: int = 3
    rna_tpl: Tuple[int, ...] = (0, 1, 2, 3)
    rna_num: int = 500
    gn_sz: int = 4
    dtype_name: str = "float32"

    @property
    def z_size(self) -> int:
        return math.ceil(len(self.rna_tpl) / 2)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_name == "bfloat16" else jnp.float32

    def make_model(self) -> "SinfNet":
        return SinfNet(self)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels only, biased variance (unet_sinf.py:34-44)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (c,))
        b = self.param("b", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        return (y * g + b).astype(x.dtype)


class ConvNextBlock(nn.Module):
    """Depthwise 7x7 -> (+time emb) -> LN -> 3x3 expand -> GELU -> 3x3,
    residual (unet_sinf.py:47-78)."""

    out_channels: int
    mlp_mult: int = 3
    norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = nn.Conv(c, kernel_size=(7, 7), padding=3,
                    feature_group_count=c, name="ds_conv")(x)
        cond = nn.Dense(c, name="emb_proj")(nn.gelu(emb))
        h = h + cond[:, None, None, :].astype(h.dtype)
        if self.norm:
            h = ChannelLayerNorm(name="norm")(h)
        h = nn.Conv(self.out_channels * self.mlp_mult, kernel_size=(3, 3),
                    padding=1, name="conv1")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.out_channels, kernel_size=(3, 3), padding=1,
                    name="conv2")(h)
        if c != self.out_channels:
            x = nn.Conv(self.out_channels, kernel_size=(1, 1),
                        name="res_conv")(x)
        return h + x


class SinfNet(nn.Module):
    """See module docstring.  API matches ``ModelFn``."""

    conf: SinfNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, rna: jnp.ndarray,
                 p1: int, p2: int, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        conf = self.conf
        dt = conf.dtype
        z_rna = len(conf.rna_tpl)
        depth = conf.depth
        dim = conf.model_channels
        bp, ps, _, _ = x.shape

        # time embedding: sin-first sinusoid -> Dense(4d) -> GELU -> Dense(d)
        # (unet_sinf.py:19-31, 181-186), repeated per patch
        t_rep = jnp.repeat(t, bp // t.shape[0])
        half = dim // 2
        freqs = jnp.exp(-math.log(10000.0) / (half - 1)
                        * jnp.arange(half, dtype=jnp.float32))
        args = t_rep.astype(jnp.float32)[:, None] * freqs[None]
        t_emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        emb = nn.Dense(dim * 4, name="time_1")(t_emb)
        emb = nn.gelu(emb)
        emb = nn.Dense(dim, name="time_3")(emb)

        # RNA tower; only the full-resolution stage conditions this model
        rna_grid = rna_grid_from_dense(rna.astype(dt), z_rna, conf.rna_num)
        rna_feats, _, _ = RNATower(rna_num=conf.rna_num, z_rna=z_rna,
                                gn_sz=conf.gn_sz, dtype=dt,
                                name="rna_tower")(rna_grid)
        rfull = rna_feats[-1]                       # (Bp, z2, ps, ps, 32)
        b2, zz, hh, ww, cc = rfull.shape
        rfull = rfull.transpose(0, 2, 3, 1, 4).reshape(b2, hh, ww, zz * cc)

        h = x.astype(dt)
        residuals = []
        half_d = (depth + 1) // 2
        for i in range(half_d):
            h = ConvNextBlock(out_channels=dim, mlp_mult=conf.mlp_mult,
                              norm=(i > 0), name=f"layer_{i}")(h, emb)
            residuals.append(h)
        for i in range(half_d, depth):
            h = jnp.concatenate([h, residuals.pop(), rfull], axis=-1)
            h = ConvNextBlock(out_channels=dim, mlp_mult=conf.mlp_mult,
                              name=f"layer_{i}")(h, emb)

        pred = nn.Conv(conf.out_channels, kernel_size=(1, 1),
                       name="final_conv")(h).astype(jnp.float32)

        # output-level collage for sampler compatibility (module docstring)
        pred5 = pred[:, None]                       # (Bp, 1, ps, ps, C)
        pred_col = to_collage(pred5, p1, p2)[:, 0]
        return pred_col, pred
