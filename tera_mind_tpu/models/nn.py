"""Neural-net primitives (Flax linen), channels-last TPU layout.

Feature maps are ``(B, Z, H, W, C)``; norms and linears act on the last
axis, which maps onto TPU lanes.  Semantics-parity notes cite the reference
(CTPLab/Tera-MIND) as file:line.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class RMSNorm(nn.Module):
    """RMS norm over the channel (last) axis, computed in float32.

    Equivalent to the reference's LlamaRMSNorm (MBAblocks.py:21-43): the
    reference normalizes dim=1 of NCZHW tensors, i.e. per-position channel
    RMS — identical to last-axis RMS in channels-last layout.
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        if os.environ.get("TMT_PALLAS_NORM") == "1" \
                and x.dtype != jnp.float32:
            from ..ops.rmsnorm_kernel import rmsnorm_fused
            return rmsnorm_fused(x, weight, self.eps)
        dtype = x.dtype
        # statistics in f32 (accumulated inside the reduce: the cast fuses
        # without materializing an f32 copy of x — on bf16 activations that
        # copy was the dominant HBM traffic of every norm), normalize in the
        # input dtype.  f32 inputs keep the reference's exact math.
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        inv = jax.lax.rsqrt(var + self.eps)
        if dtype == jnp.float32:
            return weight * (x * inv)
        return (weight.astype(dtype) * (x * inv.astype(dtype))).astype(dtype)


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10_000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos | sin] order.

    Matches reference model/nn.py:187-206 (note: cos first).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimeEmbed(nn.Module):
    """Time(+optional position) MLP: linear-SiLU-linear.

    Reference ``TimeStyleSeperateEmbed`` (unet_ours.py:442-476).  With
    ``use_pos`` the output is [time_half | pos_half] concatenated.
    """

    out_channels: int
    use_pos: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray,
                 pos_emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out_chn = self.out_channels // 2 if self.use_pos else self.out_channels
        h = nn.Dense(out_chn, param_dtype=self.param_dtype, name="time_0")(t_emb)
        h = nn.silu(h)
        h = nn.Dense(out_chn, param_dtype=self.param_dtype, name="time_2")(h)
        if self.use_pos:
            assert pos_emb is not None
            p = nn.Dense(out_chn, param_dtype=self.param_dtype, name="pos_0")(pos_emb)
            p = nn.silu(p)
            p = nn.Dense(out_chn, param_dtype=self.param_dtype, name="pos_2")(p)
            h = jnp.concatenate([h, p], axis=-1)
        return h


class Mlp(nn.Module):
    """Transformer MLP: dense -> GELU(tanh) -> dense (timm-Mlp-compatible,
    reference MBAblocks.py:11,461).

    ``quant='int8'`` swaps the denses for int8 MXU matmuls (same param
    names/shapes; ops/quant.py QuantDense) — the packed model's opt-in
    inference mode; off by default everywhere else."""

    hidden_features: int
    out_features: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None
    prequant: bool = False
    static_act: bool = False

    def _dense(self, features: int, name: str):
        if self.quant == "int8":
            from ..ops.quant import QuantDense
            return QuantDense(features=features, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              prequant=self.prequant,
                              static_act=self.static_act, name=name)
        return nn.Dense(features, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = self.out_features or x.shape[-1]
        h = self._dense(self.hidden_features, "fc1")(x)
        h = nn.gelu(h, approximate=True)
        h = self._dense(out, "fc2")(h)
        return h


def modulate(norm: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
             shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation: norm(x) * (1 + scale) + shift (MBAblocks.py:608-614)."""
    return norm(x) * (scale + 1.0) + shift


def conv3d(features: int, kernel: Sequence[int], *,
           use_bias: bool = True,
           zero_init: bool = False,
           dtype: Optional[jnp.dtype] = None,
           param_dtype: jnp.dtype = jnp.float32,
           name: Optional[str] = None) -> nn.Conv:
    """3D conv over (Z, H, W) with SAME-style explicit symmetric padding.

    Kernel (1,3,3) pads (0,1,1); kernel (3,3,3) pads (1,1,1) — matching the
    reference conv_nd usage (unet_ours.py:110-114, MBAblocks.py:131-148).

    ``dtype`` is the COMPUTE dtype (params stay f32): without it flax
    promotes activations to f32 everywhere, doubling HBM traffic.
    """
    pad = [((k - 1) // 2, (k - 1) // 2) for k in kernel]
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(features, kernel_size=tuple(kernel), padding=pad,
                   use_bias=use_bias, kernel_init=init, dtype=dtype,
                   param_dtype=param_dtype, name=name)


class EquiGroupNorm(nn.Module):
    """Sliding-window shift-equivariant GroupNorm (reference model/nn.py:26-86,
    present-but-disabled there; provided for capability parity).

    Instead of whole-image group statistics, each pixel is normalized by the
    mean/var of its group channels over a ``ksize`` x ``ksize`` spatial window
    centred on it (computed via average pooling).  With ``pad == (ksize-1)//2``
    the output has the input's spatial shape and the op commutes with
    translations — useful for seamless patch stitching.

    Input is channels-last ``(..., H, W, C)``; stats are float32.
    """

    num_groups: int
    ksize: Optional[int] = None   # None -> plain GroupNorm semantics
    pad: int = 0
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        cg = c // g
        dtype = x.dtype
        lead = x.shape[:-3]
        h, w = x.shape[-3], x.shape[-2]
        xf = x.astype(jnp.float32).reshape((-1, h, w, g, cg))

        if self.ksize is None:
            mean = xf.mean(axis=(1, 2, 4), keepdims=True)
            var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        else:
            k, p = self.ksize, self.pad
            exl = (k - 1) // 2
            xp = jnp.pad(xf, ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))

            def win_mean(a):
                # mean over (k x k spatial, all group channels), stride 1
                s = jax.lax.reduce_window(
                    a, 0.0, jax.lax.add,
                    window_dimensions=(1, k, k, 1, cg),
                    window_strides=(1, 1, 1, 1, 1),
                    padding="VALID")
                return s / (k * k * cg)

            mean = win_mean(xp)              # (B, H', W', g, 1)
            var = win_mean(xp * xp) - mean * mean
            xc = xp[:, exl:-exl, exl:-exl] if exl else xp
            y = (xc - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + self.eps)

        y = y.reshape(lead + y.shape[1:3] + (c,))
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * weight + bias
        return y.astype(dtype)


def upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample of (B, Z, H, W, C); z untouched.

    (reference blocks.py:363-371, dims=3 branch)
    """
    b, z, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, z, h, 2, w, 2, c))
    return x.reshape(b, z, h * 2, w * 2, c)


def downsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 spatial average-pool of (B, Z, H, W, C); z untouched.

    (reference blocks.py:389-398, stride (1,2,2) avg pool)
    """
    b, z, h, w, c = x.shape
    x = x.reshape(b, z, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(3, 5))
