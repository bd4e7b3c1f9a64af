"""Attention blocks: DiT-style adaLN image->gene cross-attention with 2x2
spatial windowing, and the symmetric gene-gene attention block.

Parity reference: CTPLab/Tera-MIND model/MBAblocks.py:428-614.

Scaling quirk preserved: the reference calls torch SDPA with ``q * scale``
(MBAblocks.py:571-577) on top of SDPA's built-in 1/sqrt(d), so attention
logits are ``(q . k) / d`` — NOT ``/ sqrt(d)``.  The non-flash path makes
this explicit with ``q * scale**2`` (MBAblocks.py:580-586); we implement
that form directly.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .nn import Mlp, RMSNorm, modulate


def _default_attn_backend() -> str:
    """'pallas' -> fused VMEM-resident kernel (ops/attention_kernel.py);
    'xla' -> einsum path (XLA fuses it).  Opt in via TMT_PALLAS_ATTN=1."""
    return "pallas" if os.environ.get("TMT_PALLAS_ATTN") == "1" else "xla"


def _window_fold(t: jnp.ndarray, z: int, n_win: int,
                 order: str = "zhw") -> jnp.ndarray:
    """(B, heads, n, d) -> (B, heads*n_win^2, z*(h/n)*(w/n), d).

    Regroups tokens into n_win x n_win spatial windows folded into the head
    axis, head-major ordering (reference MBAblocks.py:558-565).  ``order``
    is the incoming token order: 'zhw' (5D layout, token = (zi*h + hr)*w
    + wc) or 'hwz' (packed layout, token = (hr*w + wc)*z + zi — a free
    reshape of the z-major packed channels).  Attention is permutation-
    equivariant over tokens, so either order yields the same outputs (in
    its own order) up to float reassociation in the softmax/value sums.
    """
    b, nh, n, d = t.shape
    s = int(round((n // z) ** 0.5))
    hw = s // n_win
    if order == "hwz":
        t = t.reshape(b, nh, n_win, hw, n_win, hw, z, d)
        t = t.transpose(0, 1, 2, 4, 3, 5, 6, 7)  # b nh n_h n_w h w z d
    else:
        t = t.reshape(b, nh, z, n_win, hw, n_win, hw, d)
        t = t.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # b nh n_h n_w z h w d
    return t.reshape(b, nh * n_win * n_win, z * hw * hw, d)


def _window_unfold(t: jnp.ndarray, z: int, n_win: int,
                   num_heads: int, order: str = "zhw") -> jnp.ndarray:
    """Inverse of :func:`_window_fold`."""
    b, nhw, n, d = t.shape
    hw = int(round((n // z) ** 0.5))
    if order == "hwz":
        t = t.reshape(b, num_heads, n_win, n_win, hw, hw, z, d)
        t = t.transpose(0, 1, 2, 4, 3, 5, 6, 7)  # b nh n_h h n_w w z d
        return t.reshape(b, num_heads, (n_win * hw) ** 2 * z, d)
    t = t.reshape(b, num_heads, n_win, n_win, z, hw, hw, d)
    t = t.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # b nh z n_h h n_w w d
    return t.reshape(b, num_heads, z * (n_win * hw) ** 2, d)


class CrossAttention(nn.Module):
    """Multi-head (optionally windowed) cross-attention, q from x, k/v from y.

    When ``y is None`` this is self-attention.  Logits use the reference's
    1/d scaling (see module docstring).  q and k are RMS-normalized per head
    (separate q/k norms, MBAblocks.py:541-542, 568-569).
    """

    dim: int
    num_heads: int = 1
    n_win: Optional[int] = None  # spatial window grid per side (e.g. 2)
    dtype: jnp.dtype = jnp.float32
    backend: Optional[str] = None  # 'xla' | 'pallas' (None -> env default)
    quant: Optional[str] = None  # 'int8' projections (packed inference)
    prequant: bool = False
    static_act: bool = False
    token_order: str = "zhw"     # see _window_fold

    def _dense(self, name: str):
        if self.quant == "int8":
            from ..ops.quant import QuantDense
            return QuantDense(features=self.dim, dtype=self.dtype,
                              prequant=self.prequant,
                              static_act=self.static_act, name=name)
        return nn.Dense(self.dim, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Optional[jnp.ndarray],
                 z_size: int) -> jnp.ndarray:
        b, n, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        src = x if y is None else y
        q = self._dense("q")(x)
        k = self._dense("k")(src)
        v = self._dense("v")(src)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        if self.n_win is not None:
            q = _window_fold(q, z_size, self.n_win, self.token_order)
            k = _window_fold(k, z_size, self.n_win, self.token_order)
            v = _window_fold(v, z_size, self.n_win, self.token_order)
        q = RMSNorm(name="q_norm")(q)
        k = RMSNorm(name="k_norm")(k)

        backend = self.backend or _default_attn_backend()
        if backend == "pallas":
            from ..ops.attention_kernel import fused_attention
            bh, nn_, dd = q.shape[0] * q.shape[1], q.shape[2], q.shape[3]
            out = fused_attention(q.reshape(bh, nn_, dd),
                                  k.reshape(bh, nn_, dd),
                                  v.reshape(bh, nn_, dd), 1.0 / hd)
            out = out.reshape(q.shape)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32) / hd
            attn = nn.softmax(logits.astype(jnp.float32),
                              axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        if self.n_win is not None:
            out = _window_unfold(out, z_size, self.n_win, nh,
                                 self.token_order)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return self._dense("proj")(out)


class DiTBlock(nn.Module):
    """adaLN-zero DiT block with 7-way modulation and gene cross-attention.

    ``cond`` supplies, per token, [shift/scale/gate]_msa, the cross-attention
    context ``crss_cnd``, and [shift/scale/gate]_mlp via one SiLU+Dense
    (reference MBAblocks.py:463-489).  Attention queries are image tokens,
    keys/values the modulated gene context, within 2x2 spatial windows.
    """

    hidden_size: int
    num_heads: int = 1
    n_win: Optional[int] = 2
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None  # 'int8' adaLN/attention/MLP denses
    prequant: bool = False
    static_act: bool = False
    packed_tokens: bool = False  # x/cond are z-major packed (B, H, W, Z*C);
                                 # tokens flatten in (h, w, z) order — a free
                                 # reshape, no 5D pack/unpack transposes.
                                 # Same params, outputs equal up to float
                                 # reassociation (tests/test_packed.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray,
                 z_size: Optional[int] = None) -> jnp.ndarray:
        c = self.hidden_size
        if self.packed_tokens:
            # (B, H, W, Z*C) z-major packed: (h, w, z) token flattening is
            # a pure reshape (channel idx = zi*C + cc), so no transposes
            b, h, w, zc = x.shape
            z = z_size
            assert z is not None and zc == z * c, (x.shape, z, c)
            xt = x.reshape(b, h * w * z, c)
            ct = cond.reshape(b, h * w * z, cond.shape[-1] // z)
            order = "hwz"
        else:
            b, z, h, w, _ = x.shape
            assert x.shape[-1] == c
            xt = x.reshape(b, z * h * w, c)
            ct = cond.reshape(b, z * h * w, cond.shape[-1])
            order = "zhw"

        if self.quant == "int8":
            from ..ops.quant import QuantDense
            ada = QuantDense(features=7 * c, dtype=self.dtype,
                             prequant=self.prequant,
                             static_act=self.static_act, name="adaLN")
        else:
            ada = nn.Dense(7 * c, dtype=self.dtype, name="adaLN")
        mod = ada(nn.silu(ct))
        (shift_msa, scale_msa, gate_msa, crss_cnd,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 7, axis=-1)

        norm1 = RMSNorm(name="norm1")
        norm2 = RMSNorm(name="norm2")
        attn = CrossAttention(dim=c, num_heads=self.num_heads,
                              n_win=self.n_win, dtype=self.dtype,
                              quant=self.quant, prequant=self.prequant,
                              static_act=self.static_act,
                              token_order=order, name="attn")
        xt = xt + gate_msa * attn(
            modulate(norm1, xt, shift_msa, scale_msa), crss_cnd, z)
        xt = xt + gate_mlp * Mlp(int(c * self.mlp_ratio),
                                 dtype=self.dtype, quant=self.quant,
                                 prequant=self.prequant,
                                 static_act=self.static_act, name="mlp")(
            modulate(norm2, xt, shift_mlp, scale_mlp))
        if self.packed_tokens:
            return xt.reshape(b, h, w, zc)
        return xt.reshape(b, z, h, w, c)


# z-collapse conv kernel size per RNA z depth (reference MBAblocks.py:472).
DOWN_Z_KERNEL = {1: 1, 4: 3, 8: 5, 16: 9}


class GeneGeneBlock(nn.Module):
    """Symmetric gene-gene self-attention over gene tokens + z-collapse conv.

    Input (B, Z, H, W, G): tokens are the G genes, each with a
    D = Z*H*W-dimensional spatial feature (reference MBAblocks.py:493-514).
    k IS q (shared projection and shared q-norm, MBAblocks.py:553, 569), so
    attention logits are symmetric: ``softmax(qn @ qn.T / D)``.  The MLP
    output *replaces* (not residual-adds) the attention output
    (MBAblocks.py:499-501).  ``down_z`` collapses z with a valid conv.

    Returns (features, attn) where attn is the (B, heads, G, G) matrix
    (None unless ``return_attn``) — the ``--calc_attn`` pathway-analysis hook
    (reference unet_attn.py:137-173).
    """

    hidden_size: int  # = Z*H*W of the gene grid
    z_size: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rna: jnp.ndarray, *, return_attn: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        b, z, h, w, g = rna.shape
        d = z * h * w
        assert d == self.hidden_size, (d, self.hidden_size)
        # tokens = genes, features = flattened spatial grid
        x = rna.reshape(b, d, g).transpose(0, 2, 1)  # (B, G, D)

        q = nn.Dense(d, dtype=self.dtype, name="q")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v")(x)
        qn = RMSNorm(name="q_norm")(q[:, None])  # heads=1: (B, 1, G, D)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qn, qn,
                            preferred_element_type=jnp.float32) / d
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype),
                         v[:, None])[:, 0]
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)

        out = RMSNorm(name="norm2")(out)
        out = Mlp(int(d * self.mlp_ratio), dtype=self.dtype,
                  name="mlp")(out)

        out = out.transpose(0, 2, 1).reshape(b, z, h, w, g)
        ker = DOWN_Z_KERNEL[self.z_size]
        out = nn.Conv(g, kernel_size=(ker, 3, 3),
                      padding=[(0, 0), (1, 1), (1, 1)], dtype=self.dtype,
                      name="down_z")(out)
        return out, (attn if return_attn else None)
