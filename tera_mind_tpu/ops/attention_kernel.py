"""Pallas TPU fused attention kernel.

Replaces torch SDPA/FlashAttention for this model's attention shapes
(reference MBAblocks.py:571-577): after 2x2 window folding, sequence
lengths are tiny (N = z * (patch/8)^2 <= 512) while batch*heads is large
(25 tiles x windows x heads per tera-step).  A single-block kernel per
(batch*head) that keeps q, k, v, the NxN logits and the softmax entirely
in VMEM is the speed-of-light design at these shapes: one HBM read of
q/k/v, one HBM write of out, zero materialization of the attention matrix
in HBM.  (True streaming flash attention is unnecessary at N<=512; the
logits tile fits VMEM with room to spare.)

The model's scaling quirk (logits = q.k / d, NOT /sqrt(d)) is passed in as
``scale`` by the caller.

Backward: custom VJP with the standard attention gradient computed in
plain XLA (f32).  The fused kernel is the inference hot path (the
tera-scale generator); training gradients flow through the XLA fallback
math, which XLA fuses well at these sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                                   # (N, D)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_xla(q, k, v, scale):
    logits = jnp.einsum("bnd,bmd->bnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p.astype(v.dtype), v)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Fused softmax(q k^T * scale) v.

    q, k, v: (B, N, D) — fold batch/head/window dims into B beforehand.
    Returns (B, N, D) in q's dtype.
    """
    b, n, d = q.shape
    return pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * n * d * 2,
            bytes_accessed=4 * b * n * d * 4,
            transcendentals=b * n * n),
    )(q, k, v)


def _fwd(q, k, v, scale):
    return fused_attention(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    logits = jnp.einsum("bnd,bmd->bnm", qf, kf) * scale
    p = jax.nn.softmax(logits, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bnm,bnd->bmd", p, gf)
    dp = jnp.einsum("bnd,bmd->bnm", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bnm,bmd->bnd", ds, kf) * scale
    dk = jnp.einsum("bnm,bnd->bmd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)
