"""Pallas fused RMSNorm kernel (forward).

Profiling the tera-step showed the RMSNorm stat+apply fusions are the
largest op category (~25% of device time) and run far below HBM bandwidth
under XLA's chosen layouts.  This kernel streams row blocks through VMEM:
one read of x (bf16), an f32 row reduction, and one write of the
normalized product — nothing else touches HBM.

Opt-in via TMT_PALLAS_NORM=1 (models/nn.py RMSNorm).  Backward uses the
standard XLA gradient (training is not the hot path for this kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:]                                    # (R, C)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = x * inv.astype(x.dtype) * w_ref[:].astype(x.dtype)
    o_ref[:] = y.astype(o_ref.dtype)


def _rows_per_block(n: int, c: int, budget: int = 512 * 1024) -> int:
    r = max(1, budget // max(c * 2, 1))
    # largest power of two <= r that divides n
    r = 1 << (r.bit_length() - 1)
    while r > 1 and n % r:
        r //= 2
    return r


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def rmsnorm_fused(x: jnp.ndarray, weight: jnp.ndarray,
                  eps: float = 1e-6) -> jnp.ndarray:
    """y = x * rsqrt(mean(x^2, -1) + eps) * weight, stats in f32.

    x: (..., C); weight: (C,).  Falls back to plain XLA math when the
    row count doesn't block cleanly.
    """
    c = x.shape[-1]
    lead = x.shape[:-1]
    n = 1
    for d in lead:
        n *= d
    r = _rows_per_block(n, c)
    # sublane blocks need >= 8 rows; odd row counts (e.g. gene-token norms)
    # fall back to the XLA path
    if n == 0 or n % r or r < 8:
        return _rmsnorm_xla(x, weight, eps)
    x2 = x.reshape(n, c)
    out = pl.pallas_call(
        partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c,), lambda i: (0,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c, bytes_accessed=4 * n * c,
            transcendentals=n),
    )(x2, weight)
    return out.reshape(*lead, c)


def _rmsnorm_xla(x, weight, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    if x.dtype == jnp.float32:
        return weight * (x * inv)
    return (weight.astype(x.dtype) * (x * inv.astype(x.dtype))
            ).astype(x.dtype)


def _fwd(x, weight, eps):
    return rmsnorm_fused(x, weight, eps), (x, weight)


def _bwd(eps, res, g):
    """y_i = w_i x_i inv, inv = (mean(x^2)+eps)^{-1/2}:
    dx = inv*(g.w) - inv^3 * x * mean((g.w)*x, -1);  dw = sum g * x * inv."""
    x, weight = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    wf = weight.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    gw = gf * wf
    m = jnp.mean(gw * xf, axis=-1, keepdims=True)
    dx = inv * gw - (inv ** 3) * xf * m
    dw = jnp.sum(gf * xf * inv, axis=tuple(range(x.ndim - 1)))
    return dx.astype(x.dtype), dw.astype(weight.dtype)


rmsnorm_fused.defvjp(_fwd, _bwd)
