"""Dynamic int8 quantized convolution for TPU inference.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 peak (394 TOPS vs
197 TFLOPS), and the packed TeraUNet's convolutions are 76.5% of a
generation step at ~100% bf16 MXU utilization (BASELINE.md) — int8 is the
one arithmetic change left that can beat the bf16 FLOP floor on a single
chip.  Microbenchmark evidence: scripts/bench_int8.py (chained-conv
protocol) observes int8 conv throughput above the bf16 peak on the
model's hot shapes.

Scheme (inference-only, opt-in via ``PackedTeraUNet(conf, quant='int8')``):

- **Weights**: symmetric per-output-channel int8, scales from the
  (small) kernel tensor at apply time — params stay in the exact
  reference weight class (f32/bf16), so checkpoints/conversion are
  untouched and quantization is a pure execution-mode choice.
- **Activations**: dynamic symmetric per-tensor int8 (abs-max / 127,
  one reduction — comparable to a norm pass, amortized against a 2x
  conv).  Zero maps to zero, so SAME zero-padding is exact.
- Accumulation in int32, dequantize to f32 with ``s_x * s_w[co]``, add
  bias, cast to the compute dtype.

This is a TPU-side extension (no reference parity to preserve — the
reference has no quantized path); quality is gated by
tests/test_quant.py which bounds the int8-vs-bf16 output error of the
packed model.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def quantize_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8: returns (x_q, scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 for an HWIO kernel:
    returns (w_q, scales (co,))."""
    s = jnp.maximum(
        jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
        .astype(jnp.float32) / 127.0, _EPS)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quant_conv2d(x: jnp.ndarray, w: jnp.ndarray,
                 bias: Optional[jnp.ndarray],
                 padding: Sequence[Tuple[int, int]],
                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 NHWC conv with dynamic activation + per-channel weight quant.

    ``x`` (N,H,W,Ci) any float dtype; ``w`` (kh,kw,Ci,Co); ``bias`` is
    added AFTER dequantization (full precision, possibly pre-tiled by the
    caller).  Returns (N,H,W,Co) in ``out_dtype``.
    """
    xq, sx = quantize_tensor(x)
    wq, sw = quantize_weight(w)
    y = lax.conv_general_dilated(
        xq, wq, (1, 1), list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
