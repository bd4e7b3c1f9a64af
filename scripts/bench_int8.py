"""Microbenchmark: int8 vs bf16 conv throughput on this TPU.

Decides whether an int8 quantized inference mode is worth building: v5e's
MXU runs int8 at 2x the bf16 peak (394 TOPS vs 197 TFLOPS), but only if
XLA actually lowers an int8 `conv_general_dilated` onto the MXU.  The
shapes are the packed TeraUNet's hot convolutions (BASELINE.md: convs are
76.5% of step time at ~100% MXU utilization in bf16 — the only remaining
single-chip speedup with different arithmetic is int8).

Prints one JSON line per shape: bf16 ms, int8 ms, speedup.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

# (N, H, W, Cin, Cout): per-patch stages of the packed flagship model
# (base 64, ch_mult 1/2/4/8, 64^2 patches, ~10 z-groups packed into
# channels); N is a block-major window batch (81 patches x chunk)
SHAPES = [
    (81, 64, 64, 128, 128),
    (81, 32, 32, 256, 256),
    (81, 16, 16, 512, 512),
    (405, 16, 16, 512, 512),
    (81, 8, 8, 1024, 1024),
]


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for (n, h, w, ci, co) in SHAPES:
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 128, (n, h, w, ci)), jnp.int8)
        ki = jnp.asarray(rng.integers(-127, 128, (3, 3, ci, co)), jnp.int8)

        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_bf16(x, k):
            return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                            dimension_numbers=dn)

        @jax.jit
        def conv_int8(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        tb = timed(conv_bf16, x, k)
        ti = timed(conv_int8, xi, ki)
        flops = 2 * n * h * w * ci * co * 9
        print(json.dumps({
            "shape": [n, h, w, ci, co],
            "bf16_ms": round(tb * 1e3, 3),
            "int8_ms": round(ti * 1e3, 3),
            "bf16_tflops": round(flops / tb / 1e12, 1),
            "int8_tops": round(flops / ti / 1e12, 1),
            "speedup": round(tb / ti, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
