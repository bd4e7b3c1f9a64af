"""Microbenchmark: int8 vs bf16 conv throughput on this TPU.

Justifies the int8 quantized inference mode (ops/quant.py,
``PackedTeraUNet(conf, quant='int8')``): v5e's MXU runs int8 at 2x the
bf16 peak (394 TOPS vs 197 TFLOPS).  End-to-end result: bench.py with
``BENCH_QUANT=int8`` measures 0.203 tiles/s vs 0.159 exact (+27%).

Timing protocol (this environment defers execution until result values
are FETCHED, and the remote-execution queue adds seconds of jitter):
chained fori_loop convs inside one jit, two chain lengths (30 / 1530),
median of 3 fresh-input trials each, per-conv time = slope between the
two medians.  Single-shot or same-input timings are garbage here.

Prints one JSON line per shape: bf16 ms/conv, int8 ms/conv, speedup.
"""

import functools
import json
import os
import statistics
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

# (N, H, W, C): per-patch stages of the packed flagship model (base 64,
# ch_mult 1/2/4/8, 64^2 patches, z-groups packed into channels); N is a
# block-major window batch.  Cin == Cout so the conv chains.
SHAPES = [
    (81, 64, 64, 128),
    (81, 32, 32, 256),
    (405, 16, 16, 512),
]
LO, HI = 30, 1530


def run(n, h, w, c):
    dn = lax.conv_dimension_numbers((n, h, w, c), (3, 3, c, c),
                                    ("NHWC", "HWIO", "NHWC"))

    @functools.partial(jax.jit, static_argnums=2)
    def chain_bf16(x, k, iters):
        def body(_, x):
            y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                         dimension_numbers=dn)
            return (y * jnp.bfloat16(0.05)).astype(jnp.bfloat16)
        return lax.fori_loop(0, iters, body, x)

    @functools.partial(jax.jit, static_argnums=2)
    def chain_int8(x, k, iters):
        def body(_, x):
            y = lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.clip(y >> 10, -127, 127).astype(jnp.int8)
        return lax.fori_loop(0, iters, body, x)

    def measure(fn, mk, k):
        med = {}
        for iters in (LO, HI):
            np.asarray(fn(mk(0), k, iters)[0, 0, 0, :2])  # compile+warm
            ts = []
            for tr in (1, 2, 3):
                t0 = time.time()
                np.asarray(fn(mk(tr), k, iters)[0, 0, 0, :2])
                ts.append(time.time() - t0)
            med[iters] = statistics.median(ts)
        return (med[HI] - med[LO]) / (HI - LO)

    r = np.random.default_rng(0)
    k = jnp.asarray(r.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
    ki = jnp.asarray(r.integers(-127, 128, (3, 3, c, c)), jnp.int8)

    def mk_bf16(i):
        rr = np.random.default_rng(100 + i)
        return jnp.asarray(rr.standard_normal((n, h, w, c)) * 0.1,
                           jnp.bfloat16)

    def mk_int8(i):
        rr = np.random.default_rng(200 + i)
        return jnp.asarray(rr.integers(-127, 128, (n, h, w, c)), jnp.int8)

    tb = measure(chain_bf16, mk_bf16, k)
    ti = measure(chain_int8, mk_int8, ki)
    fl = 2 * n * h * w * c * c * 9
    print(json.dumps({
        "shape": [n, h, w, c],
        "bf16_ms": round(tb * 1e3, 3),
        "int8_ms": round(ti * 1e3, 3),
        "bf16_tflops": round(fl / tb / 1e12, 1),
        "int8_tops": round(fl / ti / 1e12, 1),
        "speedup": round(tb / ti, 2),
    }), flush=True)


def main():
    for s in SHAPES:
        run(*s)


if __name__ == "__main__":
    main()
