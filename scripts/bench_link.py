"""Host<->device link microbenchmark.

Measures raw H2D / D2H throughput and per-transfer latency for the buffer
sizes the streaming generator actually moves (a padded 2x2-block state
window in bf16 is ~66 MB up, ~52 MB down per visit).  Used to establish
whether the host-streaming ladder point is capped by this host's link or
by software overhead (BASELINE.md streaming notes; VERDICT r2 #3).

Usage: python scripts/bench_link.py [--sizes_mb 1,8,64] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fresh(nbytes: int, rng: np.random.Generator) -> np.ndarray:
    """Incompressible random payload — np.empty pages are mostly zeros,
    which value-caches/compression in the RPC tunnel can elide (the exact
    failure mode this probe exists to rule out; ADVICE r3)."""
    return rng.integers(0, 256, nbytes, np.uint8)


def bench_h2d(nbytes: int, reps: int, dev) -> tuple[float, float]:
    rng = np.random.default_rng(0)
    ts = []
    for i in range(reps + 1):
        host = _fresh(nbytes, rng)  # new random content each rep
        t0 = time.perf_counter()
        arr = jax.device_put(host, dev)
        arr.block_until_ready()
        ts.append(time.perf_counter() - t0)
        del arr
    ts = ts[1:]  # drop warmup
    dt = float(np.median(ts))
    return nbytes / dt / 1e6, dt


def bench_d2h(nbytes: int, reps: int, dev) -> tuple[float, float]:
    rng = np.random.default_rng(1)
    ts = []
    for i in range(reps + 1):
        arr = jax.device_put(_fresh(nbytes, rng), dev)
        arr.block_until_ready()
        t0 = time.perf_counter()
        out = np.asarray(arr)
        ts.append(time.perf_counter() - t0)
        del arr, out
    ts = ts[1:]
    dt = float(np.median(ts))
    return nbytes / dt / 1e6, dt


def bench_duplex(nbytes: int, reps: int, dev) -> dict:
    """Concurrent H2D + D2H from two threads.  If the link (or the RPC
    tunnel in front of it) is full-duplex / multi-stream, wall ~= the
    slower direction; if it serializes, wall ~= the sum.

    A FRESH device array is staged (outside the timed region) every rep:
    jax.Array caches its host copy after the first fetch, so re-reading
    one array would time zero actual D2H from rep 2 on (ADVICE r3 medium).
    """
    import threading
    rng = np.random.default_rng(2)
    walls = []
    for i in range(reps + 1):
        host_up = _fresh(nbytes, rng)
        res = jax.device_put(_fresh(nbytes, rng), dev)
        res.block_until_ready()
        out = {}

        def up():
            a = jax.device_put(host_up, dev)
            a.block_until_ready()
            out["up"] = a

        def down():
            out["down"] = np.asarray(res)

        t0 = time.perf_counter()
        th = [threading.Thread(target=up), threading.Thread(target=down)]
        for x in th:
            x.start()
        for x in th:
            x.join()
        walls.append(time.perf_counter() - t0)
        del out, res
    wall = float(np.median(walls[1:]))
    return {"duplex_wall_s": round(wall, 4),
            "duplex_agg_MBps": round(2 * nbytes / wall / 1e6, 1)}


def bench_compute_overlap(nbytes: int, reps: int, dev) -> dict:
    """Time an H2D issued while a long device matmul chain runs.  If the
    transfer overlaps compute, h2d_during ~= h2d_idle; if the tunnel
    serializes device ops, h2d_during ~= h2d_idle + compute."""
    import functools

    n = 4096

    @functools.partial(jax.jit, static_argnums=1)
    def burn(a, it):
        def body(x, _):
            return jnp.tanh(x @ a), ()
        return jax.lax.scan(body, a, None, length=it)[0]

    a = jax.device_put(np.random.default_rng(0)
                       .standard_normal((n, n), np.float32), dev)
    burn(a, 2).block_until_ready()  # compile
    t0 = time.perf_counter()
    burn(a, 64).block_until_ready()
    compute_s = time.perf_counter() - t0

    rng = np.random.default_rng(3)
    idle, during = [], []
    for i in range(reps):
        host = _fresh(nbytes, rng)
        t0 = time.perf_counter()
        jax.device_put(host, dev).block_until_ready()
        idle.append(time.perf_counter() - t0)
        host = _fresh(nbytes, rng)
        fut = burn(a, 64)              # async dispatch
        t0 = time.perf_counter()
        jax.device_put(host, dev).block_until_ready()
        during.append(time.perf_counter() - t0)
        fut.block_until_ready()
    return {"compute_s": round(compute_s, 3),
            "h2d_idle_s": round(float(np.median(idle)), 4),
            "h2d_during_compute_s": round(float(np.median(during)), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes_mb", default="1,8,64")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--overlap", action="store_true",
                    help="also run the duplex + compute-overlap probes")
    args = ap.parse_args()
    dev = jax.devices()[0]
    for mb in [float(s) for s in args.sizes_mb.split(",") if s]:
        nbytes = int(mb * 1e6)
        up, up_dt = bench_h2d(nbytes, args.reps, dev)
        dn, dn_dt = bench_d2h(nbytes, args.reps, dev)
        rec = {
            "size_mb": mb,
            "h2d_MBps": round(up, 1), "h2d_s": round(up_dt, 4),
            "d2h_MBps": round(dn, 1), "d2h_s": round(dn_dt, 4),
            "device": str(dev),
        }
        if args.overlap:
            rec.update(bench_duplex(nbytes, args.reps, dev))
        print(json.dumps(rec), flush=True)
    if args.overlap:
        print(json.dumps(bench_compute_overlap(int(64e6), args.reps, dev)),
              flush=True)


if __name__ == "__main__":
    main()
