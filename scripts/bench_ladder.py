"""Grid-size scaling ladder for the generation benchmark.

Runs bench.py at several in-HBM grid sizes plus a whole-brain-shaped
host-streaming run, one JSON line each.  Anchors the v5e-64 whole-brain
extrapolation in measured large-grid rates (BASELINE.md ladder).

Big grids use fewer DDIM steps (per-step cost is constant; bench.py
normalizes to the full-15-step rate).  Each NEW grid shape compiles its
own program — expect minutes of compile per point on a cold cache.

Usage: python scripts/bench_ladder.py [--points 2,4,8,16] [--stream 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

STEPS = {2: 15, 4: 15, 8: 5, 16: 3}


def run_inhbm(tiles: int, block_major: bool = True,
              quant: str = "") -> None:
    env = dict(os.environ)
    env.update({"BENCH_TILES": str(tiles),
                "BENCH_STEPS": str(STEPS.get(tiles, 3)),
                "BENCH_BLOCK_MAJOR": "1" if block_major else "0",
                # measure inline in THIS subprocess (bench.py without
                # BENCH_CHILD orchestrates its own children + quant lane)
                "BENCH_CHILD": "1"})
    # default the in-HBM points to the auto memory plan (window_chunk=-1:
    # strip-major fallback instead of OOM at 8x8+, generator.auto_plan)
    env.setdefault("BENCH_WINDOW_CHUNK", "-1")
    if quant:
        env["BENCH_QUANT"] = quant
    out = subprocess.run([sys.executable, str(ROOT / "bench.py")], env=env,
                         capture_output=True, text=True, cwd=ROOT)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not line:
        if block_major and "RESOURCE_EXHAUSTED" in out.stderr:
            # grid-wide patch batch exceeds HBM (e.g. 8x8 = 1089 patches
            # per z-window) — the tile-major path bounds the batch at one
            # tile's window chunk, so large grids still get an anchor
            print(json.dumps({"grid": f"{tiles}x{tiles}",
                              "mode": "in-hbm-block-major",
                              "error": "RESOURCE_EXHAUSTED"}), flush=True)
            run_inhbm(tiles, block_major=False, quant=quant)
            return
        print(json.dumps({"grid": f"{tiles}x{tiles}", "error":
                          out.stderr[-300:]}), flush=True)
        return
    rec = json.loads(line[-1])
    rec["mode"] = "in-hbm" if block_major else "in-hbm-tile-major"
    if quant:
        rec["quant"] = quant
    print(json.dumps(rec), flush=True)


def run_stream(tiles: int, steps: int = 3, block: int = 2,
               quant: str = "") -> None:
    """Whole-brain-shaped run: host-resident state, provider-fed genes,
    block-streamed through the chip (parallel/streaming.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.cache/jax")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from tera_mind_tpu.config import prep_config
    from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,
                                                 SamplerConfig)
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.parallel.generator import (GeneratorConfig,
                                                  TeraGenerator)
    from tera_mind_tpu.parallel.streaming import (StreamConfig,
                                                  StreamingGenerator)

    conf = prep_config("638850", batch=4, size=64, stain="all", srna=4)
    conf.compute_dtype = "bfloat16"
    model5 = conf.make_model_conf().make_model()
    # window_chunk=5: 5 z-windows x 81 block patches = 405 patches/call —
    # 5x fewer dispatches than chunk=1 without the 2025-patch activation
    # spike of chunk=0 (which RESOURCE_EXHAUSTs like the 8x8 block-major)
    gconf = GeneratorConfig(tile=256, patch=64, gn_blk=16, snum=4,
                            n_slices=50, stains=2, gdim=500,
                            noise_backend="jax",
                            window_chunk=int(os.environ.get(
                                "STREAM_WINDOW_CHUNK", "5")))
    sched = conf.make_eval_sampler(T=steps).schedule
    sampler = DiffusionSampler(sched, SamplerConfig(patch_size=64, gn_sz=4))

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 64, 64, conf.in_channels))
    rna = jnp.zeros((4, 4, 4, conf.rna_slices * 500))
    params = jax.jit(lambda k: model5.init(
        k, x, jnp.zeros((1,), jnp.int32), rna, 2, 2))(rng)
    params = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params),
        conf.make_model_conf())
    params = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), params)
    qa = bool(quant) and os.environ.get("BENCH_QUANT_ATTN", "1") == "1"
    if quant:
        from tera_mind_tpu.ops.quant import prequantize_params
        params = prequantize_params(params, attn=qa)
    model = PackedTeraUNet(conf.make_model_conf(),
                           quant="int8" if quant else None,
                           prequant=bool(quant), quant_attn=qa)

    def model_fn(p, xp, tm, rp, p1, p2):
        return model.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    gen = TeraGenerator(sampler, model_fn, gconf, params=params)

    def provider(r, c):
        rr = np.random.default_rng(100003 * r + c)
        return (rr.random((gconf.gsz, gconf.gsz, gconf.z_pad, gconf.gdim))
                < 0.01).astype(np.uint8)

    if quant == "int8_static":
        # calibrate static activation scales on one block-sized grid (the
        # same one-time dynamic-int8 chain the bench/CLI paths run), then
        # swap in the static model — the streamed windows are block-sized,
        # so the calibration grid matches the deployed window shape
        from tera_mind_tpu.ops.quant import calibrate_generator
        cgene = np.stack([np.stack([provider(r, c) for c in range(block)])
                          for r in range(block)])
        params = calibrate_generator(gen, model, params, cgene, steps=steps)
        model = PackedTeraUNet(conf.make_model_conf(), quant="int8",
                               prequant=True, static_act=True,
                               quant_attn=qa)
        gen = TeraGenerator(sampler, model_fn, gconf, params=params)

    tdt = os.environ.get("STREAM_TRANSFER_DTYPE", "bfloat16")
    spw = int(os.environ.get("STREAM_K", "1"))  # temporal halo blocking
    sgen = StreamingGenerator(gen, StreamConfig(
        block_rows=block, block_cols=block, progress=False,
        block_major=True, gene_cache_windows=4,
        transfer_dtype=tdt, steps_per_window=spw,
        pipeline=os.environ.get("STREAM_PIPELINE", "1") == "1",
        inflight=int(os.environ.get("STREAM_INFLIGHT", "3")),
        gene_device_cache_gb=float(os.environ.get("STREAM_GENE_GB", "4"))))

    # warm-up run (compile) on a block-sized grid
    sgen.run(block, block, provider, row0=1, col0=1)

    # repeat discipline (VERDICT r2 #4): streaming runs on the tunneled
    # host are noisy — report the median of STREAM_REPEATS sweeps
    reps = int(os.environ.get("STREAM_REPEATS", "1"))
    times = []
    for i in range(reps):
        # row0 varies per repeat: different LCG seeds -> different x_T, so
        # the axon value-keyed execution cache cannot replay a prior sweep
        t0 = time.time()
        sgen.run(tiles, tiles, provider, row0=1 + i, col0=1)
        times.append(time.time() - t0)
    dt = float(np.median(times))
    rate = tiles * tiles / (dt * 15.0 / steps)
    print(json.dumps({
        "metric": "256x256x100ch tiles/sec/chip, full 15-step DDIM",
        "value": round(rate, 5), "unit": "tiles/s/chip",
        "grid": f"{tiles}x{tiles}", "mode": f"stream-{block}x{block}",
        **({"quant": quant} if quant else {}),
        **({"steps_per_window": spw} if spw > 1 else {}),
        "steps": steps,
        "transfer_dtype": tdt,
        "window_chunk": gconf.window_chunk,
        "vs_baseline": round(rate / (118404 / (604800.0 * 8)), 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="2,4,8,16")
    ap.add_argument("--stream", type=int, default=16)
    ap.add_argument("--stream_steps", type=int, default=3)
    ap.add_argument("--stream_block", type=int, default=2)
    ap.add_argument("--skip_inhbm", action="store_true")
    ap.add_argument("--quant", default="",
                    choices=("", "int8", "int8_static"))
    args = ap.parse_args()
    if not args.skip_inhbm:
        for tiles in [int(t) for t in args.points.split(",") if t]:
            run_inhbm(tiles, quant=args.quant)
    if args.stream:
        run_stream(args.stream, steps=args.stream_steps,
                   block=args.stream_block, quant=args.quant)


if __name__ == "__main__":
    main()
