"""Profile one tera-generator step on the TPU and print an op-level
self-time breakdown (parsed from the captured xplane via the tensorboard
profile plugin).

Usage:
    python scripts/profile_step.py [--tiles 2] [--chunk 1] [--tile_major]

This is the measurement tool behind the perf notes in BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def build(tiles: int, chunk: int, block_major: bool, packed: bool = False,
          quant=None):
    from tera_mind_tpu.config import prep_config
    from tera_mind_tpu.diffusion.sampler import DiffusionSampler, SamplerConfig
    from tera_mind_tpu.parallel.generator import GeneratorConfig, TeraGenerator

    conf = prep_config("638850", batch=4, size=64, stain="all", srna=4)
    conf.compute_dtype = "bfloat16"
    model = conf.make_model_conf().make_model()
    gconf = GeneratorConfig(tile=256, patch=64, gn_blk=16, snum=4,
                            n_slices=50, stains=2, gdim=500,
                            noise_backend="jax", window_chunk=chunk)
    sampler = DiffusionSampler(conf.make_eval_sampler(T=15).schedule,
                               SamplerConfig(patch_size=64, gn_sz=4))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 64, 64, conf.in_channels))
    rna = jnp.zeros((4, 4, 4, conf.rna_slices * 500))
    params = jax.jit(lambda k: model.init(
        k, x, jnp.zeros((1,), jnp.int32), rna, 2, 2))(rng)
    if packed:
        from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                      pack_unet_params)
        params = pack_unet_params(
            jax.tree.map(lambda p: np.asarray(p, np.float32), params),
            conf.make_model_conf())
        qa = bool(quant) and os.environ.get("BENCH_QUANT_ATTN",
                                            "1") == "1"
        if quant in ("int8", "int8_static"):
            from tera_mind_tpu.ops.quant import (bake_act_scales,
                                                 prequantize_params,
                                                 _path_names)
            params = prequantize_params(
                jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16),
                             params), attn=qa)
            if quant == "int8_static":
                # profiling only needs the static PROGRAM, not real
                # calibration — bake unit scales (amax=127 -> a_scale=1)
                accum = {("calib",) + _path_names(k)[1:-1] + ("a_max",):
                         127.0
                         for k, _ in jax.tree_util.tree_leaves_with_path(
                             params)
                         if getattr(k[-1], "key", None) == "kernel_q"}
                params = bake_act_scales(params, accum)
        model = PackedTeraUNet(conf.make_model_conf(),
                               quant="int8" if quant else None,
                               prequant=bool(quant),
                               static_act=quant == "int8_static",
                               quant_attn=qa,
                               packed_attn=os.environ.get(
                                   "BENCH_PACKED_ATTN", "0") == "1")
    # floats -> bf16; keep pre-quantized int8 kernels / f32 scales
    from tera_mind_tpu.ops.quant import to_inference_dtype
    params = to_inference_dtype(params)

    def model_fn(p, xp, tm, rp, p1, p2):
        return model.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    gen = TeraGenerator(sampler, model_fn, gconf, params=params)
    grng = np.random.default_rng(0)
    gene = (grng.random((tiles, tiles, gconf.gsz, gconf.gsz, gconf.z_pad,
                         gconf.gdim)) < 0.01).astype(np.uint8)
    state = jnp.asarray(gen.init_state(tiles, tiles))
    genej = jnp.asarray(gene)
    step = gen.compile_step(tiles, tiles, block_major=block_major)
    return step, state, genej


def op_breakdown(logdir: str, top: int = 25) -> None:
    """Parse the newest xplane.pb and print per-op self time."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    import collections

    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"),
                   key=os.path.getmtime)
    assert paths, f"no xplane under {logdir}"
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    tables = json.loads(data) if isinstance(data, (str, bytes)) else data
    tab = tables[0] if isinstance(tables, list) else tables
    cols = [c["id"] for c in tab["cols"]]
    i_dev = cols.index("host_or_device")
    i_type = cols.index("type")
    i_name = cols.index("operation")
    i_self = cols.index("total_self_time")
    by_type = collections.Counter()
    items = []
    for r in tab["rows"]:
        c = [x["v"] if x else None for x in r["c"]]
        if c[i_dev] != "Device":
            continue
        by_type[c[i_type]] += c[i_self]
        items.append((float(c[i_self]), c[i_type], c[i_name]))
    tot = sum(by_type.values())
    print("== device self time by op type ==")
    for t, us in by_type.most_common(15):
        print(f"{us/1e3:9.2f} ms {100*us/tot:6.2f}%  {t}")
    print(f"device total: {tot/1e3:.1f} ms")
    # scope attribution: the framework op name carries the jax name stack
    # (flax module path), so substring matching groups time by subsystem —
    # used to size the rna-tower hoisting opportunity (it is timestep-
    # invariant and recomputed every step)
    scopes = ("rna_tower", "gene_attn", "_attn/", "time_embed")
    by_scope = collections.Counter()
    for us, _t, n in items:
        for s in scopes:
            if s in n:
                by_scope[s] += us
                break
    print("== device self time by name scope ==")
    for s, us in by_scope.most_common():
        print(f"{us/1e3:9.2f} ms {100*us/tot:6.2f}%  {s}")
    print("== top ops ==")
    items.sort(reverse=True)
    for us, t, n in items[:top]:
        print(f"{us/1e3:9.2f} ms  [{t}] {n[:84]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--tile_major", action="store_true")
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--quant", default=None,
                    choices=(None, "int8", "int8_static"))
    ap.add_argument("--logdir", default="/tmp/tmt_profile")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    step, state, gene = build(args.tiles, args.chunk,
                              not args.tile_major, packed=args.packed,
                              quant=args.quant)
    # warmup/compile
    out = step(state, gene, jnp.int32(14))
    jax.block_until_ready(out)

    t0 = time.time()
    jax.profiler.start_trace(args.logdir)
    out = step(out, gene, jnp.int32(13))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"step wall: {time.time()-t0:.3f}s "
          f"({args.tiles}x{args.tiles} tiles)")
    op_breakdown(args.logdir, args.top)


if __name__ == "__main__":
    main()
