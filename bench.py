"""Benchmark: 256^2 tiles/sec/chip for full 15-step DDIM whole-brain-style
generation (the north-star metric, BASELINE.md).

Baseline: the reference generates the 286x414-tile brain (118,404 tiles) in
"roughly one week" on an 8-GPU A100 DGX (README.md:72-77) ->
118404 / (604800 s * 8 GPU) ~= 0.02447 tiles/sec/GPU.

Prints JSON lines {metric, value, unit, vs_baseline}; the LAST line is the
record of note.  Structure (VERDICT r3 ask #1 — the headline must always
land within the driver budget):

  * the PARENT process never touches the TPU.  It launches the exact-bf16
    measurement as a CHILD subprocess under a bounded timeout and prints
    that child's JSON record IMMEDIATELY when it returns;
  * only then, and only if wall-clock budget remains, it runs the OPTIONAL
    int8_static deployment-mode child under a ~600 s timeout and re-prints
    the combined (richer) record as the final line.  A hang or slow compile
    in the quant lane can no longer take the bf16 headline down with it
    (round 3 recorded rc=124 / parsed:null exactly that way).

Only one process can hold the TPU, so children run strictly sequentially
and the parent stays off the device.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

REF_TILES_PER_SEC_PER_GPU = 118404 / (604800.0 * 8)

# Overall wall-clock guard: past this deadline the parent stops launching
# optional children.  The bf16 child gets the remaining budget (capped);
# if it fails fast (e.g. flaky TPU tunnel) it is retried once with
# repeats=1 so *some* measured record lands.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE", "1500"))
QUANT_TIMEOUT_S = float(os.environ.get("BENCH_QUANT_TIMEOUT", "600"))


def _run_child(env_extra: dict, timeout: float):
    """Run this file as a measurement child; return (record|None, stderr)."""
    env = dict(os.environ, BENCH_CHILD="1", **env_extra)
    try:
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=max(30.0, timeout))
    except subprocess.TimeoutExpired as e:
        return None, f"timeout after {e.timeout:.0f}s"
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        return None, (out.stderr or "")[-2000:]
    try:
        return json.loads(lines[-1]), ""
    except Exception as e:
        return None, f"unparseable child stdout: {e}"


def orchestrate():
    t0 = time.time()

    def remaining():
        return DEADLINE_S - (time.time() - t0)

    # 1) exact-bf16 headline FIRST.  Budget: everything up to the deadline
    #    minus a margin for the (optional) quant lane; never less than 300s.
    bf16_budget = max(300.0, remaining() - (QUANT_TIMEOUT_S + 60.0))
    rec, err = _run_child({}, bf16_budget)
    if rec is None and remaining() > 120:
        # one retry, minimal repeats — a cold/flaky first backend init is
        # the dominant observed failure mode (BENCH_r03 tail)
        rec, err2 = _run_child({"BENCH_REPEATS": "1"},
                               max(120.0, remaining() - 30.0))
        err = err or err2
    if rec is None:
        # absolute last resort: an honest FAILURE record — value null (not
        # 0.0, which numeric consumers could ingest as a measured rate) and
        # a nonzero exit so callers cannot mistake it for a measurement
        # (ADVICE r4)
        rec = {"metric": "256x256x100ch tiles/sec/chip, full 15-step DDIM",
               "value": None, "unit": "tiles/s/chip", "vs_baseline": None,
               "error": f"bf16 measurement failed: {err[-500:]}"}
        print(json.dumps(rec), flush=True)
        sys.exit(1)
    print(json.dumps(rec), flush=True)  # headline has landed

    # 2) optional int8_static deployment mode (first-class reported mode,
    #    BASELINE.md quant table; quality gates in tests/test_quant.py).
    #    The headline is already printed, so the quant lane may use ALL
    #    remaining deadline budget — a timeout here costs nothing.
    if os.environ.get("BENCH_REPORT_QUANT", "1") != "1":
        return
    if remaining() < QUANT_TIMEOUT_S + 30.0:
        return  # out of budget — headline already printed
    qrec, _ = _run_child({"BENCH_QUANT": "int8_static"},
                         remaining() - 30.0)
    if qrec is not None and qrec.get("value"):
        rec = dict(rec, int8_static=qrec["value"],
                   int8_static_vs_baseline=qrec["vs_baseline"])
        print(json.dumps(rec), flush=True)  # richer record last


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from tera_mind_tpu.config import prep_config
    from tera_mind_tpu.diffusion.sampler import DiffusionSampler, SamplerConfig
    from tera_mind_tpu.parallel.generator import GeneratorConfig, TeraGenerator

    rows = cols = int(os.environ.get("BENCH_TILES", "2"))
    steps = int(os.environ.get("BENCH_STEPS", "15"))

    conf = prep_config("638850", batch=4, size=64, stain="all", srna=4)
    conf.compute_dtype = "bfloat16"
    model = conf.make_model_conf().make_model()

    block_major = os.environ.get("BENCH_BLOCK_MAJOR", "1") == "1"
    # window_chunk bounds activation memory per model call: a chunk is
    # (windows x patches) UNet batch — block-major batches the whole block
    # per window, so it chunks finer by default
    wc_env = os.environ.get("BENCH_WINDOW_CHUNK")
    gconf = GeneratorConfig(tile=256, patch=64, gn_blk=16, snum=4,
                            n_slices=50, stains=2, gdim=500,
                            noise_backend="jax",
                            window_chunk=int(wc_env) if wc_env else
                            (1 if block_major else 5))
    sampler = DiffusionSampler(
        conf.make_eval_sampler(T=steps).schedule,
        SamplerConfig(patch_size=64, gn_sz=4))

    # init params against a representative patch batch
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 64, 64, conf.in_channels))
    rna = jnp.zeros((4, 4, 4, conf.rna_slices * 500))
    params = jax.jit(lambda k: model.init(
        k, x, jnp.zeros((1,), jnp.int32), rna, 2, 2))(rng)
    if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
        # cast weights ONCE: bf16 compute casts them per-call anyway, so
        # this is numerically identical but halves param HBM traffic
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    qa = False
    if os.environ.get("BENCH_PACKED", "1") == "1":
        # z-packed layout (DEFAULT): exact re-parameterization that fills
        # TPU lanes — measured 0.137 vs 0.097 tiles/s for the 5D layout
        # (models/unet_packed.py; golden-equivalence tested)
        from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                      pack_unet_params)
        params = pack_unet_params(
            jax.tree.map(lambda p: np.asarray(p, np.float32), params),
            conf.make_model_conf())
        params = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16),
                              params)
        # BENCH_QUANT=int8: int8 resblock convs on the MXU (2x bf16 peak;
        # ops/quant.py, quality bound in tests/test_quant), weights
        # pre-quantized once.  int8_static additionally calibrates static
        # activation scales (one instrumented chain) so the quantize
        # fuses into producers — no dynamic abs-max pass.
        q = os.environ.get("BENCH_QUANT") or None
        # BENCH_QUANT_ATTN=1: additionally int8 the DiT blocks' dense
        # projections (adaLN/qkv/proj/MLP — the largest non-conv matmuls)
        qa = q is not None and os.environ.get("BENCH_QUANT_ATTN",
                                              "1") == "1"
        if q:
            from tera_mind_tpu.ops.quant import prequantize_params
            params = prequantize_params(params, attn=qa)
        # BENCH_PACKED_ATTN=1: DiT blocks run on the packed (h,w,z) token
        # layout (no per-block pack/unpack transposes; reassociation-
        # equivalent, tests/test_packed.py)
        pa = os.environ.get("BENCH_PACKED_ATTN", "0") == "1"
        model = PackedTeraUNet(conf.make_model_conf(),
                               quant="int8" if q else None,
                               prequant=bool(q), quant_attn=qa,
                               packed_attn=pa)

    def model_fn(p, xp, tm, rp, p1, p2):
        # inference uses only the collage decode (base.py:387); params flow
        # through jit as an ARGUMENT (closures would embed 200M f32 consts
        # in the HLO -> remote compile service rejects the upload)
        return model.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    gen = TeraGenerator(sampler, model_fn, gconf, params=params)
    # synthetic sparse-ish gene stack, uint8 counts
    grng = np.random.default_rng(0)
    gene = (grng.random((rows, cols, gconf.gsz, gconf.gsz, gconf.z_pad,
                         gconf.gdim)) < 0.01).astype(np.uint8)
    state = gen.init_state(rows, cols)

    dev_state = jnp.asarray(state)
    if os.environ.get("BENCH_BF16_STATE", "0") == "1":
        # inter-step state in bf16: halves state/halo HBM traffic; the
        # reference roundtrips fp16 through disk every step, so precision
        # is comparable (bf16 8 vs fp16 11 mantissa bits) — kept opt-in
        dev_state = dev_state.astype(jnp.bfloat16)
    dev_gene = jnp.asarray(gene)

    if os.environ.get("BENCH_QUANT") == "int8_static":
        # calibration: run the dynamic-int8 chain once while an
        # instrumented window fn returns every QuantConv's activation
        # abs-max as jit outputs (callback-free — the axon PJRT plugin
        # rejects io_callback), then bake static scales
        from tera_mind_tpu.models.unet_packed import PackedTeraUNet
        from tera_mind_tpu.ops.quant import calibrate_generator
        pa = os.environ.get("BENCH_PACKED_ATTN", "0") == "1"
        params = calibrate_generator(
            gen, model, params, gene, steps=steps,
            margin=float(os.environ.get("BENCH_CALIB_MARGIN", "1.0")))
        model = PackedTeraUNet(conf.make_model_conf(), quant="int8",
                               prequant=True, static_act=True,
                               quant_attn=qa, packed_attn=pa)
        gen = TeraGenerator(sampler, model_fn, gconf, params=params)

    # block-major (default): one patch grid over the whole block — ~19%
    # fewer patches at 2x2 tiles (36% at scale), identical results
    # (tests/test_generator.py::test_block_major_real_unet)
    if block_major:
        step = gen.compile_step(rows, cols, block_major=True)
    elif os.environ.get("BENCH_FUSED", "0") == "1":
        step = gen.compile_step(rows, cols)
    else:
        step = gen.compile_pieces()

    # warmup/compile
    out = step(dev_state, dev_gene, jnp.int32(steps - 1))
    jax.block_until_ready(out)

    # repeat discipline: time the full chain BENCH_REPEATS times and report
    # the MEDIAN, so the recorded artifact matches documented headlines
    # within noise (VERDICT r2 weak #3: a single-shot int8 run recorded 3%
    # under the documented value)
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    times = []
    for _ in range(repeats):
        t0 = time.time()
        s = dev_state
        for t in range(steps - 1, -1, -1):
            s = step(s, dev_gene, jnp.int32(t))
        jax.block_until_ready(s)
        times.append(time.time() - t0)
    dt = float(np.median(times))

    tiles = rows * cols
    # normalize to the full-15-step-DDIM rate: each step costs the same, so
    # short BENCH_STEPS runs (big-grid ladder points) report the same
    # metric as a full run
    tiles_per_sec = tiles / (dt * 15.0 / steps)
    spread = (max(times) - min(times)) / dt if dt else 0.0
    rec = {
        "metric": "256x256x100ch tiles/sec/chip, full 15-step DDIM",
        "value": round(tiles_per_sec, 5),
        "unit": "tiles/s/chip",
        "vs_baseline": round(tiles_per_sec / REF_TILES_PER_SEC_PER_GPU, 2),
        "grid": f"{rows}x{cols}",
        "repeats": repeats,
        "spread_pct": round(100 * spread, 1),
    }
    if os.environ.get("BENCH_QUANT"):
        rec["mode"] = os.environ["BENCH_QUANT"]
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1" or os.environ.get("BENCH_QUANT"):
        main()
    else:
        orchestrate()
