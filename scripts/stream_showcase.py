"""Host-streaming production-mode showcase: an 8x8-tile region of the
whole-brain configuration through StreamingGenerator with the packed
model and block-major windows — the exact mode a single-chip whole-brain
run uses (docs/WHOLE_BRAIN.md section 3), at a size that finishes in
minutes.  Prints streamed tile-steps/s.

    python scripts/stream_showcase.py [--rows 8] [--cols 8] [--steps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--cols", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--block", type=int, default=2)
    args = ap.parse_args()

    from tera_mind_tpu.cli.generate import synthetic_gene_grid
    from tera_mind_tpu.config import prep_config
    from tera_mind_tpu.diffusion.sampler import DiffusionSampler, SamplerConfig
    from tera_mind_tpu.models.unet_packed import PackedTeraUNet
    from tera_mind_tpu.parallel.generator import GeneratorConfig, TeraGenerator
    from tera_mind_tpu.parallel.streaming import StreamConfig, StreamingGenerator

    conf = prep_config("638850", batch=4, size=64, stain="all", srna=4)
    conf.compute_dtype = "bfloat16"
    model5 = conf.make_model_conf().make_model()
    model = PackedTeraUNet(conf.make_model_conf(), from_5d=True)
    gconf = GeneratorConfig(tile=256, patch=64, gn_blk=16, snum=4,
                            n_slices=50, stains=2, gdim=500,
                            noise_backend="torch", window_chunk=1)
    sampler = DiffusionSampler(conf.make_eval_sampler(T=args.steps).schedule,
                               SamplerConfig(patch_size=64, gn_sz=4))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 64, 64, conf.in_channels))
    rna = jnp.zeros((4, 4, 4, conf.rna_slices * 500))
    params = jax.jit(lambda k: model5.init(
        k, x, jnp.zeros((1,), jnp.int32), rna, 2, 2))(rng)
    params = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), params)

    def model_fn(p, xp, tm, rp, p1, p2):
        return model.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    gen = TeraGenerator(sampler, model_fn, gconf, params=params)
    sgen = StreamingGenerator(gen, StreamConfig(
        block_rows=args.block, block_cols=args.block, progress=False,
        block_major=True))

    gene = synthetic_gene_grid(args.rows, args.cols, gconf.gsz,
                               gconf.z_pad, gconf.gdim)
    t0 = time.time()
    state = sgen.run(args.rows, args.cols, gene, row0=1, col0=1)
    dt = time.time() - t0
    out = np.asarray(state.read)
    n = args.rows * args.cols * args.steps
    print(f"streamed {args.rows}x{args.cols} tiles x {args.steps} steps in "
          f"{dt:.1f}s (incl. compile) = {n/dt:.3f} tile-steps/s; "
          f"out range [{out.min():.3f},{out.max():.3f}] "
          f"finite={np.isfinite(out).all()}", flush=True)


if __name__ == "__main__":
    main()
