"""Training-step throughput: 5D TeraUNet vs packed-from-5D layout.

Measures steady-state samples/sec of the jitted train step (grad accum
included) on the flagship config at a reduced batch. Both variants
optimize the identical parameter tree (tests/test_harness.py
::test_packed_train_step_matches_5d).

    python scripts/bench_train.py [--batch 8] [--accum 2] [--steps 8]
"""

from __future__ import annotations

import argparse
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


def run(packed: bool, batch: int, accum: int, steps: int,
        net_ch: int = 0, mouse: str = "638850") -> float:
    from tera_mind_tpu.config import prep_config
    from tera_mind_tpu.models.unet_packed import PackedTeraUNet
    from tera_mind_tpu.training.harness import (TrainState, make_optimizer,
                                                make_train_step)

    conf = prep_config(mouse, batch=batch, size=64, stain="all", srna=4)
    conf.accum_batches = accum
    conf.compute_dtype = "bfloat16"
    conf.dropout = 0.1
    if net_ch:
        conf.net_ch = net_ch  # e.g. 32 = the dress-rehearsal width, for
        # reconciling cli.train rates against the pure-device step rate

    model5 = conf.make_model_conf().make_model()
    model = PackedTeraUNet(conf.make_model_conf(), from_5d=True,
                           packed_attn=os.environ.get(
                               "BENCH_PACKED_ATTN", "0") == "1") \
        if packed else model5
    sampler = conf.make_train_sampler()
    optimizer = make_optimizer(conf)
    step_fn = jax.jit(make_train_step(model, sampler, optimizer, conf),
                      donate_argnums=(0,))

    ps, gn = conf.image_size, conf.gn_sz
    x = jnp.zeros((4, ps, ps, conf.in_channels))
    r = jnp.zeros((4, gn, gn, conf.rna_slices * 500))
    params = jax.jit(lambda k: model5.init(
        k, x, jnp.zeros((1,), jnp.int32), r, 2, 2))(jax.random.PRNGKey(0))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=optimizer.init(params))

    rng = np.random.default_rng(0)
    crop = conf.train_crop
    gh = crop // 16 + conf.gn_sz
    micro = batch
    batch_d = {
        "image": jnp.asarray(rng.standard_normal(
            (accum, micro, crop, crop, conf.in_channels)).clip(-1, 1),
            jnp.float32),
        "rna": jnp.asarray(rng.integers(0, 3, (
            accum, micro, gh, gh, conf.rna_slices * 500)), jnp.float32),
    }

    key = jax.random.PRNGKey(1)
    state, loss = step_fn(state, batch_d, key)   # compile + warmup
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, batch_d, k)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    sps = steps * accum * micro / dt
    print(f"{'packed' if packed else '5d':>6}: {sps:8.2f} samples/s "
          f"({dt/steps*1e3:.0f} ms/step, loss={float(loss):.4f})",
          flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--only", choices=("5d", "packed"), default=None)
    ap.add_argument("--net_ch", type=int, default=0,
                    help="override base width (0 = preset 64)")
    ap.add_argument("--mouse", type=str, default="638850")
    args = ap.parse_args()
    if args.only != "packed":
        run(False, args.batch, args.accum, args.steps,
            net_ch=args.net_ch, mouse=args.mouse)
    if args.only != "5d":
        run(True, args.batch, args.accum, args.steps,
            net_ch=args.net_ch, mouse=args.mouse)


if __name__ == "__main__":
    main()
