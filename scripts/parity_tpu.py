"""End-to-end TPU-execution-path parity vs the live torch reference.

VERDICT r2 #8: the committed torch-parity tests prove semantics on CPU-f32
through the 5D flax model; production runs the z-PACKED model in bf16,
BLOCK-MAJOR, on the TPU.  This script chains the oracles end to end:

  torch CPU f32 reference protocol loop        (oracle)
    vs
  TeraGenerator packed-bf16 block-major step   (the deployed path)

over a 2x2 tile grid, full 15-step DDIM, identical LCG x_T noise
(data/noise.py, bit-exact to reference MBADataset_tst.py:11-14) and
identical gene stacks, and records the measured MAE / Pearson r / p99
of the final volume.  The torch side advances the grid one DDIM step at
a time exactly like the reference tera-scale loop (test_brn.py:232-273):
pad the global state with -1 (MBADataset_tst.py:95), patchify each
padded tile, call the reference sampler's single-step hook
``sample(idx=...)`` (base.py:572 — proven equal to our ``denoise_step``
in tests/test_reference_parity.py), and write the 256^2 interior back.

Usage (defaults = the recorded BASELINE.md configuration):
  python scripts/parity_tpu.py --channels 32 --rna 229 --tile 256 \
      --grid 2 --steps 15 [--quant int8] [--json-only]

The in-suite regression version of this check (small model, same code
path) lives in tests/test_tpu_path_parity.py.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def torch_protocol_loop(tmodel, ref_sampler, gconf, state0, gene, steps):
    """The reference tera-scale protocol (test_brn.py:232-273) on the live
    torch model: timestep-major over the whole grid, -1 halo padding,
    per-tile single-step denoise, interior write-back.  Pure numpy/torch.
    """
    import numpy as np
    import torch

    c = gconf
    rows = state0.shape[0] // c.tile
    cols = state0.shape[1] // c.tile
    size = c.tile + 2 * c.pad
    npat = size // c.patch          # patches per padded tile side
    gn = c.patch // c.gn_blk

    # timestep-invariant per-tile RNA patch stacks (z-major (z g) flatten,
    # reference unet_ours.py:308 'b h w (z g)')
    rna_pat = {}
    for r in range(rows):
        for cc in range(cols):
            g = gene[r, cc].astype(np.float32)          # (gsz,gsz,z_pad,G)
            win = g[:, :, :c.snum].reshape(c.gsz, c.gsz, -1)
            pats = win.reshape(npat, gn, npat, gn, -1).transpose(
                0, 2, 1, 3, 4).reshape(npat * npat, gn, gn, -1)
            rna_pat[(r, cc)] = torch.from_numpy(pats)

    state = state0.copy()
    for idx in range(steps - 1, -1, -1):
        big = np.pad(state, ((c.pad, c.pad), (c.pad, c.pad), (0, 0)),
                     constant_values=-1.0)
        nxt = np.empty_like(state)
        for r in range(rows):
            for cc in range(cols):
                win = big[r * c.tile: r * c.tile + size,
                          cc * c.tile: cc * c.tile + size]
                # z-window unfold, stain-major (generator state layout);
                # parity runs single-window geometry (n_win == 1)
                x = win.reshape(size, size, c.stains, c.n_win, c.zi)
                x = x.transpose(3, 0, 1, 2, 4).reshape(
                    c.n_win, size, size, c.stains * c.zi)[0]
                xp = x.reshape(npat, c.patch, npat, c.patch, -1).transpose(
                    0, 2, 1, 3, 4).reshape(npat * npat, c.patch, c.patch, -1)
                xp_t = torch.from_numpy(
                    np.ascontiguousarray(xp.transpose(0, 3, 1, 2)))
                with torch.no_grad():
                    out = ref_sampler.sample(
                        model=tmodel,
                        shape=(1, xp.shape[-1], c.tile, c.tile),
                        imgs=xp_t, noise=xp_t,
                        r_start=rna_pat[(r, cc)],
                        patch_size=c.patch, idx=idx, model_kwargs=None)
                o = out.numpy()[0].transpose(1, 2, 0)    # (tile, tile, C)
                o = o.reshape(c.tile, c.tile, c.n_win, c.stains, c.zi)
                o = o.transpose(0, 1, 3, 2, 4).reshape(c.tile, c.tile, -1)
                nxt[r * c.tile:(r + 1) * c.tile,
                    cc * c.tile:(cc + 1) * c.tile] = o
        state = nxt
    return state


def run(channels=32, rna=229, tile=256, grid=2, steps=15, quant=None,
        seed=0, verbose=True, trained=None):
    """``trained``: path to a training run dir (config.json + orbax/) —
    the parity chains then run on GENUINELY TRAINED weights instead of a
    random init (VERDICT r4 ask #4: trained weight/activation
    distributions are what bf16 rounding and int8 calibration actually
    face).  The flax params are loaded into the live torch reference via
    the inverse layout mapping (tests/test_convert._flax_to_torch_sd,
    round-trip-proven), so both sides run the same trained weights."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from reference_compat import (build_reference_model,
                                  build_reference_sampler,
                                  torch_state_dict_numpy)
    from tera_mind_tpu.convert import convert_unet_params
    from tera_mind_tpu.diffusion.sampler import (DiffusionSampler,
                                                 SamplerConfig)
    from tera_mind_tpu.diffusion.schedule import spaced_schedule
    from tera_mind_tpu.models.unet import TeraUNetConfig
    from tera_mind_tpu.models.unet_packed import (PackedTeraUNet,
                                                  pack_unet_params)
    from tera_mind_tpu.parallel.generator import (GeneratorConfig,
                                                  TeraGenerator)

    patch = 64
    embed = 4 * channels
    if trained is not None:
        from tera_mind_tpu.config import TrainConfig
        tc = TrainConfig.load(Path(trained) / "config.json")
        mc = tc.make_model_conf()
        channels, rna = mc.model_channels, mc.rna_num
        embed = mc.embed_channels
        assert mc.image_size == patch and mc.in_channels == 4, mc

    # single z-window geometry: n_slices=2, snum=4 -> zi=2, n_win=1,
    # channels = 2 stains * 2 z = 4 = model in_channels, z_pad = 4 RNA planes
    gconf = GeneratorConfig(tile=tile, patch=patch, gn_blk=16, snum=4,
                            n_slices=2, stains=2, gdim=500,
                            noise_backend="torch")
    assert gconf.n_win == 1 and gconf.channels == 4

    torch.manual_seed(seed)
    tmodel, _ = build_reference_model(
        image_size=patch, in_channels=4, model_channels=channels,
        embed_channels=embed, rna_num=rna)
    mconf = TeraUNetConfig(image_size=patch, gn_sz=patch // 16, rna_num=rna,
                           rna_tpl=(0, 1, 2, 3), in_channels=4,
                           out_channels=4, model_channels=channels,
                           embed_channels=embed, dropout=0.0)
    if trained is not None:
        from test_convert import _flax_to_torch_sd

        from tera_mind_tpu.convert import load_pretrain_params
        params5 = load_pretrain_params(Path(trained) / "orbax", mconf)
        sd = _flax_to_torch_sd(
            jax.tree.map(lambda p: np.asarray(p, np.float32), params5),
            mconf)
        missing, unexpected = tmodel.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=False)
        assert not missing, missing  # every torch param must be provided
        if verbose:
            print(f"[parity_tpu] trained weights from {trained} "
                  f"(ch={channels}, rna={rna})", flush=True)
    else:
        params5 = convert_unet_params(torch_state_dict_numpy(tmodel), mconf)

    # --- the deployed path: packed params, bf16, block-major
    packed = pack_unet_params(
        jax.tree.map(lambda p: np.asarray(p, np.float32), params5), mconf)
    packed = jax.tree.map(lambda p: jnp.asarray(p, jnp.bfloat16), packed)
    if quant:
        from tera_mind_tpu.ops.quant import prequantize_params
        packed = prequantize_params(packed, attn=True)
    model = PackedTeraUNet(mconf, quant="int8" if quant else None,
                           prequant=bool(quant), quant_attn=bool(quant))

    def model_fn(p, xp, tm, rp, p1, p2):
        return model.apply(p, xp, tm, rp, p1, p2, decode_original=False)

    sampler = DiffusionSampler(
        spaced_schedule("linear", 1000, f"ddim{steps}"),
        SamplerConfig(patch_size=patch, gn_sz=patch // 16))
    gen = TeraGenerator(sampler, model_fn, gconf, params=packed)

    rng = np.random.default_rng(seed)
    gene = (rng.random((grid, grid, gconf.gsz, gconf.gsz, gconf.z_pad,
                        gconf.gdim)) < 0.01).astype(np.uint8)
    state0 = gen.init_state(grid, grid, row0=1, col0=1, grid_w=416)

    step = gen.compile_step(grid, grid, block_major=True)
    s = jnp.asarray(state0)
    dev_gene = jnp.asarray(gene)
    t0 = time.time()
    for t in range(steps - 1, -1, -1):
        s = step(s, dev_gene, jnp.int32(t))
    ours = np.asarray(jax.block_until_ready(s), np.float32)
    t_tpu = time.time() - t0
    if verbose:
        print(f"[parity_tpu] {jax.default_backend()} packed-bf16 "
              f"block-major chain: {t_tpu:.1f}s", flush=True)

    # --- the oracle: reference protocol on the live torch model, f32 CPU
    ref_sampler = build_reference_sampler(T_eval=steps, image_size=patch)
    t0 = time.time()
    ref = torch_protocol_loop(tmodel, ref_sampler, gconf, state0, gene,
                              steps)
    if verbose:
        print(f"[parity_tpu] torch f32 oracle chain: "
              f"{time.time() - t0:.1f}s", flush=True)

    d = np.abs(ours - ref)
    rec = {
        "metric": "tpu-path parity vs torch reference "
                  "(packed bf16 block-major, full DDIM chain)",
        "grid": f"{grid}x{grid}", "tile": tile, "steps": steps,
        "model_channels": channels, "rna_num": rna,
        "quant": quant or "none",
        "backend": jax.default_backend(),
        "mae": round(float(d.mean()), 6),
        "p99": round(float(np.percentile(d, 99)), 6),
        "max": round(float(d.max()), 6),
        "pearson_r": round(float(np.corrcoef(ours.ravel(),
                                             ref.ravel())[0, 1]), 6),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--rna", type=int, default=229)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--grid", type=int, default=2)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--quant", default=None, choices=[None, "int8"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trained", default=None,
                    help="training run dir (config.json + orbax/): run "
                    "the parity chains on trained weights")
    args = ap.parse_args()
    run(channels=args.channels, rna=args.rna, tile=args.tile,
        grid=args.grid, steps=args.steps, quant=args.quant,
        seed=args.seed, trained=args.trained)
