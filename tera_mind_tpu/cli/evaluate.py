"""Evaluation CLI: generated tile store vs reference tiles.

Capability parity with the reference's offline eval scripts
(utils/metrics.py + utils/feat_mba.py + utils/inft_mba.py driven from
notebooks/shell): d-FID (streaming masked moments), PSNR/SSIM/MS-SSIM on
paired tiles, morphology stats, per-gene expression tables.

    python -m tera_mind_tpu.cli.evaluate --gen_dir out/roi \
        --real_dir data/tiles --report out/eval.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _tile_slices(store, names, channel: int):
    for n in names:
        arr = store.read(n)
        a = np.asarray(arr, np.float32)
        yield a[..., channel] if a.ndim == 3 else a


def main():
    ap = argparse.ArgumentParser(description="evaluate generated tiles")
    ap.add_argument("--gen_dir", required=True)
    ap.add_argument("--real_dir", default=None,
                    help="paired real tiles (same names); omit for "
                    "gen-only stats")
    ap.add_argument("--channel", type=int, default=0,
                    help="channel (slice*stain) index to evaluate")
    ap.add_argument("--report", default=None, help="write JSON report here")
    ap.add_argument("--features", default="pool",
                    choices=("pool", "torchscript", "inception", "clip"))
    ap.add_argument("--feature_weights", default=None,
                    help="weights path: torchscript InceptionV3 export "
                    "(torchscript/inception; reference feat_mba.py:29-42) "
                    "or a local CLIP model dir (clip)")
    ap.add_argument("--max_tiles", type=int, default=0)
    args = ap.parse_args()

    from ..data.tilestore import TileStore
    from ..metrics.features import (PoolFeatures, TorchscriptFeatures,
                                    d_fid_between_stores)
    from ..metrics.ssim import ms_ssim, psnr, ssim
    from ..metrics.stats import OnlineVariance

    gen = TileStore(args.gen_dir)
    names = gen.names()
    if args.max_tiles:
        names = names[: args.max_tiles]
    assert names, f"no tiles under {args.gen_dir}"
    report: dict = {"gen_dir": args.gen_dir, "n_tiles": len(names)}

    # intensity stats (always)
    ov = OnlineVariance(1)
    for a in _tile_slices(gen, names, args.channel):
        ov.update(a.reshape(-1, 1))
    report["gen_mean"] = float(ov.mean[0])
    report["gen_std"] = float(ov.std[0])

    if args.real_dir:
        real = TileStore(args.real_dir)
        rnames = [n for n in names if real.has(n)]
        report["n_paired"] = len(rnames)

        # a `d_fid` entry appears ONLY with a real feature network; the
        # weight-free fallback is reported as `pool_fid`, which is NOT
        # comparable to the paper's Inception/CLIP d-FID numbers
        # (reference feat_mba.py:57-179)
        if args.features == "torchscript" and args.feature_weights:
            extractor, key = TorchscriptFeatures(args.feature_weights), \
                "d_fid"
        elif args.features == "inception" and args.feature_weights:
            # flax InceptionV3 on the TPU (converted torchscript weights)
            from ..metrics.inception import FlaxInceptionFeatures
            extractor, key = FlaxInceptionFeatures(args.feature_weights), \
                "d_fid"
        elif args.features == "clip" and args.feature_weights:
            from ..metrics.features import CLIPFeatures
            extractor, key = CLIPFeatures(args.feature_weights), "d_fid_clip"
        else:
            if args.features != "pool":
                raise SystemExit(f"--features {args.features} requires "
                                 "--feature_weights (refusing to silently "
                                 "fall back to pool features)")
            extractor, key = PoolFeatures(), "pool_fid"
        report[key] = float(d_fid_between_stores(
            _tile_slices(gen, rnames, args.channel),
            _tile_slices(real, rnames, args.channel),
            extractor))
        if key == "pool_fid":
            report["pool_fid_note"] = ("weight-free pooled features — not "
                                       "comparable to Inception/CLIP d-FID")

        # paired PSNR/SSIM/MS-SSIM (reference metrics.py:201-541); jitted
        # once per shape (eager per-op dispatch is pathological here)
        import jax

        from ._backend import init_backend
        init_backend()
        psnr_j = jax.jit(lambda a, b: psnr(a, b, 2.0))
        ssim_j = jax.jit(lambda a, b: ssim(a, b, data_range=2.0))
        msssim_j = jax.jit(lambda a, b: ms_ssim(a, b, data_range=2.0))
        ps, ss, ms = [], [], []
        for n in rnames:
            g = np.asarray(gen.read(n), np.float32)
            r = np.asarray(real.read(n), np.float32)
            ch = min(args.channel, g.shape[-1] - 1) if g.ndim == 3 else None
            if g.ndim == 3:
                g, r = g[..., ch], r[..., ch]
            # the metrics take (B, H, W, C)
            g = g[None, ..., None]
            r = r[None, ..., None]
            ps.append(float(np.asarray(psnr_j(g, r)).mean()))
            ss.append(float(np.asarray(ssim_j(g, r)).mean()))
            if min(g.shape[1:3]) >= 160:
                ms.append(float(np.asarray(msssim_j(g, r)).mean()))
        report["psnr"] = float(np.mean(ps))
        report["ssim"] = float(np.mean(ss))
        if ms:
            report["ms_ssim"] = float(np.mean(ms))

    print(json.dumps(report, indent=2))
    if args.report:
        Path(args.report).parent.mkdir(parents=True, exist_ok=True)
        Path(args.report).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
