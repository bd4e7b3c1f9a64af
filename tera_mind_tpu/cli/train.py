"""Training CLI (reference train.py:7-45 argument surface).

Usage:
    python -m tera_mind_tpu.cli.train --mouse 638850 --batch 32 \
        --patch 64 --stain all --rna_slc 4 [--synthetic]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def epoch_batches(ds, eff_batch: int, *, workers: int = 0):
    """Endless effective-batch iterator over dataset passes.

    The loader yields EFFECTIVE batches (batch * accum samples); the
    harness scans them as accum microbatches of `batch` samples each
    (reference accumulate_grad_batches semantics, config.py:172-174).
    A pass shorter than one effective batch raises instead of spinning
    forever decoding-and-dropping (drop_last) — the silent-hang bug the
    round-4 dress rehearsal caught on a 4-tile dataset with effective
    batch 64 (regression: tests/test_cli_robustness.py).
    """
    from ..data.dataset import batches
    while True:
        n = 0
        for b in batches(ds, eff_batch, workers=workers):
            n += 1
            yield b
        if n == 0:
            raise RuntimeError(
                f"dataset pass ({len(ds)} samples) yielded no "
                f"effective batch of {eff_batch} — fewer samples than "
                "batch*accum; raise `repeat` or shrink the batch")


def main():
    ap = argparse.ArgumentParser(description="Train Tera-MIND TPU")
    ap.add_argument("--batch", type=int, default=32, help="global batch size")
    ap.add_argument("--patch", type=int, default=64,
                    choices=(32, 64, 128), help="model patch size")
    ap.add_argument("--mouse", type=str, default="638850",
                    choices=("609882", "609889", "638850"))
    ap.add_argument("--stain", type=str, default="all",
                    choices=("DAPI", "PolyT", "all"))
    ap.add_argument("--rna_slc", type=int, default=4, choices=(1, 4, 8, 16))
    ap.add_argument("--method", type=str, default="ours")
    ap.add_argument("--to_hbr", action="store_true",
                    help="human-brain transfer: 81-gene M2H panel")
    ap.add_argument("--data_path", type=str, default="",
                    help="root of per-tile gene npz + image files")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--net_ch", type=int, default=None,
                    help="override the base channel width (preset: 64). "
                    "The width is persisted in the run's config.json, "
                    "which cli.generate prefers over run-name parsing")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on the synthetic fixture (smoke runs)")
    ap.add_argument("--workers", type=int, default=0,
                    help="loader worker PROCESSES decoding samples in "
                    "parallel (0 = one background IO thread). Decode "
                    "costs ~72 ms/sample/core (BASELINE.md), so feeding "
                    "one chip at full rate needs >=4 workers on a "
                    "production host")
    ap.add_argument("--pretrain", type=Path, default=None,
                    help="initialize (not resume) from a checkpoint: a "
                    "torch Lightning .ckpt (converted, ema_model keys "
                    "stripped — reference experiment.py:50-58) or an "
                    "orbax dir written by a previous run. Optimizer "
                    "state and step start fresh")
    ap.add_argument("--packed", action="store_true",
                    help="z-packed compute layout with exact 5D params "
                    "(~40%% faster convs on TPU; checkpoints identical)")
    ap.add_argument("--packed_attn", action="store_true",
                    help="with --packed: DiT blocks on the (h,w,z)-token "
                    "packed layout (reassociation-equivalent; same "
                    "weight class)")
    args = ap.parse_args()

    from ._backend import init_backend
    init_backend()

    from ..config import prep_config
    from ..constants import M2H

    nrna = len(M2H) if args.to_hbr else (229 if args.mouse == "638850"
                                         else 500)
    conf = prep_config(args.mouse, batch=args.batch, size=args.patch,
                       stain=args.stain, nrna=nrna, srna=args.rna_slc,
                       method=args.method, data_path=args.data_path)
    if args.net_ch:
        conf.net_ch = args.net_ch
    conf.packed_compute = args.packed
    conf.packed_attn = args.packed_attn

    from ..data.dataset import MerfishTrainDataset, SyntheticDataset
    from ..training.harness import Trainer

    if args.synthetic:
        ds = SyntheticDataset(n=max(args.batch * 8, 64), crop=4 * args.patch,
                              gdim=conf.rna_num, snum=args.rna_slc,
                              stain=args.stain, pad_bins=conf.gn_sz // 2)
    else:
        gene_files = sorted(Path(conf.data_path).glob("gene_*/*.npz"))
        assert gene_files, f"no gene npz under {conf.data_path}"
        # one dataset pass must yield at least one EFFECTIVE batch, or the
        # epoch loop spins forever decoding a too-short pass and dropping
        # it (drop_last) — caught by the dress rehearsal on a 4-tile
        # dataset with effective batch 64
        repeat = max(10, -(-2 * conf.batch_size_effective
                           // len(gene_files)))
        ds = MerfishTrainDataset(gene_files, gdim=500,
                                 gblk=conf.gn_blk, crop=4 * args.patch,
                                 snum=args.rna_slc, stain=args.stain,
                                 pad_bins=conf.gn_sz // 2, repeat=repeat,
                                 compact=True)

    trainer = Trainer(conf)
    state = None
    if args.pretrain is not None:
        from ..convert import load_pretrain_params
        params = load_pretrain_params(args.pretrain, conf.make_model_conf())
        state = trainer.state_from_params(params)
        print(f"pretrained init from {args.pretrain}", flush=True)
    max_steps = args.max_steps or conf.total_samples
    trainer.fit(epoch_batches(ds, conf.batch_size_effective,
                              workers=args.workers),
                max_steps=max_steps, state=state)


if __name__ == "__main__":
    main()
