"""Training-loader throughput on reference-format tiles.

Synthesizes reference-format training data on disk — per-tile pydata-sparse
gene ``.npz`` (MBADataset.py:69-98) + paired blosc-compressed zarr ``.zip``
images (MBADataset.py:100-102) — then measures MerfishTrainDataset sample
decode throughput for several worker-process counts.

The device side consumes 53.6 samples/s/chip at the measured train rate
(BASELINE.md); this script tells you how many loader workers keep one chip
fed (per-worker rate scales with host cores — this container has ONE core,
so the multi-worker rows here measure overhead, not speedup; record the
per-worker rate and divide).

Usage:  python scripts/bench_loader.py [--tiles 16] [--batches 8]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
import zipfile
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
BENCH_DIR = ROOT / ".cache" / "loader_bench"
TILE = 288          # tile side in px (>= the 256 training crop)
GDIM = 500
NZ = 50


def synth_tile(gdir: Path, idir: Path, idx: int) -> None:
    """One reference-format tile: sparse gene npz + zarr-zip image."""
    import tensorstore as ts

    from tera_mind_tpu.data.coo import COO

    rng = np.random.default_rng(idx)
    # ~200k counts/tile, concentrated in blobs like real MERFISH
    nnz = 200_000
    coords = np.stack([
        rng.integers(0, TILE, nnz),
        rng.integers(0, TILE, nnz),
        rng.integers(0, NZ * GDIM, nnz),
    ])
    data = rng.integers(1, 4, nnz).astype(np.uint8)
    coo = COO(coords=coords, data=data, shape=(TILE, TILE, NZ * GDIM))
    coo.save_npz(gdir / f"tile_{idx}.npz")

    img = rng.integers(0, 255, (2 * NZ, TILE, TILE), np.uint8)
    zdir = idir / f"tile_{idx}.zarr_tmp"
    if zdir.exists():
        shutil.rmtree(zdir)
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(zdir)},
        "metadata": {"shape": list(img.shape), "dtype": "|u1",
                     "chunks": [10, TILE, TILE],
                     "compressor": {"id": "blosc", "cname": "zstd",
                                    "clevel": 3}},
        "create": True, "delete_existing": True,
    }
    ts.open(spec).result()[...] = img
    # zarr dir -> .zip (the reference's on-disk format)
    zpath = idir / f"tile_{idx}.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        for f in sorted(zdir.rglob("*")):
            if f.is_file():
                zf.write(f, f.relative_to(zdir))
    shutil.rmtree(zdir)


def ensure_data(n_tiles: int) -> list[Path]:
    gdir = BENCH_DIR / "gene_638850"
    idir = BENCH_DIR / "img_638850"
    gdir.mkdir(parents=True, exist_ok=True)
    idir.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n_tiles):
        p = gdir / f"tile_{i}.npz"
        if not p.exists() or not (idir / f"tile_{i}.zip").exists():
            synth_tile(gdir, idir, i)
        paths.append(p)
    return paths


def measure(ds, batch_size: int, n_batches: int, workers: int) -> float:
    from tera_mind_tpu.data.dataset import batches
    it = batches(ds, batch_size, workers=workers)
    next(it)  # warm up (worker spawn, file cache)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        b = next(it)
        n += b["image"].shape[0]
    dt = time.perf_counter() - t0
    it.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=16)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4])
    args = ap.parse_args()

    paths = ensure_data(args.tiles)
    from tera_mind_tpu.data.dataset import MerfishTrainDataset
    ds = MerfishTrainDataset(paths, gdim=GDIM, gblk=16, crop=256, snum=4,
                             stain="all", pad_bins=2, repeat=64)
    for w in args.workers:
        rate = measure(ds, args.batch, args.batches, w)
        print(json.dumps({"metric": "loader_samples_per_s", "value":
                          round(rate, 2), "workers": w,
                          "unit": "samples/s",
                          "device_demand": 53.6}), flush=True)


if __name__ == "__main__":
    main()
