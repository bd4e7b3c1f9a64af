"""One-command dress rehearsal: the FULL production pipeline on
reference-format data (VERDICT r3 ask #5).

Every stage is unit-tested in isolation; this script proves the SEAMS at
production shapes and on-disk formats, driving the real CLIs exactly as an
operator would:

  1. synth     — a small reference-format "brain" on disk: 512^2 training
                 tiles (pydata-sparse gene ``.npz``, MBADataset.py:69-98 +
                 blosc zarr-zip images, MBADataset.py:100-102), CSV
                 manifests (dataset_util.py:8-35), per-tile inference gene
                 files named by the gn_sublst convention
                 (test_brn.py:51-70), and a paired "real" tile store for
                 evaluation.
  2. train     — ``cli.train --data_path`` (real loader: zarr-zip decode +
                 COO crop/bin) for a few hundred steps -> orbax ckpt under
                 ``checkpoints/{run_name}/orbax``.
  3. generate  — ``cli.generate --stream`` restoring that orbax ckpt, gene
                 provider reading the inference ``.npz`` files, host-
                 streamed state, bf16 transfers -> fp16 tile store.
  4. generate (int8_static) — the same command with ``--quant
                 int8_static``: the promoted deployment mode through the
                 same CLI seams, on the TRAINED weights; its tiles are
                 compared against the bf16 lane (chain-quality on trained
                 weights, VERDICT r4 ask #4).
  5. assemble  — ``cli.assemble`` -> pyramidal OME-BigTIFF per slice via
                 the native C++ writer.
  6. evaluate  — ``cli.evaluate`` gen-vs-real for BOTH lanes: pool-FID,
                 PSNR/SSIM/MS-SSIM, JSON reports.

Wall-times per phase are recorded and printed as a JSON summary (the
recorded round-5 run lives in docs/DRESS_REHEARSAL.md).

Usage:  python scripts/dress_rehearsal.py [--root .cache/rehearsal]
            [--steps 200] [--skip_train] [--fresh]

Runs every jax stage as a SEQUENTIAL subprocess (only one process can hold
the TPU in this environment).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MOUSE = "609882"      # 500-plex panel (train.py:36-39)
GDIM, NZ = 500, 50
TRAIN_TILE = 512      # training tile px (dataset_util.py:21-23 grid unit)
GEN_ROWS = GEN_COLS = 2
HST = WST = 256       # generation grid origin px (tile (1,1))


# ------------------------------------------------------------------ #
# phase 1: synthesize a reference-format brain                       #
# ------------------------------------------------------------------ #
def synth_global_field(rng: np.random.Generator, px: int):
    """One global sparse gene field over [0,px)^2 so every file cut from
    it agrees on overlaps (the property real MERFISH data has and
    assemble_bins relies on)."""
    nnz = int(px * px * 0.8)  # ~0.8 counts / px^2, blob-free but dense-ish
    coords = np.stack([
        rng.integers(0, px, nnz),
        rng.integers(0, px, nnz),
        rng.integers(0, NZ * GDIM, nnz),
    ])
    data = rng.integers(1, 4, nnz).astype(np.uint8)
    return coords, data


def cut_coo(coords, data, h0, h1, w0, w1):
    """Window [h0,h1)x[w0,w1) of the global field as a local COO."""
    from tera_mind_tpu.data.coo import COO
    m = ((coords[0] >= h0) & (coords[0] < h1)
         & (coords[1] >= w0) & (coords[1] < w1))
    c = coords[:, m].copy()
    c[0] -= h0
    c[1] -= w0
    return COO(coords=c, data=data[m].copy(),
               shape=(h1 - h0, w1 - w0, NZ * GDIM))


def synth_image(rng: np.random.Generator, coords, data, h0, w0,
                px: int) -> np.ndarray:
    """(100, px, px) uint8 image correlated with the local gene density
    (2 stains x 50 z, DAPI block then PolyT — the zarr export layout)."""
    img = rng.integers(10, 40, (2 * NZ, px, px)).astype(np.float32)
    # add gene-density blobs: bin local counts to 16px and upsample
    loc = cut_coo(coords, data, h0, h0 + px, w0, w0 + px)
    dens = loc.block_sum(16).todense(np.float32).sum(-1)  # (px/16, px/16)
    dens = dens / max(dens.max(), 1.0)
    up = np.kron(dens, np.ones((16, 16), np.float32))
    img += 180.0 * up[None]
    return np.clip(img, 0, 255).astype(np.uint8)


def write_zarr_zip(path: Path, img: np.ndarray) -> None:
    import tensorstore as ts
    zdir = path.with_suffix(".zarr_tmp")
    if zdir.exists():
        shutil.rmtree(zdir)
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(zdir)},
        "metadata": {"shape": list(img.shape), "dtype": "|u1",
                     "chunks": [10, img.shape[1], img.shape[2]],
                     "compressor": {"id": "blosc", "cname": "zstd",
                                    "clevel": 3}},
        "create": True, "delete_existing": True,
    }
    ts.open(spec).result()[...] = img
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for f in sorted(zdir.rglob("*")):
            if f.is_file():
                zf.write(f, f.relative_to(zdir))
    shutil.rmtree(zdir)


def synth(root: Path) -> None:
    from tera_mind_tpu.data.tilestore import TileStore, tile_name

    data = root / "data"
    gdir = data / f"gene_{MOUSE}"
    idir = data / f"img_{MOUSE}"
    for d in (gdir, idir):
        d.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(0)
    # global field covers the 2x2 train grid = [0,1024)^2 px, which also
    # contains the generation grid [256,768)^2 and its 128px overlaps
    px_all = 2 * TRAIN_TILE
    coords, counts = synth_global_field(rng, px_all)

    # --- training tiles: gene npz + zarr-zip image, reference naming
    imgs = {}
    for r in range(2):
        for c in range(2):
            h0, w0 = r * TRAIN_TILE, c * TRAIN_TILE
            nm = f"{h0}_{h0 + TRAIN_TILE}_{w0}_{w0 + TRAIN_TILE}"
            cut_coo(coords, counts, h0, h0 + TRAIN_TILE, w0,
                    w0 + TRAIN_TILE).save_npz(gdir / f"{nm}.npz")
            img = synth_image(rng, coords, counts, h0, w0, TRAIN_TILE)
            write_zarr_zip(idir / f"{nm}.zip", img)
            imgs[(r, c)] = img
    print(f"synth: 4 train tiles under {gdir} / {idir}", flush=True)

    # --- CSV manifests (dataset_util.py:8-35); cli.train globs the npz
    # directly but the manifest seam is part of the surface
    from tera_mind_tpu.data.manifest import prep_manifest
    man = data / "manifests"
    man.mkdir(exist_ok=True)
    n = prep_manifest(data, MOUSE, man / f"{MOUSE}.csv", tile=TRAIN_TILE,
                      rows=2, cols=2, require_image=False)
    assert n == 4, n

    # --- inference gene files: 256-tile +-128px overlap windows named by
    # the gn_sublst convention (test_brn.py:51-70).  Kept OUT of the
    # training dir (cli.train globs gene_*/*.npz)
    tdir = data / "tst" / f"gene_{MOUSE}"
    tdir.mkdir(parents=True, exist_ok=True)
    for r in range(GEN_ROWS):
        for c in range(GEN_COLS):
            h0, w0 = HST + r * 256, WST + c * 256
            nm = (f"{h0}_{h0+256}_{w0}_{w0+256}_"
                  f"{h0-128}_{h0+384}_{w0-128}_{w0+384}.npz")
            cut_coo(coords, counts, h0 - 128, h0 + 384, w0 - 128,
                    w0 + 384).save_npz(tdir / nm)
    print(f"synth: {GEN_ROWS * GEN_COLS} inference gene windows", flush=True)

    # --- paired "real" store for evaluation: the synthetic microscopy
    # cut into 256^2 channels-last [-1,1] fp16 tiles (TileStore naming)
    real = TileStore(data / "real_tiles").create()
    for r in range(GEN_ROWS):
        for c in range(GEN_COLS):
            h0, w0 = HST + r * 256, WST + c * 256
            tr, tc = h0 // TRAIN_TILE, w0 // TRAIN_TILE
            oy, ox = h0 % TRAIN_TILE, w0 % TRAIN_TILE
            raw = imgs[(tr, tc)][:, oy:oy + 256, ox:ox + 256]
            # (2*NZ, h, w) channels-first -> (h, w, 2*NZ) stain-major
            t = raw.transpose(1, 2, 0).astype(np.float32) / 127.5 - 1.0
            real.write(tile_name(h0, h0 + 256, w0, w0 + 256),
                       t.astype(np.float16))
    print(f"synth: real eval store {data / 'real_tiles'}", flush=True)


# ------------------------------------------------------------------ #
# phases 2-5: the CLIs, as subprocesses                               #
# ------------------------------------------------------------------ #
def run_cli(args: list[str], cwd: Path, log: Path) -> float:
    env = dict(os.environ)
    # APPEND the repo (keep the platform's sitecustomize path — replacing
    # PYTHONPATH drops the TPU plugin registration here)
    env["PYTHONPATH"] = str(ROOT) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   str(ROOT / ".cache" / "jax"))
    t0 = time.time()
    with open(log, "a") as lf:
        lf.write(f"\n===== {' '.join(args)}\n")
        lf.flush()
        subprocess.run([sys.executable, "-m"] + args, cwd=cwd, env=env,
                       stdout=lf, stderr=subprocess.STDOUT, check=True)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=str(ROOT / ".cache" / "rehearsal"))
    ap.add_argument("--steps", type=int, default=200,
                    help="training steps (each = one effective batch)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--net_ch", type=int, default=32,
                    help="model width for the rehearsal (the seams under "
                    "test — formats, CLIs, ckpt handoff — are width-"
                    "independent; the flagship 64-width model's trace+"
                    "remote-compile alone exceeds this host's budget)")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing checkpoint")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the rehearsal dir first")
    args = ap.parse_args()

    root = Path(args.root)
    if args.fresh and root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True, exist_ok=True)
    log = root / "rehearsal.log"
    times: dict = {}

    t0 = time.time()
    if not (root / "data" / "real_tiles").exists():
        synth(root)
    times["synth_s"] = round(time.time() - t0, 1)

    run_name = f"{MOUSE}_64_{GDIM}_all_4_ours"
    ckpt = root / "checkpoints" / run_name / "orbax"
    if not args.skip_train or not ckpt.exists():
        times["train_s"] = round(run_cli(
            ["tera_mind_tpu.cli.train", "--mouse", MOUSE,
             "--data_path", "data", "--batch", str(args.batch),
             "--max_steps", str(args.steps), "--packed",
             "--workers", "2", "--net_ch", str(args.net_ch)],
            cwd=root, log=log), 1)
        assert ckpt.exists(), f"train left no orbax ckpt at {ckpt}"

    def generate(out_tiles: Path, extra: list[str]) -> float:
        return run_cli(
            ["tera_mind_tpu.cli.generate", "--mouse", MOUSE,
             "--ckpt_pth", str(ckpt),
             "--data_path", str(root / "data" / "tst" / f"gene_{MOUSE}"),
             "--hst", str(HST), "--wst", str(WST),
             "--hnm", str(GEN_ROWS), "--wnm", str(GEN_COLS),
             "--stream", "--stream_block", "2",
             "--stream_dtype", "bfloat16", "--seed_backend", "jax",
             "--out_dir", str(out_tiles)] + extra,
            cwd=root, log=log)

    def check_tiles(out_tiles: Path) -> list[Path]:
        tiles = sorted(out_tiles.glob("*.npy"))
        assert len(tiles) == GEN_ROWS * GEN_COLS, tiles
        a = np.load(tiles[0])
        assert a.shape == (256, 256, 100) and np.isfinite(
            a.astype(np.float32)).all(), (a.shape, a.dtype)
        return tiles

    out_tiles = root / "out" / "tiles"
    times["generate_s"] = round(generate(out_tiles, []), 1)
    tiles = check_tiles(out_tiles)

    # int8_static deployment lane through the SAME CLI seams (the
    # promoted mode, BASELINE.md int8 story), on the trained weights
    out_int8 = root / "out" / "tiles_int8"
    times["generate_int8_s"] = round(
        generate(out_int8, ["--quant", "int8_static"]), 1)
    tiles_q = check_tiles(out_int8)

    # trained-weights chain quality: int8_static vs exact-bf16 tiles
    # (the gates in BASELINE.md were measured on random weights; this is
    # the same comparison on a genuinely trained checkpoint)
    diffs, ga, gb = [], [], []
    for a_p, b_p in zip(tiles, tiles_q):
        x = np.load(a_p).astype(np.float32)
        y = np.load(b_p).astype(np.float32)
        diffs.append(np.abs(x - y).ravel())
        ga.append(x.ravel())
        gb.append(y.ravel())
    d = np.concatenate(diffs)
    corr = float(np.corrcoef(np.concatenate(ga), np.concatenate(gb))[0, 1])
    int8_vs_bf16 = {"mean_abs": round(float(d.mean()), 5),
                    "p99": round(float(np.percentile(d, 99)), 4),
                    "max": round(float(d.max()), 4),
                    "corr": round(corr, 5)}

    times["assemble_s"] = round(run_cli(
        ["tera_mind_tpu.cli.assemble", "--gdir", str(out_tiles),
         "--odir", str(root / "out" / "wsi"),
         "--hst", str(HST), "--wst", str(WST),
         "--hnm", str(GEN_ROWS), "--wnm", str(GEN_COLS),
         "--slices", "0,25", "--preview"],
        cwd=root, log=log), 1)
    wsis = sorted((root / "out" / "wsi").glob("*.tif*"))
    assert wsis, "assemble produced no WSIs"

    def evaluate(gen_dir: Path, report: Path) -> float:
        return run_cli(
            ["tera_mind_tpu.cli.evaluate", "--gen_dir", str(gen_dir),
             "--real_dir", str(root / "data" / "real_tiles"),
             "--report", str(report)],
            cwd=root, log=log)

    report = root / "out" / "report.json"
    times["evaluate_s"] = round(evaluate(out_tiles, report), 1)
    rep = json.loads(report.read_text())
    report_q = root / "out" / "report_int8.json"
    times["evaluate_int8_s"] = round(evaluate(out_int8, report_q), 1)
    rep_q = json.loads(report_q.read_text())

    keys = ("n_tiles", "pool_fid", "psnr", "ssim")
    summary = {"phases_s": times,
               "train_steps": 0 if args.skip_train else args.steps,
               "n_tiles": len(tiles), "n_wsis": len(wsis),
               "eval": {k: rep[k] for k in keys if k in rep},
               "eval_int8": {k: rep_q[k] for k in keys if k in rep_q},
               "int8_vs_bf16": int8_vs_bf16}
    blob = json.dumps(summary, indent=1)
    (root / "summary.json").write_text(blob)
    # The cache root is ephemeral (wiped on host resets) — persist the
    # machine record next to the human one so the run survives the tree.
    durable = Path(__file__).resolve().parent.parent / "docs" / "rehearsal_summary.json"
    durable.write_text(blob)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
