"""Tile store: the on-disk format for per-tile brain state and outputs.

The reference writes one zarr ``.zip`` per 256^2 tile per timestep, named
``{h0}_{h1}_{w0}_{w1}.zip`` (test_brn.py:219-226), and directories
``{out_dir}_{t}`` per timestep.  This store keeps the naming scheme (so the
assembly/eval tooling is interoperable) but uses either:

- 'npy'         — raw numpy per tile (fastest on local disk), or
- 'tensorstore' — zarr v2 driver via tensorstore (compressed, cloud-ready).

The tera-scale generator holds state in device memory and only spills here
for checkpoint/resume (``--cur_epoch`` parity, test_brn.py:291-292) and
final export.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def tile_name(h0: int, h1: int, w0: int, w1: int) -> str:
    return f"{h0}_{h1}_{w0}_{w1}"


class TileStore:
    def __init__(self, root: str | Path, fmt: str = "npy"):
        assert fmt in ("npy", "tensorstore")
        self.root = Path(root)
        self.fmt = fmt

    def _path(self, name: str) -> Path:
        ext = ".npy" if self.fmt == "npy" else ".zarr"
        return self.root / f"{name}{ext}"

    def create(self) -> "TileStore":
        self.root.mkdir(parents=True, exist_ok=True)
        return self

    def delete(self) -> None:
        if self.root.is_dir():
            shutil.rmtree(self.root)

    def exists(self) -> bool:
        return self.root.is_dir()

    def write(self, name: str, arr: np.ndarray) -> None:
        p = self._path(name)
        if self.fmt == "npy":
            tmp = p.with_suffix(".tmp.npy")
            np.save(tmp, arr)
            tmp.replace(p)
        else:
            import tensorstore as ts
            spec = {
                "driver": "zarr",
                "kvstore": {"driver": "file", "path": str(p)},
                "metadata": {"shape": list(arr.shape),
                             "dtype": _zarr_dtype(arr.dtype),
                             "chunks": list(arr.shape)},
                "create": True, "delete_existing": True,
            }
            ts.open(spec).result()[...] = arr

    def read(self, name: str) -> np.ndarray:
        p = self._path(name)
        if self.fmt == "npy":
            return np.load(p)
        import tensorstore as ts
        spec = {"driver": "zarr",
                "kvstore": {"driver": "file", "path": str(p)}}
        return np.asarray(ts.open(spec).result())

    def has(self, name: str) -> bool:
        return self._path(name).exists()

    def names(self) -> list[str]:
        ext = ".npy" if self.fmt == "npy" else ".zarr"
        return sorted(p.name[: -len(ext)] for p in self.root.glob(f"*{ext}"))


def _zarr_dtype(dt: np.dtype) -> str:
    dt = np.dtype(dt)
    return dt.str


class StateCheckpoint:
    """Timestep-indexed spill of the tera-scale sampling state.

    Layout: ``{base}_{t}/`` like the reference's per-epoch dirs
    (test_brn.py:241-250), each holding the full tile grid plus a manifest,
    enabling restart from any checkpointed timestep.
    """

    def __init__(self, base: str | Path, fmt: str = "npy"):
        """fmt: 'npy'/'tensorstore' = one file per tile (interoperable with
        the assembly/eval tooling); 'grid' = ONE state file per timestep —
        ~20x faster spills at large grids (per-tile python writes became
        the dominant cost of checkpointed whole-brain runs)."""
        assert fmt in ("npy", "tensorstore", "grid")
        self.base = Path(base)
        self.fmt = fmt

    def store_for(self, t: int) -> TileStore:
        assert self.fmt != "grid"
        return TileStore(Path(f"{self.base}_{t}"), self.fmt)

    def save_grid(self, t: int, state: np.ndarray, *, hst: int, wst: int,
                  size: int = 256, dtype=np.float16) -> None:
        """state: (rows, cols, size, size, C) channels-last tile grid.

        A per-tile CRC32 goes into the manifest so resume can detect torn
        or corrupted spills (the reference's analog is the
        ``assert (stp == epoch).all()`` state-protocol guard,
        test_brn.py:178 — here extended to content integrity)."""
        import zlib

        if self.fmt == "grid":
            root = Path(f"{self.base}_{t}")
            root.mkdir(parents=True, exist_ok=True)
            arr = np.ascontiguousarray(state.astype(dtype))
            tmp = root / "state.tmp.npy"
            np.save(tmp, arr)
            tmp.replace(root / "state.npy")
            rows, cols = state.shape[:2]
            meta = {"t": t, "rows": rows, "cols": cols, "hst": hst,
                    "wst": wst, "size": size,
                    "channels": int(state.shape[-1]),
                    "crc32": {"state": zlib.crc32(arr.tobytes())}}
            mtmp = root / "manifest.json.tmp"
            mtmp.write_text(json.dumps(meta))
            mtmp.replace(root / "manifest.json")
            return

        store = self.store_for(t).create()
        rows, cols = state.shape[:2]
        sums = {}
        for r in range(rows):
            for c in range(cols):
                h0, w0 = hst + r * size, wst + c * size
                arr = np.ascontiguousarray(state[r, c].astype(dtype))
                nm = tile_name(h0, h0 + size, w0, w0 + size)
                store.write(nm, arr)
                sums[nm] = zlib.crc32(arr.tobytes())
        meta = {"t": t, "rows": rows, "cols": cols, "hst": hst, "wst": wst,
                "size": size, "channels": int(state.shape[-1]),
                "crc32": sums}
        tmp = store.root / "manifest.json.tmp"
        tmp.write_text(json.dumps(meta))
        tmp.replace(store.root / "manifest.json")

    def load_grid(self, t: int, *, verify: bool = True
                  ) -> Tuple[np.ndarray, dict]:
        """Load a spilled grid; with ``verify`` checks each tile's CRC32
        against the manifest and raises on corruption."""
        import zlib

        if self.fmt == "grid":
            root = Path(f"{self.base}_{t}")
            meta = json.loads((root / "manifest.json").read_text())
            arr = np.load(root / "state.npy")
            if verify and "state" in meta.get("crc32", {}):
                got = zlib.crc32(np.ascontiguousarray(arr).tobytes())
                want = meta["crc32"]["state"]
                if got != want:
                    raise IOError(
                        f"grid checkpoint at t={t} is corrupted "
                        f"(crc {got:#x} != manifest {want:#x})")
            return arr.astype(np.float32), meta

        store = self.store_for(t)
        meta = json.loads((store.root / "manifest.json").read_text())
        rows, cols, size = meta["rows"], meta["cols"], meta["size"]
        sums = meta.get("crc32", {})
        state = np.zeros((rows, cols, size, size, meta["channels"]),
                         np.float32)
        for r in range(rows):
            for c in range(cols):
                h0 = meta["hst"] + r * size
                w0 = meta["wst"] + c * size
                nm = tile_name(h0, h0 + size, w0, w0 + size)
                arr = store.read(nm)
                if verify and nm in sums:
                    got = zlib.crc32(np.ascontiguousarray(arr).tobytes())
                    if got != sums[nm]:
                        raise IOError(
                            f"checkpoint tile {nm} at t={t} is corrupted "
                            f"(crc {got:#x} != manifest {sums[nm]:#x})")
                state[r, c] = arr
        return state, meta

    def latest(self) -> Optional[int]:
        best = None
        for p in self.base.parent.glob(f"{self.base.name}_*"):
            try:
                t = int(p.name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if (p / "manifest.json").exists():
                best = t if best is None else max(best, t)
        return best

    def prune(self, keep_t: int) -> None:
        """Delete all checkpoints except timestep ``keep_t``
        (the reference deletes the previous epoch dir once the next one is
        complete, test_brn.py:241-244, 270-273)."""
        for p in self.base.parent.glob(f"{self.base.name}_*"):
            try:
                t = int(p.name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if t != keep_t:
                shutil.rmtree(p)
