"""WSI assembly: generated tile store -> pyramidal OME-BigTIFF per slice.

Replaces the reference's pyvips arrayjoin pipeline (infer_brn.py:57-105:
per-column TIFFs, then a horizontal arrayjoin into a pyramidal bigtiff with
minimal OME-XML so QuPath reads it).  Here a native C++ writer
(cpp/wsi_tiff.cc) streams 256^2 tiles into a tiled pyramidal BigTIFF while
Python walks the tile grid column-block by column-block and builds the
pyramid levels incrementally — nothing ever holds the 73k x 106k px slice
in memory.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Callable, Optional

import numpy as np

_CPP_DIR = Path(__file__).parent / "cpp"
_LIB: Optional[ctypes.CDLL] = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        so = _CPP_DIR / "libwsitiff.so"
        src = _CPP_DIR / "wsi_tiff.cc"
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(so),
                 str(src), "-lz", "-ljpeg"], check=True)
        lib = ctypes.CDLL(str(so))
        lib.wsi_open.restype = ctypes.c_void_p
        lib.wsi_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                 ctypes.c_uint64, ctypes.c_uint32,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_char_p]
        lib.wsi_write_tile.restype = ctypes.c_int
        lib.wsi_write_tile.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_uint32, ctypes.c_uint32,
                                       ctypes.c_char_p]
        lib.wsi_close.restype = ctypes.c_int
        lib.wsi_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def ome_xml(width: int, height: int, channels: int = 1,
            dtype: str = "uint8") -> str:
    """Minimal OME metadata QuPath accepts (reference infer_brn.py:11-54)."""
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06"
    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
    xsi:schemaLocation="http://www.openmicroscopy.org/Schemas/OME/2016-06 http://www.openmicroscopy.org/Schemas/OME/2016-06/ome.xsd">
    <Image ID="Image:0">
        <Pixels DimensionOrder="XYCZT"
                ID="Pixels:0"
                SizeC="{channels}"
                SizeT="1"
                SizeX="{width}"
                SizeY="{height}"
                SizeZ="1"
                Type="{dtype}">
        </Pixels>
    </Image>
</OME>"""


class WsiWriter:
    """Streaming pyramidal BigTIFF writer (grayscale uint8, 256^2 tiles)."""

    def __init__(self, path: str | Path, width: int, height: int, *,
                 tile: int = 256, levels: Optional[int] = None,
                 compression: str = "deflate", zlevel: int = 6,
                 quality: int = 90,
                 description: Optional[str] = None):
        self.tile = tile
        self.width, self.height = width, height
        if levels is None:
            levels = 1
            w, h = width, height
            while max(w, h) > tile:
                w, h = (w + 1) // 2, (h + 1) // 2
                levels += 1
        self.levels = levels
        comp = {"none": 1, "jpeg": 7, "deflate": 8}[compression]
        if compression == "jpeg":
            zlevel = quality  # the native writer reuses the level slot
        desc = description if description is not None \
            else ome_xml(width, height)
        self._h = _lib().wsi_open(str(path).encode(), width, height, tile,
                                  levels, comp, zlevel, desc.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")
        # incremental pyramid: per level, a strip accumulator of rows
        self._strips = {}
        self._strip_rows = {}
        for lv in range(1, levels):
            lw = self._level_w(lv)
            self._strips[lv] = np.zeros((tile, lw), np.float32)
            self._strip_rows[lv] = 0

    def _level_w(self, lv: int) -> int:
        w = self.width
        for _ in range(lv):
            w = (w + 1) // 2
        return w

    def _level_h(self, lv: int) -> int:
        h = self.height
        for _ in range(lv):
            h = (h + 1) // 2
        return h

    def write_tile(self, tx: int, ty: int, data: np.ndarray,
                   level: int = 0) -> None:
        data = np.ascontiguousarray(data, np.uint8)
        if data.shape != (self.tile, self.tile):
            padded = np.zeros((self.tile, self.tile), np.uint8)
            padded[:data.shape[0], :data.shape[1]] = data
            data = padded
        rc = _lib().wsi_write_tile(self._h, level, tx, ty,
                                   data.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise OSError(f"wsi_write_tile failed rc={rc}")

    # ---- streaming row-strip API: feed level-0 rows, pyramid is derived --
    def write_row_strip(self, ty: int, strip: np.ndarray) -> None:
        """strip: (tile, width) uint8 — one full row of level-0 pixels."""
        t = self.tile
        for tx in range(0, (self.width + t - 1) // t):
            self.write_tile(tx, ty, strip[:, tx * t:(tx + 1) * t])
        self._cascade(1, strip.astype(np.float32))

    def _cascade(self, lv: int, rows: np.ndarray) -> None:
        """Push level-(lv-1) rows into level lv's accumulator."""
        if lv >= self.levels:
            return
        h, w = rows.shape
        h2, w2 = h // 2, self._level_w(lv)
        # 2x box downsample with edge handling
        we = w // 2 * 2
        ds = rows[: h2 * 2, :we].reshape(h2, 2, we // 2, 2).mean((1, 3))
        if ds.shape[1] < w2:  # odd width: replicate last column
            ds = np.concatenate([ds, ds[:, -1:]], axis=1)
        ds = ds[:, :w2]
        strip = self._strips[lv]
        r = self._strip_rows[lv]
        take = min(self.tile - r, ds.shape[0])
        strip[r: r + take] = ds[:take]
        self._strip_rows[lv] = r + take
        if self._strip_rows[lv] == self.tile:
            ty = getattr(self, f"_emitted_{lv}", 0)
            u8 = np.clip(strip, 0, 255).astype(np.uint8)
            t = self.tile
            for tx in range(0, (self._level_w(lv) + t - 1) // t):
                self.write_tile(tx, ty, u8[:, tx * t:(tx + 1) * t],
                                level=lv)
            setattr(self, f"_emitted_{lv}", ty + 1)
            self._cascade(lv + 1, strip.copy())
            self._strip_rows[lv] = 0
        if take < ds.shape[0]:  # leftover rows
            rest = ds[take:]
            strip[: rest.shape[0]] = rest
            self._strip_rows[lv] = rest.shape[0]

    def close(self) -> None:
        # flush partial strips (bottom edge)
        for lv in range(1, self.levels):
            r = self._strip_rows[lv]
            if r > 0 and getattr(self, f"_emitted_{lv}", 0) * self.tile \
                    < self._level_h(lv):
                u8 = np.clip(self._strips[lv][:r], 0, 255).astype(np.uint8)
                ty = getattr(self, f"_emitted_{lv}", 0)
                t = self.tile
                for tx in range(0, (self._level_w(lv) + t - 1) // t):
                    self.write_tile(tx, ty, u8[:, tx * t:(tx + 1) * t],
                                    level=lv)
                setattr(self, f"_emitted_{lv}", ty + 1)
                self._cascade(lv + 1, self._strips[lv][:r].copy())
                self._strip_rows[lv] = 0
        rc = _lib().wsi_close(self._h)
        self._h = None
        if rc != 0:
            raise OSError(f"wsi_close failed rc={rc}")


def assemble_slice(read_tile: Callable[[int, int], np.ndarray],
                   out_path: str | Path, rows: int, cols: int, *,
                   tile: int = 256, channel: int = 0,
                   to_uint8: bool = True) -> None:
    """Assemble one z-slice WSI from a (rows x cols) tile grid.

    read_tile(r, c) -> (tile, tile) float in [-1,1] or uint8 for the chosen
    slice channel; tiles are streamed row by row.
    """
    writer = WsiWriter(out_path, cols * tile, rows * tile)
    for r in range(rows):
        strip = np.zeros((tile, cols * tile), np.uint8)
        for c in range(cols):
            d = read_tile(r, c)
            if to_uint8 and d.dtype != np.uint8:
                d = np.clip((d.astype(np.float32) + 1) * 127.5, 0,
                            255).astype(np.uint8)
            strip[:, c * tile:(c + 1) * tile] = d
        writer.write_row_strip(r, strip)
    writer.close()
