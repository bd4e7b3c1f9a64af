"""Figure-generation utilities (capability parity with the reference's
utils/vis_mba.py: ROI extraction, zoom insets, colored overlays,
attention-brain composites — reimplemented on numpy/PIL/cv2).

All images are channels-last numpy; WSI-scale inputs are read through the
tile store, never materialized whole.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional, Sequence, Tuple

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] or [0,1] float -> uint8."""
    x = np.asarray(img, np.float32)
    if x.min() < 0:
        x = (x + 1) / 2
    return np.clip(x * 255, 0, 255).astype(np.uint8)


def gen_roi(img: np.ndarray, top: int, left: int, h: int, w: int,
            border: int = 4,
            color: Tuple[int, int, int] = (255, 0, 0)
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Crop an ROI and return (roi, annotated_full) with the ROI outlined
    (reference vis_mba.py:80-115)."""
    roi = img[top:top + h, left:left + w].copy()
    full = np.stack([to_uint8(img)] * 3, -1) if img.ndim == 2 \
        else to_uint8(img).copy()
    c = np.asarray(color, np.uint8)
    full[top:top + border, left:left + w] = c
    full[top + h - border:top + h, left:left + w] = c
    full[top:top + h, left:left + border] = c
    full[top:top + h, left + w - border:left + w] = c
    return roi, full


def gen_zoom(img: np.ndarray, top: int, left: int, size: int,
             scale: int = 4) -> np.ndarray:
    """Nearest-neighbor zoom inset (reference vis_mba.py:182-239)."""
    roi = img[top:top + size, left:left + size]
    return np.repeat(np.repeat(roi, scale, axis=0), scale, axis=1)


def color_overlay(base: np.ndarray,
                  layers: Sequence[np.ndarray],
                  colors: Sequence[Tuple[float, float, float]],
                  alpha: float = 0.7) -> np.ndarray:
    """Compose intensity maps over a grayscale base with additive colors
    (reference onto_overlay / attention overlays, vis_mba.py:118-179,
    365-393; pathway palettes in constants.CM)."""
    g = to_uint8(base).astype(np.float32)
    out = np.stack([g] * 3, -1)
    for layer, col in zip(layers, colors):
        l01 = np.asarray(layer, np.float32)
        rng = l01.max() - l01.min()
        if rng > 0:
            l01 = (l01 - l01.min()) / rng
        for ch in range(3):
            out[..., ch] = out[..., ch] * (1 - alpha * l01) \
                + 255.0 * col[ch] * alpha * l01
    return np.clip(out, 0, 255).astype(np.uint8)


def metric_table(rows: Iterable[dict], columns: Sequence[str]) -> str:
    """CSV-ish metric table rendering (vis_mba.py:241-275 reshapes metric
    CSVs for the paper; here: plain aligned text)."""
    rows = list(rows)
    widths = {c: max(len(c), *(len(f"{r.get(c, '')}") for r in rows))
              for c in columns}
    out = ["  ".join(c.ljust(widths[c]) for c in columns)]
    for r in rows:
        out.append("  ".join(f"{r.get(c, '')}".ljust(widths[c])
                             for c in columns))
    return "\n".join(out)


def save_png(img: np.ndarray, path: str | Path) -> None:
    from PIL import Image
    arr = to_uint8(img) if img.dtype != np.uint8 else img
    Image.fromarray(arr).save(path)


def stitch_tiles(read_tile, rows: int, cols: int, tile: int = 256,
                 max_px: int = 16384) -> Optional[np.ndarray]:
    """Stitch a small grid for figures; refuses WSI-scale requests."""
    if rows * tile > max_px or cols * tile > max_px:
        return None
    out = None
    for r in range(rows):
        for c in range(cols):
            t = np.asarray(read_tile(r, c))
            if out is None:
                out = np.zeros((rows * tile, cols * tile) + t.shape[2:],
                               t.dtype)
            out[r * tile:(r + 1) * tile, c * tile:(c + 1) * tile] = t
    return out
