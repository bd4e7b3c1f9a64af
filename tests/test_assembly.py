"""Native BigTIFF WSI writer tests (no jax — pure CPU)."""

import numpy as np
import pytest
from PIL import Image

from tera_mind_tpu.assembly.wsi import WsiWriter, assemble_slice, ome_xml


def _grid(rows, cols, tile=256):
    tiles = {}
    for r in range(rows):
        for c in range(cols):
            y, x = np.mgrid[0:tile, 0:tile]
            tiles[(r, c)] = ((y * (r + 1) + x * (c + 1)) % 251).astype(
                np.uint8)
    return tiles


def test_wsi_level0_bit_exact(tmp_path):
    tiles = _grid(2, 3)
    out = tmp_path / "wsi.tif"
    assemble_slice(lambda r, c: tiles[(r, c)], out, 2, 3, to_uint8=False)
    im = Image.open(out)
    arr = np.array(im)
    want = np.zeros((512, 768), np.uint8)
    for (r, c), t in tiles.items():
        want[r * 256:(r + 1) * 256, c * 256:(c + 1) * 256] = t
    np.testing.assert_array_equal(arr, want)


def test_wsi_pyramid_is_box_downsample(tmp_path):
    tiles = _grid(2, 2)
    out = tmp_path / "wsi.tif"
    assemble_slice(lambda r, c: tiles[(r, c)], out, 2, 2, to_uint8=False)
    im = Image.open(out)
    assert im.n_frames >= 2
    full = np.array(im).astype(np.float64)
    im.seek(1)
    lvl1 = np.array(im).astype(np.float64)
    ds = full.reshape(256, 2, 256, 2).mean((1, 3))
    # uint8 truncation in the cascade
    assert np.abs(lvl1 - ds).max() <= 1.0


def test_wsi_ome_metadata(tmp_path):
    tiles = _grid(1, 1)
    out = tmp_path / "wsi.tif"
    assemble_slice(lambda r, c: tiles[(r, c)], out, 1, 1, to_uint8=False)
    im = Image.open(out)
    desc = im.tag_v2.get(270, "")
    assert "OME" in desc and "SizeX=\"256\"" in desc


def test_wsi_large_many_levels(tmp_path):
    """8x8 tile slice -> multiple pyramid levels, consistent shapes."""
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (8 * 256, 8 * 256), np.uint8)
    out = tmp_path / "big.tif"
    w = WsiWriter(out, 2048, 2048)
    for ty in range(8):
        w.write_row_strip(ty, data[ty * 256:(ty + 1) * 256])
    w.close()
    im = Image.open(out)
    sizes = []
    for i in range(im.n_frames):
        im.seek(i)
        sizes.append(im.size)
    assert sizes[0] == (2048, 2048)
    for (w1, h1), (w2, h2) in zip(sizes, sizes[1:]):
        assert w2 == (w1 + 1) // 2 and h2 == (h1 + 1) // 2
    im.seek(0)
    np.testing.assert_array_equal(np.array(im), data)


def test_missing_tiles_are_blank(tmp_path):
    out = tmp_path / "sparse.tif"
    w = WsiWriter(out, 512, 512, levels=1)
    w.write_tile(0, 0, np.full((256, 256), 200, np.uint8))
    w.close()
    im = Image.open(out)
    arr = np.array(im)
    assert (arr[:256, :256] == 200).all()
    assert (arr[256:, 256:] == 0).all()


def test_wsi_jpeg_tiles(tmp_path):
    """JPEG-in-TIFF (compression 7) readable by PIL, near-lossless on
    smooth data (reference pyvips jpeg-in-tiff default, infer_brn.py:84-88).
    """
    out = tmp_path / "jp.tif"
    w = WsiWriter(out, 512, 512, compression="jpeg", quality=95)
    y, x = np.mgrid[0:512, 0:512]
    data = ((y + x) / 4 % 200).astype(np.uint8)  # smooth gradient
    for ty in range(2):
        w.write_row_strip(ty, data[ty * 256:(ty + 1) * 256])
    w.close()
    im = Image.open(out)
    arr = np.array(im)
    assert arr.shape == (512, 512)
    assert np.abs(arr.astype(int) - data.astype(int)).mean() < 3.0
    assert im.n_frames >= 2
