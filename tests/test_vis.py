"""Figure-utility tests (pure numpy/PIL)."""

import numpy as np

from tera_mind_tpu.assembly.vis import (color_overlay, gen_roi, gen_zoom,
                                        metric_table, stitch_tiles, to_uint8)


def test_to_uint8_ranges():
    a = np.array([[-1.0, 0.0, 1.0]])
    np.testing.assert_array_equal(to_uint8(a), [[0, 127, 255]])
    b = np.array([[0.0, 0.5, 1.0]])
    np.testing.assert_array_equal(to_uint8(b), [[0, 127, 255]])


def test_gen_roi_outline_and_crop():
    img = np.zeros((64, 64), np.float32)
    img[20:30, 40:50] = 1.0
    roi, full = gen_roi(img, 16, 32, 24, 24, border=2, color=(255, 0, 0))
    assert roi.shape == (24, 24)
    assert roi.max() == 1.0
    # outline drawn in red on the annotated image
    assert (full[16:18, 32:56] == [255, 0, 0]).all()
    assert full.shape == (64, 64, 3)


def test_gen_zoom_scale():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    z = gen_zoom(img, 0, 0, 2, scale=3)
    assert z.shape == (6, 6)
    assert (z[:3, :3] == img[0, 0]).all()


def test_color_overlay_colors_high_regions():
    base = np.zeros((8, 8), np.float32)
    layer = np.zeros((8, 8), np.float32)
    layer[:4] = 1.0
    out = color_overlay(base, [layer], [(0.0, 1.0, 0.0)], alpha=1.0)
    assert out.shape == (8, 8, 3)
    assert out[0, 0, 1] == 255 and out[0, 0, 0] == 0  # pure green
    assert (out[6, 6] == 0).all()                      # untouched


def test_metric_table_alignment():
    rows = [{"name": "psnr", "value": 31.2}, {"name": "ssim", "value": 0.9}]
    txt = metric_table(rows, ["name", "value"])
    lines = txt.splitlines()
    assert len(lines) == 3 and "psnr" in lines[1]


def test_stitch_tiles():
    def read(r, c):
        return np.full((4, 4), r * 10 + c, np.float32)
    out = stitch_tiles(read, 2, 3, tile=4)
    assert out.shape == (8, 12)
    assert out[0, 0] == 0 and out[4, 8] == 12
    assert stitch_tiles(read, 9999, 2, tile=4) is None


def test_region_mask_modes():
    from tera_mind_tpu.assembly.vis import region_mask

    onto = np.ones((8, 8, 3), np.uint8) * 200
    assert region_mask(onto, "all").sum() == onto.sum()
    q = region_mask(onto, "quarter")
    assert q[:4, :4].all() and q[4:].sum() == 0 and q[:4, 4:].sum() == 0
    b = region_mask(onto, "bhalf")
    assert b[4:].all() and b[:4].sum() == 0
    t3 = region_mask(onto, "3quarter")
    assert t3[:4, 4:].sum() == 0 and t3[4:].all() and t3[:4, :4].all()
    with np.testing.assert_raises(ValueError):
        region_mask(onto, "nope")


def test_onto_overlay_composites_alpha():
    from tera_mind_tpu.assembly.vis import merge_mask, onto_overlay

    img = np.zeros((4, 4), np.uint8)
    onto = np.zeros((4, 4, 3), np.uint8)
    onto[0, 0] = (255, 0, 0)
    out = onto_overlay(img, onto, alpha=255)
    assert tuple(out[0, 0]) == (255, 0, 0)     # full alpha replaces
    assert out[1:].sum() == 0                  # mask-free pixels untouched
    half = onto_overlay(img, onto, alpha=128)
    assert 120 <= half[0, 0, 0] <= 136         # ~50% blend

    m = np.zeros((4, 4), np.uint8)
    m[2, 2] = 7
    got = merge_mask(img, m, alpha=255)
    assert tuple(got[2, 2]) == (255, 255, 255)
