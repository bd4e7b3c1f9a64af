"""Data-pipeline invariants, porting the reference's embedded debug
assertions as real tests (SURVEY.md section 4: MBADataset._gene_test,
_trans_test_sp, COO==dense)."""

import numpy as np
import pytest

from tera_mind_tpu.data.coo import COO
from tera_mind_tpu.data.dataset import SPAD, SyntheticDataset, batches
from tera_mind_tpu.data.noise import lcg, tile_init_noise, tile_seed


def rand_coo(rng, shape, nnz):
    coords = np.stack([rng.integers(0, s, nnz) for s in shape])
    data = rng.integers(1, 10, nnz).astype(np.float32)
    return COO(coords, data, shape)


def test_dense_roundtrip_merges_duplicates():
    coo = COO(np.array([[0, 0], [1, 1], [2, 2]]),
              np.array([3.0, 4.0]), (2, 2, 3))
    d = coo.todense()
    assert d[0, 1, 2] == 7.0
    assert d.sum() == 7.0


def test_block_sum_equals_dense_blocks():
    """Reference MBADataset._gene_test (MBADataset.py:187-199)."""
    rng = np.random.default_rng(0)
    coo = rand_coo(rng, (32, 32, 5), 200)
    blk = coo.block_sum(8)
    dense = coo.todense()
    want = dense.reshape(4, 8, 4, 8, 5).sum((1, 3))
    np.testing.assert_allclose(blk.todense(), want)


def test_rot_flip_matches_dense():
    """Reference MBADataset._trans_test_sp (MBADataset.py:172-185)."""
    rng = np.random.default_rng(1)
    coo = rand_coo(rng, (6, 4, 2), 15)
    dense = coo.todense()
    r = coo.rot90()
    np.testing.assert_allclose(r.todense(), np.rot90(dense, 1, (0, 1)))
    rr = coo.rot90().rot90().rot90().rot90()
    np.testing.assert_allclose(rr.todense(), dense)
    f = coo.flip_w()
    np.testing.assert_allclose(f.todense(), dense[:, ::-1])


def test_crop_pad_slice_channels():
    rng = np.random.default_rng(2)
    coo = rand_coo(rng, (16, 16, 10), 60)
    dense = coo.todense()
    c = coo.crop2d(4, 2, 8, 8)
    np.testing.assert_allclose(c.todense(), dense[4:12, 2:10])
    p = coo.pad_channels(3, 2)
    np.testing.assert_allclose(p.todense()[:, :, 3:13], dense)
    s = coo.slice_channels(2, 7)
    np.testing.assert_allclose(s.todense(), dense[:, :, 2:7])
    sp = coo.pad_spatial(2)
    np.testing.assert_allclose(sp.todense()[2:18, 2:18], dense)


def test_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    coo = rand_coo(rng, (8, 8, 4), 20)
    coo.save_npz(tmp_path / "t.npz")
    back = COO.load_npz(tmp_path / "t.npz")
    np.testing.assert_allclose(back.todense(), coo.todense())


def test_lcg_reference_constants():
    """lcg must match the reference exactly (MBADataset_tst.py:13) — the
    whole-brain halo protocol depends on it."""
    assert lcg(0) == 12345
    assert lcg(1) == (1103515245 + 12345) % 2 ** 31
    assert tile_seed(2, 3, 416) == lcg(2 * 416 + 3)


def test_tile_noise_deterministic_and_torch_compatible():
    a = tile_init_noise(5, 7, 416, (4, 4, 2), backend="torch")
    b = tile_init_noise(5, 7, 416, (4, 4, 2), backend="torch")
    np.testing.assert_array_equal(a, b)
    # bit-exact with direct torch manual_seed + randn
    import torch
    g = torch.Generator().manual_seed(lcg(5 * 416 + 7))
    want = torch.randn((4, 4, 2), generator=g).numpy()
    np.testing.assert_array_equal(a, want)


def test_synthetic_dataset_shapes_and_batching():
    ds = SyntheticDataset(n=8, crop=64, gdim=8, gblk=16, snum=4,
                          stain="all", pad_bins=1)
    s = ds.sample(0)
    assert s.image.shape == (64, 64, 4)
    assert s.rna.shape == (6, 6, 32)
    assert s.image.min() >= -1 and s.image.max() <= 1
    bs = list(batches(ds, 4))
    assert len(bs) == 2
    assert bs[0]["image"].shape == (4, 64, 64, 4)
    assert bs[0]["rna"].shape == (4, 6, 6, 32)
    # determinism
    s2 = ds.sample(0)
    np.testing.assert_array_equal(s.image, s2.image)


def test_spad_table():
    """(50 + 2*spad) / (snum/2) - 1 must be integral (MBADataset.py:34-36)."""
    for snum, spad in SPAD.items():
        if snum in (None, 1):
            continue
        assert (50 + 2 * spad - snum) % (snum // 2) == 0


def test_load_tile_image_zarr_zip(tmp_path):
    """Reference per-tile zarr .zip images read via tensorstore
    (MBADataset.py:100-102 parity)."""
    import zipfile
    import tensorstore as ts
    from tera_mind_tpu.data.dataset import load_tile_image

    arr = np.arange(4 * 8 * 8, dtype=np.uint8).reshape(4, 8, 8)
    zdir = tmp_path / "t.zarr"
    spec = {"driver": "zarr",
            "kvstore": {"driver": "file", "path": str(zdir)},
            "metadata": {"shape": [4, 8, 8], "dtype": "|u1",
                         "chunks": [4, 8, 8]},
            "create": True}
    ts.open(spec).result()[...] = arr
    zp = tmp_path / "t.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for f in zdir.iterdir():
            z.write(f, f.name)

    im = load_tile_image(zp)
    got = np.asarray(im[:, 2:6, 1:5])
    np.testing.assert_array_equal(got, arr[:, 2:6, 1:5])


def test_merfish_train_dataset_reference_format(tmp_path):
    """End-to-end: reference-format per-tile files (sparse gene .npz +
    (100, H, W) image) -> MerfishTrainDataset crops with the reference's
    shape/binning/normalization semantics (MBADataset.py:69-152)."""
    from tera_mind_tpu.data.dataset import MerfishTrainDataset, batches

    rng = np.random.default_rng(7)
    H = W = 96
    gdim, zmax = 12, 50
    gdir = tmp_path / "gene_m"
    idir = tmp_path / "img_m"
    gdir.mkdir(); idir.mkdir()
    for nm in ("a", "b"):
        coo = rand_coo(rng, (H, W, zmax * gdim), 800)
        coo.save_npz(gdir / f"{nm}.npz")
        img = rng.integers(0, 255, (100, H, W)).astype(np.uint8)
        np.save(idir / f"{nm}.npy", img)

    ds = MerfishTrainDataset([gdir / "a.npz", gdir / "b.npz"],
                             gdim=gdim, gblk=16, crop=64, snum=4,
                             stain="all", pad_bins=2, repeat=2, seed=1)
    s = ds.sample(0)
    # image: 64^2 crop, 2 stains x 2 z voxels, [-1, 1]
    assert s.image.shape == (64, 64, 4)
    assert s.image.min() >= -1.0 and s.image.max() <= 1.0
    # gene grid: 64/16=4 bins + 2*2 pad bins, snum*gdim dense channels
    assert s.rna.shape == (8, 8, 4 * gdim)
    assert (s.rna >= 0).all()
    # interior bins carry the cropped counts; pad ring is zero
    assert s.rna[:2].sum() == 0 and s.rna[:, :2].sum() == 0

    b = next(iter(batches(ds, 2)))
    assert b["image"].shape == (2, 64, 64, 4)
    assert b["rna"].shape == (2, 8, 8, 4 * gdim)


def test_compact_dataset_bit_exact(tmp_path):
    """compact=True emits RAW uint8 image + uint16 counts whose device
    decode (harness._decode_batch) reproduces the float32 sample
    BIT-exactly — the transfer-compression path cli.train defaults to
    (2.3x fewer host->device bytes per batch)."""
    import jax.numpy as jnp

    from tera_mind_tpu.data.dataset import MerfishTrainDataset
    from tera_mind_tpu.training.harness import _decode_batch

    rng = np.random.default_rng(3)
    H = W = 96
    gdim, zmax = 12, 50
    gdir = tmp_path / "gene_m"
    idir = tmp_path / "img_m"
    gdir.mkdir(); idir.mkdir()
    coo = rand_coo(rng, (H, W, zmax * gdim), 800)
    coo.save_npz(gdir / "a.npz")
    np.save(idir / "a.npy",
            rng.integers(0, 255, (100, H, W)).astype(np.uint8))

    kw = dict(gdim=gdim, gblk=16, crop=64, snum=4, stain="all",
              pad_bins=2, repeat=1, seed=9)
    a = MerfishTrainDataset([gdir / "a.npz"], **kw).sample(0)
    b = MerfishTrainDataset([gdir / "a.npz"], **kw, compact=True).sample(0)
    assert b.image.dtype == np.uint8 and b.rna.dtype == np.uint16
    img, rna = _decode_batch(jnp.asarray(b.image), jnp.asarray(b.rna))
    np.testing.assert_array_equal(np.asarray(img), a.image)
    np.testing.assert_array_equal(np.asarray(rna), a.rna)


def test_multiworker_batches_match_sample_set():
    """workers>0 (process pool) yields the same multiset of samples as the
    dataset defines, batched correctly (reference DataLoader fork workers,
    config.py:253-278)."""
    from tera_mind_tpu.data.dataset import SyntheticDataset, batches
    ds = SyntheticDataset(n=12, crop=32, gdim=4, snum=4, stain="all",
                          pad_bins=1)
    got = list(batches(ds, 4, workers=2, drop_last=False))
    assert sum(b["image"].shape[0] for b in got) == 12
    assert got[0]["image"].shape[1:] == (32, 32, 4)
    # deterministic dataset => the multiset of sample checksums matches
    want_sums = sorted(float(ds.sample(i).image.sum()) for i in range(12))
    got_sums = sorted(float(img.sum()) for b in got for img in b["image"])
    np.testing.assert_allclose(got_sums, want_sums, rtol=1e-6)
