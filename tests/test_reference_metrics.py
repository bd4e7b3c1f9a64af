"""Metric-math cross-checks vs the reference's LIVE torch implementations.

Asserts numerical equality (<=1e-6 relative) of our jax/numpy metric stack
against CTPLab/Tera-MIND utils/metrics.py (PSNR:201-215, SSIM/MS-SSIM:
266-541, d-FID eig-trick + moments:56-122) and utils/inft_mba.py:17-45
(Welford OnlineVariance with per-gene masked counts)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tera_mind_tpu.metrics.fid import (StreamingMoments,  # noqa: E402
                                       frechet_distance)
from tera_mind_tpu.metrics.ssim import ms_ssim, psnr, ssim  # noqa: E402
from tera_mind_tpu.metrics.stats import OnlineVariance  # noqa: E402

from reference_compat import import_reference_metrics  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    ref_metrics, ref_inft = import_reference_metrics()
    return ref_metrics, ref_inft


def test_psnr_matches_reference(ref):
    ref_metrics, _ = ref
    rng = np.random.default_rng(0)
    a = rng.random((2, 64, 64, 1)).astype(np.float32) * 255
    b = rng.random((2, 64, 64, 1)).astype(np.float32) * 255
    want = ref_metrics.PSNR(mval=255.0)(
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(psnr(a, b, data_range=255.0))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ssim_matches_reference(ref):
    ref_metrics, _ = ref
    rng = np.random.default_rng(1)
    a = rng.random((2, 96, 96, 1)).astype(np.float64)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1)
    want = float(ref_metrics.ssim(
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)), data_range=1.0))
    got = float(np.asarray(ssim(a, b, data_range=1.0)).mean())
    assert abs(got - want) < 1e-6, (got, want)


def test_ms_ssim_matches_reference(ref):
    ref_metrics, _ = ref
    rng = np.random.default_rng(2)
    a = rng.random((1, 192, 192, 1)).astype(np.float64)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1)
    want = float(ref_metrics.ms_ssim(
        torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)), data_range=1.0))
    got = float(np.asarray(ms_ssim(a, b, data_range=1.0)).mean())
    assert abs(got - want) < 1e-6, (got, want)


def test_d_fid_matches_reference(ref):
    """Our streaming moments + eig-trick distance == reference
    calc_mean_var + calc_d_fid on the same raw features."""
    ref_metrics, _ = ref
    rng = np.random.default_rng(3)
    d, n1, n2 = 16, 200, 150
    x = rng.standard_normal((n1, d))
    y = 0.5 * rng.standard_normal((n2, d)) + 0.3

    # reference accumulates sum + second-moment and normalizes (ML cov)
    def torch_moments(f):
        t = torch.from_numpy(f)
        mu = t.sum(0)
        scm = t.T @ t
        tot = torch.tensor([float(len(f))])
        return ref_metrics.calc_mean_var(mu[None], scm[None], tot)

    (mu1, s1), (mu2, s2) = torch_moments(x), torch_moments(y)
    want = float(ref_metrics.calc_d_fid(mu1[0], mu2[0], s1[0], s2[0]))

    a, b = StreamingMoments(d), StreamingMoments(d)
    a.add(x[:50]), a.add(x[50:])        # streaming in chunks
    b.add(y)
    got = frechet_distance(*a.finalize(ddof=0), *b.finalize(ddof=0))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_d_fid3_batched_matches_reference(ref):
    """Per-slice batched d-FID (calc_d_fid3, metrics.py:100-116)."""
    ref_metrics, _ = ref
    rng = np.random.default_rng(4)
    d, n = 8, 120
    fids_ref, fids_ours = [], []
    mus1, mus2, ss1, ss2 = [], [], [], []
    for s in range(3):
        x = rng.standard_normal((n, d)) + s
        y = rng.standard_normal((n, d)) * (1 + 0.1 * s)
        a, b = StreamingMoments(d), StreamingMoments(d)
        a.add(x), b.add(y)
        mu1, c1 = a.finalize(ddof=0)
        mu2, c2 = b.finalize(ddof=0)
        fids_ours.append(frechet_distance(mu1, c1, mu2, c2))
        mus1.append(mu1), mus2.append(mu2), ss1.append(c1), ss2.append(c2)
    want = ref_metrics.calc_d_fid3(
        torch.tensor(np.stack(mus1)), torch.tensor(np.stack(mus2)),
        torch.tensor(np.stack(ss1)), torch.tensor(np.stack(ss2))).numpy()
    np.testing.assert_allclose(np.array(fids_ours), want, rtol=1e-9)


def test_online_variance_masked_matches_reference(ref):
    """Per-gene masked Welford vs the reference's include(dat, bat)."""
    _, ref_inft = ref
    rng = np.random.default_rng(5)
    g = 6
    ours = OnlineVariance(g)
    theirs = ref_inft.OnlineVariance(ddof=1)
    theirs.mean = torch.zeros(g, dtype=torch.float64)
    theirs.M2 = torch.zeros(g, dtype=torch.float64)
    theirs.n = torch.zeros(g, dtype=torch.float64)
    for _ in range(5):
        dat = rng.standard_normal((7, g))
        bat = (rng.random((7, g)) < 0.7).astype(np.float64)
        # the reference applies rows sequentially inside include(); ours is
        # a batched pairwise merge — same result up to float error
        theirs.include(torch.from_numpy(dat), torch.from_numpy(bat))
        ours.update(dat, bat)
    np.testing.assert_allclose(ours.mean, theirs.mean.numpy(), rtol=1e-8)
    np.testing.assert_allclose(ours.std, theirs.std.numpy(), rtol=1e-6)
    np.testing.assert_allclose(ours.n, theirs.n.numpy())


def _synthetic_nuclei(rng, b=5, c=2, h=64, w=64, black=(2,)):
    """Synthetic label masks + images: disks of varying radius rendered
    bright on a dim background; slice indices in ``black`` are all-zero
    (invalid per the reference's (img[v,0]!=0).any() filter)."""
    imgs = np.zeros((b, c, h, w), np.uint8)
    masks = []
    yy, xx = np.mgrid[:h, :w]
    for v in range(b):
        if v in black:
            continue
        lab = np.zeros((h, w), np.int32)
        n = int(rng.integers(3, 9))
        for k in range(1, n + 1):
            cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
            r = int(rng.integers(3, 7))
            lab[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = k
        img = np.full((h, w), 30, np.uint8)
        img[lab > 0] = 180
        imgs[v, 0] = img
        for ch in range(1, c):
            imgs[v, ch] = (img * 0.5).astype(np.uint8)
        masks.append(lab)
    return imgs, masks


def test_cellpose_stats_match_reference(ref):
    """Mask→stats math vs the reference's LIVE calc_cellpose
    (utils/metrics.py:153-191), segmentation factored out: a fake
    cellpose model returns identical synthetic label masks to both."""
    from tera_mind_tpu.metrics.morphology import stats_from_masks

    ref_metrics, _ = ref
    rng = np.random.default_rng(11)
    imgs, masks = _synthetic_nuclei(rng)

    class FakeCellpose:
        def eval(self, im_lst, diameter=None, normalize=False,
                 channels=None):
            # the reference hands cellpose the /255. channel-0 slices of
            # every valid (non-black) tile, in slice order (metrics.py:158-172)
            assert len(im_lst) == len(masks)
            for im, lab in zip(im_lst, masks):
                assert im.shape == lab.shape
            return list(masks), None, None, None

    met = {"nstat": [], "narea": [], "valid": []}
    ref_metrics.calc_cellpose(imgs, FakeCellpose(), met, None, "roi",
                              debug=False)
    got = stats_from_masks(imgs, masks)
    assert got is not None
    nstat, narea, valid = got
    np.testing.assert_allclose(nstat, met["nstat"][0].numpy(), rtol=1e-12)
    np.testing.assert_allclose(narea, met["narea"][0].numpy(), rtol=1e-12)
    assert valid == list(met["valid"][0])

    # all-black input: both sides report "nothing to score"
    blank = np.zeros_like(imgs)
    met2 = {"nstat": [], "narea": [], "valid": []}
    ref_metrics.calc_cellpose(blank, FakeCellpose(), met2, None, "roi",
                              debug=False)
    assert stats_from_masks(blank, []) is None and not met2["nstat"]


def test_classical_segmenter_delta_vs_true_masks():
    """Document the Otsu-fallback's delta against the ground-truth masks on
    the same synthetic nuclei: counts match exactly on well-separated disks
    and per-nucleus size error stays small (the fallback is a stand-in for
    cellpose, not a numerics claim)."""
    from tera_mind_tpu.metrics.morphology import nuclei_stats

    rng = np.random.default_rng(12)
    yy, xx = np.mgrid[:96, :96]
    lab = np.zeros((96, 96), np.int32)
    # disjoint grid of disks => segmentation is unambiguous
    k = 0
    for cy in range(16, 96, 32):
        for cx in range(16, 96, 32):
            k += 1
            lab[(yy - cy) ** 2 + (xx - cx) ** 2 <= 25] = k
    img = np.where(lab > 0, 0.9, 0.1).astype(np.float32)
    s = nuclei_stats(img, use_cellpose=False)
    true_sizes = np.unique(lab, return_counts=True)[1][1:]
    assert s.count == k
    rel = np.abs(np.sort(s.sizes) - np.sort(true_sizes)) / true_sizes
    assert rel.max() < 0.15, rel
