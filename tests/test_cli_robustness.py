"""CLI seam robustness (VERDICT r4 asks #5/#6, found by the round-4
dress rehearsal):

- a broken ``JAX_PLATFORMS`` env (plugin named but not registered) must
  fall back with a one-line warning instead of a bare RuntimeError — the
  rehearsal's first training attempt died exactly this way
  (``Unable to initialize backend 'axon'``);
- a dataset pass shorter than one effective batch must raise the clear
  RuntimeError, not spin forever decoding-and-dropping (drop_last).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_backend_fallback_on_bad_platform():
    """init_backend under JAX_PLATFORMS=bogus: warn + fall back + report
    the platform actually in use (subprocess: backend state is
    process-global)."""
    env = dict(os.environ, JAX_PLATFORMS="bogus", PYTHONPATH=str(REPO),
               JAX_COMPILATION_CACHE_DIR=str(REPO / ".cache" / "jax_cpu"))
    out = subprocess.run(
        [sys.executable, "-c",
         "from tera_mind_tpu.cli._backend import init_backend\n"
         "devs = init_backend()\n"
         "print('PLATFORM=' + devs[0].platform)\n"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "WARNING: jax backend init failed" in out.stdout
    assert "falling back" in out.stdout
    assert "PLATFORM=" in out.stdout  # the active platform is visible
    assert "jax backend:" in out.stdout


def test_backend_ok_platform_just_reports():
    """With a working platform the helper only prints the backend line."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO),
               JAX_COMPILATION_CACHE_DIR=str(REPO / ".cache" / "jax_cpu"))
    out = subprocess.run(
        [sys.executable, "-c",
         "from tera_mind_tpu.cli._backend import init_backend\n"
         "init_backend()\n"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "WARNING" not in out.stdout
    assert "jax backend: cpu" in out.stdout


def test_short_pass_raises_not_hangs():
    """cli.train's epoch iterator on a dataset smaller than one effective
    batch: clear RuntimeError (the round-4 silent-infinite-spin fix,
    cli/train.py epoch_batches)."""
    from tera_mind_tpu.cli.train import epoch_batches
    from tera_mind_tpu.data.dataset import SyntheticDataset

    ds = SyntheticDataset(n=4, crop=32, gdim=8, snum=1, stain="DAPI",
                          pad_bins=1)
    it = epoch_batches(ds, 64)  # effective batch > len(ds)
    with pytest.raises(RuntimeError, match="effective batch"):
        next(it)


def test_short_pass_ok_when_batch_fits():
    """Control: a pass with >= one effective batch yields normally."""
    from tera_mind_tpu.cli.train import epoch_batches
    from tera_mind_tpu.data.dataset import SyntheticDataset

    ds = SyntheticDataset(n=8, crop=32, gdim=8, snum=1, stain="DAPI",
                          pad_bins=1)
    b = next(epoch_batches(ds, 4))
    assert b["image"].shape[0] == 4
