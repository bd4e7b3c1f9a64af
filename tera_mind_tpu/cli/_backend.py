"""Robust jax backend startup for the CLIs.

The reference initializes CUDA implicitly and crashes with a bare stack
trace when the device stack is broken; operators of THIS framework hit an
equivalent seam when ``JAX_PLATFORMS`` names a PJRT plugin that is not
registered in the current interpreter (e.g. a site customization dropped
from ``PYTHONPATH`` while the env var still demands the plugin — the
failure mode that killed the round-4 dress rehearsal's first training
attempt with ``RuntimeError: Unable to initialize backend 'axon'``).

``init_backend()`` turns that into a one-line warning + automatic backend
selection, and always prints the platform actually in use, so a run that
silently lands on CPU is visible in its log (VERDICT r4 ask #5).
"""

from __future__ import annotations

import os


def init_backend(verbose: bool = True):
    """Initialize jax's backend, falling back to automatic selection when
    the env-requested platform cannot initialize.  Returns jax.devices().

    Must be called before any other jax API touches the backend.
    """
    import jax

    try:
        devs = jax.devices()
    except RuntimeError as e:
        requested = os.environ.get("JAX_PLATFORMS", "")
        print(
            f"WARNING: jax backend init failed for "
            f"JAX_PLATFORMS={requested!r} ({e}); falling back to "
            f"automatic backend selection. If this machine has a TPU, "
            f"check that its PJRT plugin is importable (PYTHONPATH / "
            f"site customization).", flush=True)
        jax.config.update("jax_platforms", "")
        devs = jax.devices()  # raise only if no backend at all works
    if verbose:
        print(f"jax backend: {devs[0].platform} x{len(devs)} device(s)",
              flush=True)
    return devs
