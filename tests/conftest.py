"""Test configuration.

Compiles in this environment go through a remote-compile service; TPU-target
compiles are fast, CPU-target ones are very slow.  Tests therefore run on
whatever platform JAX selects by default (the TPU when available).  Heavy
multi-device CPU-mesh tests are gated behind TMT_CPU_MESH=1 — the driver's
``dryrun_multichip`` covers that path independently.
"""

import os

# persistent compilation cache: repeated test runs reuse compiled graphs
# (compiles here go through a remote service with variable latency — cache
# hits bypass it entirely)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    # multi-device tests run by DEFAULT whenever the session has >=2
    # devices (e.g. the documented 8-virtual-CPU run below); on a
    # single-chip TPU they skip unless forced with TMT_CPU_MESH=1.
    # Full multi-device suite:
    #   PYTHONPATH= JAX_PLATFORMS=cpu \
    #   XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    #   JAX_COMPILATION_CACHE_DIR=.cache/jax_cpu python -m pytest tests/
    if os.environ.get("TMT_CPU_MESH") == "1" or len(jax.devices()) >= 2:
        return
    skip = pytest.mark.skip(reason="needs >=2 devices (run under "
                            "xla_force_host_platform_device_count=8, see "
                            "conftest); also covered by dryrun_multichip")
    for item in items:
        if "cpu_mesh" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "cpu_mesh: needs a multi-device CPU mesh (slow here)")
    config.addinivalue_line(
        "markers", "slow: heavyweight test (flagship-size parity, "
        "live-torch oracles, training-convergence and multi-subprocess "
        "runs, long quant/stream chains). The default fast gate is "
        "`pytest -m 'not slow'`; measured tier runtimes are recorded in "
        "PARITY.md each round (round 4: fast 17:41, slow 1:11:12 on the "
        "single-core CPU-mesh fallback host, both green — re-split after "
        "round 3 measured the fast tier at 48 min). Run the full suite "
        "(both tiers) before releases.")
