"""Multi-process (2 procs x 4 CPU devices) tera-generation:
``jax.distributed.initialize`` + process-spanning mesh + provider-fed
sharded arrays + cross-process ppermute halo, validated band-by-band
against a single-device run (parallel/mp_demo.py).

Replaces the reference's mp.spawn/NCCL multi-worker lock-step generation
(test_brn.py:26-48, 232-273) with a multi-controller SPMD program.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.cpu_mesh
@pytest.mark.slow
def test_two_process_generation_matches_single_device():
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, ".cache", "jax_cpu"),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tera_mind_tpu.parallel.mp_demo",
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(i)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"[mp_demo] process {i}/2 ok" in out, out[-3000:]
        assert f"[mp_demo] process {i} band-streaming ok" in out, out[-3000:]
        assert f"[mp_demo] process {i} band-streaming K2 ok" in out, \
            out[-3000:]

    # multi-process dp TRAINING loss history == single-process reference
    ref = subprocess.run(
        [sys.executable, "-m", "tera_mind_tpu.parallel.mp_demo",
         "--train_ref"], env=env, cwd=REPO, capture_output=True, text=True,
        timeout=900)
    assert ref.returncode == 0, ref.stdout[-2000:] + ref.stderr[-1000:]

    def losses(text, tag):
        line = [l for l in text.splitlines() if tag in l][0]
        return [float(v) for v in line.split(":")[1].split()]

    got = losses(outs[0], "train losses")
    want = losses(ref.stdout, "train_ref losses")
    assert len(got) == len(want) == 3
    assert all(abs(a - b) < 2e-5 for a, b in zip(got, want)), (got, want)
