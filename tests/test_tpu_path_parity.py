"""In-suite regression of the production-path parity chain.

scripts/parity_tpu.py records the flagship-size number (BASELINE.md);
this test keeps the SAME code path — live torch reference protocol loop
(test_brn.py:232-273 semantics) vs TeraGenerator's packed-bf16
block-major chain — green at a small model size on every run.

The bound is statistical, not bitwise: the deployed path runs bf16
matmuls, so per-step rounding accumulates over the chain.  The recorded
flagship run (BASELINE.md "TPU-path parity") sits around MAE ~1e-3 /
r > 0.9999; the small-model bound here is set with ~3x headroom.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.mark.parametrize("steps", [3])
def test_packed_bf16_block_major_chain_matches_torch(steps):
    from parity_tpu import run

    rec = run(channels=8, rna=16, tile=64, grid=2, steps=steps,
              seed=0, verbose=False)
    # bf16 chain vs f32 oracle: small MAE, near-perfect correlation
    assert rec["mae"] < 5e-3, rec
    assert rec["pearson_r"] > 0.999, rec
    assert rec["p99"] < 2e-2, rec
