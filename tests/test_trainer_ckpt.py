"""Trainer orbax checkpointing: save, auto-resume, and packed-compute
interchangeability of the restored tree."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tera_mind_tpu.config import TrainConfig
from tera_mind_tpu.training.harness import Trainer


def _conf(tmp_path, **kw):
    return TrainConfig(image_size=32, net_ch=8, embed_channels=32,
                       rna_num=16, rna_slices=4, stain="all",
                       batch_size=2, accum_batches=1, lr=1e-3,
                       compute_dtype="float32", train_crop=64,
                       dropout=0.0, base_dir=str(tmp_path), **kw)


def _batch(conf, seed=0):
    rng = np.random.default_rng(seed)
    crop = conf.train_crop
    gh = crop // 16 + conf.gn_sz
    return {
        "image": rng.standard_normal(
            (conf.batch_size, crop, crop, conf.in_channels)
        ).clip(-1, 1).astype(np.float32),
        "rna": rng.integers(0, 3, (conf.batch_size, gh, gh,
                                   conf.rna_slices * conf.rna_num)
                            ).astype(np.float32),
    }


def test_trainer_save_restore_roundtrip(tmp_path):
    conf = _conf(tmp_path, save_every_steps=2)
    tr = Trainer(conf, mesh=None)
    it = iter([_batch(conf, s) for s in range(3)])
    state = tr.fit(it, max_steps=2, log_every=10, metrics=False)
    assert int(state.step) == 2

    # a FRESH Trainer auto-resumes from the orbax checkpoint
    tr2 = Trainer(conf, mesh=None)
    it2 = iter([_batch(conf, s) for s in range(5)])
    state2 = tr2.fit(it2, max_steps=3, log_every=10, metrics=False)
    assert int(state2.step) == 3  # resumed at 2, ran one more

    # fit() always saves at the end (save_last semantics, reference
    # ModelCheckpoint(save_last=True)) — the LATEST checkpoint is now the
    # final step-3 state, bit-equal to what fit returned
    restored = tr2.restore(state)
    assert int(restored.step) == 3
    d = jax.tree.map(lambda a, b: float(jnp.abs(
        jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)).max()),
        restored.params, state2.params)
    assert max(jax.tree.leaves(d)) == 0.0

    # the step-2 mid-run save is still there and equals fit #1's result
    import orbax.checkpoint as ocp
    restored2 = tr2._mgr().restore(2, args=ocp.args.StandardRestore(state))
    d2 = jax.tree.map(lambda a, b: float(jnp.abs(
        jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)).max()),
        restored2.params, state.params)
    assert max(jax.tree.leaves(d2)) == 0.0


@pytest.mark.slow  # tier re-split r4: >45s on the CPU-mesh gate
def test_restored_tree_runs_packed(tmp_path):
    """A checkpoint written by the 5D trainer drives the packed-compute
    trainer unchanged (the from_5d interchangeability guarantee)."""
    conf = _conf(tmp_path, save_every_steps=1)
    tr = Trainer(conf, mesh=None)
    it = iter([_batch(conf, s) for s in range(2)])
    state = tr.fit(it, max_steps=1, log_every=10, metrics=False)

    conf_p = dataclasses.replace(conf, packed_compute=True)
    tr_p = Trainer(conf_p, mesh=None)
    restored = tr_p.restore(state)
    assert restored is not None and int(restored.step) == 1
    new_state, loss = tr_p.train_step(restored, {
        "image": jnp.asarray(_batch(conf, 9)["image"])[None],
        "rna": jnp.asarray(_batch(conf, 9)["rna"])[None],
    }, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 2
