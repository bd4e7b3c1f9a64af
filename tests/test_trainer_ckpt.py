"""Trainer orbax checkpointing: save, auto-resume, and packed-compute
interchangeability of the restored tree."""

import dataclasses
from pathlib import Path

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


@pytest.mark.slow  # trains 12 tiny steps (convergence-class runtime)
def test_pretrain_from_converted_torch_ckpt(tmp_path):
    """The pretrain seam (VERDICT r4 ask #3; reference experiment.py:50-58,
    464-473): a reference-style Lightning ``.ckpt`` (``model.`` prefix +
    ``ema_model`` keys) initializes training via
    ``load_pretrain_params`` -> ``Trainer.state_from_params`` ->
    ``fit(state=...)`` — exactly what ``cli.train --pretrain`` wires.
    The pretrained loss must start below the random-init loss, and the
    fit loop must train N further steps from it."""
    torch = pytest.importorskip("torch")
    from test_convert import _flax_to_torch_sd

    from tera_mind_tpu.convert import load_pretrain_params

    conf = _conf(tmp_path / "a", save_every_steps=10_000)
    tr = Trainer(conf, mesh=False)
    batch = _batch(conf, 0)
    state = tr.init_state(batch)
    shaped = tr.shape_batch(batch)
    rng = jax.random.PRNGKey(0)
    for _ in range(12):  # "trained" weights: same batch, loss drops
        rng, k = jax.random.split(rng)
        state, _ = tr.train_step(state, shaped, k)

    mc = conf.make_model_conf()
    sd = _flax_to_torch_sd(jax.tree.map(np.asarray, state.params), mc)
    wrapped = {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
    wrapped["ema_model.out.0.weight"] = torch.zeros(1)  # must be stripped
    ck = tmp_path / "last.ckpt"
    torch.save({"state_dict": wrapped}, ck)

    conf2 = _conf(tmp_path / "b")
    tr2 = Trainer(conf2, mesh=False)
    params = load_pretrain_params(ck, conf2.make_model_conf())
    k_eval = jax.random.PRNGKey(123)  # same t/noise draws for both
    _, loss_pre = tr2.train_step(tr2.state_from_params(params), shaped,
                                 k_eval)
    _, loss_rnd = tr2.train_step(tr2.init_state(_batch(conf2, 5)), shaped,
                                 k_eval)
    assert float(loss_pre) < float(loss_rnd), (float(loss_pre),
                                               float(loss_rnd))

    # ...and training proceeds from the converted state through fit()
    out = tr2.fit(iter([_batch(conf2, s) for s in range(3)]), max_steps=2,
                  log_every=10, metrics=False,
                  state=tr2.state_from_params(params))
    assert int(out.step) == 2


@pytest.mark.slow  # fits 1 step (compile-heavy on the remote service)
def test_load_pretrain_params_orbax_dir(tmp_path):
    """load_pretrain_params also consumes an orbax dir written by
    Trainer.save (initialize-from, NOT resume: step/optimizer fresh)."""
    from tera_mind_tpu.convert import load_pretrain_params

    conf = _conf(tmp_path, save_every_steps=1)
    tr = Trainer(conf, mesh=False)
    state = tr.fit(iter([_batch(conf, s) for s in range(2)]), max_steps=1,
                   log_every=10, metrics=False)
    params = load_pretrain_params(
        str(Path(conf.logdir) / "orbax"), conf.make_model_conf())
    pre = tr.state_from_params(params)
    assert int(pre.step) == 0  # fresh step counter
    d = jax.tree.map(lambda a, b: float(jnp.abs(
        jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)).max()),
        pre.params, state.params)
    assert max(jax.tree.leaves(d)) == 0.0


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
