"""True-resume checkpointing: optimizer state + step survive a round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from d2r_tpu.train.state import create_train_state, make_train_step


def test_opt_state_roundtrip(tmp_path):
    cfg = tiny_test_config(batch_size=4)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(4, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=50)
    step = make_train_step(model)
    rng = jax.random.key(1)
    # advance a few steps so opt state is non-trivial
    s = jax.tree_util.tree_map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, state)
    for _ in range(3):
        s, _ = step(s, batch, rng)

    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, s, include_opt_state=True)

    fresh = create_train_state(model, cfg, None, jax.random.key(2), batch,
                               total_steps=50)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(s.step) == 3

    a = jax.tree_util.tree_leaves(s.opt_state)
    b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)

    # continuing from the restored state matches continuing from the original
    s2, m1 = step(s, batch, rng)
    r2, m2 = step(restored, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-6)


def test_async_checkpoint_roundtrip(tmp_path):
    """--async_checkpoint: an async save awaited via wait_for_async_saves is
    byte-identical to a synchronous one."""
    from d2r_tpu.train.checkpoint import wait_for_async_saves

    cfg = tiny_test_config(batch_size=4)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(4, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=50)
    step = make_train_step(model)
    s, _ = step(state, batch, jax.random.key(1))

    path = os.path.join(str(tmp_path), "ckpt_async")
    save_checkpoint(path, s, include_opt_state=True, async_save=True)
    wait_for_async_saves()

    fresh = create_train_state(model, cfg, None, jax.random.key(2), batch,
                               total_steps=50)
    restored = restore_checkpoint(path, fresh)
    for x, y in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(restored.step) == int(s.step) == 1


def test_mismatched_opt_state_restore_fails_loudly(tmp_path):
    """A checkpoint WITH opt_state restored into a structurally different
    opt_state template (e.g. a --freeze_towers toggle across the
    interruption) must raise the real structural error, not silently
    degrade to a params-only restore that loses the schedule position."""
    import pytest

    from d2r_tpu.train.checkpoint import restore_variables

    cfg = tiny_test_config(batch_size=2)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(2, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=10)
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, state, include_opt_state=True)

    frozen_cfg = tiny_test_config(batch_size=2, freeze_towers=True)
    frozen = create_train_state(D2RClassifier(frozen_cfg), frozen_cfg, None,
                                jax.random.key(1), batch, total_steps=10)
    with pytest.raises(Exception, match="(?i)structure|match|tree"):
        restore_checkpoint(path, frozen)

    # a variables-only consumer (serving/export/predict) still loads the
    # same checkpoint via the partial restore that skips opt_state entirely
    v = restore_variables(path)
    assert set(v) == {"params", "batch_stats"}
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(v["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))


import pytest


@pytest.mark.slow
def test_trainer_restore_under_dp_tp_mesh(tmp_path, eight_devices):
    """Checkpoint restore under a (data=2, model=2) mesh: the FULL Trainer
    trains+saves on the tp mesh, a fresh Trainer restores into its
    mesh-context state, and dev eval reproduces the pre-save loss
    bit-exactly. Round 3 proved restore for dp; this pins the model-axis
    configuration (restored leaves must re-enter the tp-sharded jitted
    eval without relayout errors)."""
    from d2r_tpu.train.trainer import Trainer

    cfg = tiny_test_config(
        batch_size=8, num_epochs=1, eval_begin_epoch=1,
        save_path=str(tmp_path / "out"),
        mesh_shape=(2, 2), mesh_axis_names=("data", "model"))
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    data = [synthetic_batch(8, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=s)
            for s in range(3)]

    tr = Trainer(train_data=data, dev_data=data[:1], test_data=None,
                 model=model, cfg=cfg)
    tr.train()  # evaluates at epoch 1 -> saves best_model on the mesh
    m_before, _, preds_before = tr._run_eval(data[:1])

    tr2 = Trainer(train_data=data, dev_data=data[:1], test_data=None,
                  model=model, cfg=cfg)
    tr2.init_state(data[0])
    tr2.state = restore_checkpoint(
        os.path.join(cfg.save_path, "best_model"), tr2.state)
    m_after, _, preds_after = tr2._run_eval(data[:1])

    assert m_after["loss"] == m_before["loss"]  # bit-exact restore
    np.testing.assert_array_equal(np.asarray(preds_after),
                                  np.asarray(preds_before))
