"""Trainer-level tests: optimizer grouping, LR schedule shape, checkpoint
round-trip, overfit-8-samples convergence (the e2e regression from
SURVEY.md section 4), and the multichip dry run."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.train.optimizer import (
    linear_warmup_decay,
    make_optimizer,
    param_group_label,
)
from d2r_tpu.train.state import create_train_state, make_eval_step, make_train_step


def _tiny_batch(cfg, seed=0, bs=None):
    vc = cfg.vision_config()
    return synthetic_batch(bs or cfg.batch_size, cfg.max_seq, vc.image_size,
                           vocab_size=cfg.text_config().vocab_size, seed=seed)


class TestOptimizer:
    def test_param_group_labels(self):
        # mirrors ref: modules/train.py:292-319 substring rules
        assert param_group_label("fc/kernel") == "fc"
        assert param_group_label("model/encoder_text_layers/layer_0/x/kernel") == "text"
        assert param_group_label("model/vision_embeddings/class_embedding") == "vision"
        assert param_group_label("model/itr_module/dynamic_itr_l0/glac/text_cls_pool/dense/kernel") == "text"
        assert param_group_label("model/block_fusion/linear0/kernel") == "other"
        assert param_group_label("model/itr_module/dynamic_itr_l0/ric/router/mlp_0/kernel") == "other"

    def test_schedule_matches_hf_semantics(self):
        # HF: step/warmup then (total-step)/(total-warmup), all x base lr
        sched = linear_warmup_decay(1.0, warmup_steps=10, total_steps=100)
        np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-7)
        np.testing.assert_allclose(float(sched(5)), 0.5, atol=1e-6)
        np.testing.assert_allclose(float(sched(10)), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(sched(55)), 0.5, atol=1e-6)
        np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-6)


class TestTrainState:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_test_config(batch_size=8, num_epochs=1)
        model = D2RClassifier(cfg)
        batch = _tiny_batch(cfg, seed=0)
        tx = make_optimizer(cfg, total_steps=100)
        state = create_train_state(model, cfg, tx, jax.random.key(0), batch)
        return cfg, model, state, batch

    def test_router_bias_init(self, setup):
        cfg, model, state, batch = setup
        b = state.params["model"]["itr_module"]["dynamic_itr_l0"]["ric"][
            "router"]["mlp_2"]["bias"]
        np.testing.assert_allclose(np.asarray(b), 1.5)  # ref: Router.py:20

    def test_train_step_reduces_loss_on_fixed_batch(self, setup):
        cfg, model, state, batch = setup
        # the jitted step donates its input state; work on a copy so the
        # class-scoped fixture state stays alive for later tests
        state = jax.tree_util.tree_map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, state)
        train_step = make_train_step(model)
        rng = jax.random.key(1)
        losses = []
        for _ in range(12):
            state, metrics = train_step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    @pytest.mark.slow
    def test_overfit_8_samples(self):
        """e2e regression: a tiny model must memorise 8 fixed samples."""
        cfg = tiny_test_config(batch_size=8, lr=3e-4, warmup_ratio=0.05)
        model = D2RClassifier(cfg)
        batch = _tiny_batch(cfg, seed=42)
        tx = make_optimizer(cfg, total_steps=80)
        state = create_train_state(model, cfg, tx, jax.random.key(0), batch)
        train_step = make_train_step(model)
        eval_step = make_eval_step(model)
        rng = jax.random.key(2)
        for _ in range(60):
            state, metrics = train_step(state, batch, rng)
        out = eval_step(state, batch)
        acc = float((np.asarray(out["logits"]).argmax(-1)
                     == batch["labels"]).mean())
        assert acc >= 0.875, f"failed to overfit: acc={acc}"

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        cfg, model, state, batch = setup
        from d2r_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
        path = os.path.join(str(tmp_path), "ckpt")
        save_checkpoint(path, state)
        # corrupt params, then restore
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        state2 = state.replace(params=zeroed)
        state2 = restore_checkpoint(path, state2)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(state2.params)
        assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


class TestMultiStepDispatch:
    """The trainer's K-steps-per-dispatch scan path (train/state.py
    make_multi_step) must be mathematically identical to K single jitted
    steps — this closes the round-1 trainer/bench measurement gap."""

    def _copy(self, st):
        return jax.tree_util.tree_map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, st)

    @pytest.mark.slow
    def test_multi_step_matches_single_steps(self):
        from d2r_tpu.train.state import make_multi_step
        cfg = tiny_test_config(batch_size=4)
        model = D2RClassifier(cfg)
        batches = [_tiny_batch(cfg, seed=s) for s in range(3)]
        state = create_train_state(model, cfg, None, jax.random.key(0),
                                   batches[0], total_steps=50)
        rng = jax.random.key(1)

        sa = self._copy(state)
        step = make_train_step(model)
        losses_a = []
        for b in batches:
            sa, m = step(sa, b, rng)
            losses_a.append(float(m["loss"]))

        sb = self._copy(state)
        stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
        sb, m = make_multi_step(model, 3)(sb, stacked, rng)

        np.testing.assert_allclose(np.asarray(m["losses"]), losses_a,
                                   rtol=1e-5, atol=1e-6)
        assert int(sb.step) == int(sa.step) == 3
        for x, y in zip(jax.tree_util.tree_leaves(sa.params),
                        jax.tree_util.tree_leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)

    @pytest.mark.slow
    def test_trainer_dispatch_grouping_invariance(self):
        """Full Trainer runs with steps_per_dispatch 1 vs 4 land on the same
        parameters (same seed, same data order)."""
        from d2r_tpu.train.trainer import Trainer

        def run(k):
            cfg = tiny_test_config(batch_size=4, num_epochs=2,
                                   eval_begin_epoch=99, save_path=None,
                                   steps_per_dispatch=k)
            model = D2RClassifier(cfg)
            data = [_tiny_batch(cfg, seed=s) for s in range(6)]
            tr = Trainer(train_data=data, dev_data=None, test_data=None,
                         model=model, cfg=cfg)
            tr.train()
            assert tr.step == 12
            return tr.state

        s1, s4 = run(1), run(4)
        for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s4.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)


class TestProfileDir:
    def test_profile_dir_writes_trace(self, tmp_path):
        """--profile_dir traces the second dispatch into the given dir (the
        flag used to be plumbed but dead on the Trainer path)."""
        from d2r_tpu.train.trainer import Trainer

        pdir = str(tmp_path / "trace")
        cfg = tiny_test_config(batch_size=4, num_epochs=1,
                               eval_begin_epoch=99, save_path=None,
                               steps_per_dispatch=1, profile_dir=pdir)
        model = D2RClassifier(cfg)
        data = [_tiny_batch(cfg, seed=s) for s in range(3)]
        tr = Trainer(train_data=data, dev_data=None, test_data=None,
                     model=model, cfg=cfg)
        tr.train()
        assert tr.step == 3
        # jax.profiler writes plugins/profile/<run>/ under the trace dir
        found = [os.path.join(r, f) for r, _, fs in os.walk(pdir) for f in fs]
        assert found, f"no trace files under {pdir}"


class TestWrappedBatchExactness:
    @pytest.mark.slow
    def test_eval_loss_identical_full_vs_wrapped(self):
        """Eval loss on a wrap-padded static batch == eval loss on the ragged
        batch the reference would see (CE and JS both valid-masked)."""
        cfg = tiny_test_config(batch_size=8)
        model = D2RClassifier(cfg)
        full = _tiny_batch(cfg, seed=3)
        r = 5
        small = {k: np.asarray(v)[:r] for k, v in full.items()}
        small["valid"] = np.ones(r, bool)
        wrapped = {k: np.concatenate([np.asarray(v)[:r], np.asarray(v)[:8 - r]])
                   for k, v in full.items()}
        wrapped["valid"] = np.array([True] * r + [False] * (8 - r))

        state = create_train_state(model, cfg, None, jax.random.key(0),
                                   wrapped, total_steps=10)
        eval_step = make_eval_step(model)
        loss_wrapped = float(eval_step(state, wrapped)["loss"])
        loss_small = float(eval_step(state, small)["loss"])
        np.testing.assert_allclose(loss_wrapped, loss_small, rtol=1e-5)


class TestWrappedBatchBNExactness:
    @pytest.mark.slow
    def test_train_mode_bn_stats_and_loss_identical_full_vs_wrapped(self):
        """Train-mode forward (BatchNorm batch statistics) on a wrap-padded
        batch with `valid` == the same forward on the ragged batch: the SAF
        BatchNorm stats are valid-weighted, so the last remaining
        wrapped-batch deviation (old docs/PARITY.md item 3) is closed."""
        cfg = tiny_test_config(batch_size=8)
        model = D2RClassifier(cfg)
        full = _tiny_batch(cfg, seed=4)
        r = 5
        small = {k: np.asarray(v)[:r] for k, v in full.items()}
        small["valid"] = np.ones(r, bool)
        wrapped = {k: np.concatenate([np.asarray(v)[:r], np.asarray(v)[:8 - r]])
                   for k, v in full.items()}
        wrapped["valid"] = np.array([True] * r + [False] * (8 - r))

        from d2r_tpu.train.state import _model_inputs
        variables = model.init(jax.random.key(0), **_model_inputs(wrapped))

        def train_forward(batch):
            (loss, logits, _), mutated = model.apply(
                variables, **_model_inputs(batch), deterministic=True,
                use_running_average=False, mutable=["batch_stats"])
            return loss, logits, mutated["batch_stats"]

        loss_w, logits_w, bs_w = train_forward(wrapped)
        loss_s, logits_s, bs_s = train_forward(small)

        np.testing.assert_allclose(float(loss_w), float(loss_s), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(logits_w)[:r],
                                   np.asarray(logits_s), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(bs_w),
                        jax.tree_util.tree_leaves(bs_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


class TestMultichip:
    def test_dryrun_8_devices(self, eight_devices):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)

    def test_batch_sharding_is_real(self, eight_devices):
        from d2r_tpu.parallel.mesh import make_mesh, shard_batch
        mesh = make_mesh((-1,), ("data",))
        batch = _tiny_batch(tiny_test_config(batch_size=8), seed=0)
        sharded = shard_batch(batch, mesh)
        assert len(sharded["input_ids"].sharding.device_set) == 8
