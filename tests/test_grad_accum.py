"""Gradient accumulation (train/state.py make_accum_step).

The accumulated step must be bit-equivalent to the eager oracle: per-microbatch
grads (batch_stats carried sequentially, dropout folded from (step, i)),
averaged, then ONE optimizer update. No reference equivalent — the torch
reference steps its optimizer once per batch (ref: modules/train.py:117-128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.train.state import (
    _model_inputs,
    create_train_state,
    make_accum_step,
)


def _tiny_batch(cfg, seed=0):
    vc = cfg.vision_config()
    return synthetic_batch(cfg.batch_size, cfg.max_seq, vc.image_size,
                           vocab_size=cfg.text_config().vocab_size, seed=seed)


def _copy(st):
    return jax.tree_util.tree_map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, st)


class TestAccumStep:
    @pytest.mark.slow
    def test_matches_mean_of_grads_oracle(self):
        K = 3
        cfg = tiny_test_config(batch_size=4)
        model = D2RClassifier(cfg)
        batches = [_tiny_batch(cfg, seed=s) for s in range(K)]
        state = create_train_state(model, cfg, None, jax.random.key(0),
                                   batches[0], total_steps=50)
        rng = jax.random.key(7)

        # --- oracle: eager per-microbatch grads, mean, one update ---
        sa = _copy(state)
        step_rng = jax.random.fold_in(rng, sa.step)
        batch_stats = sa.batch_stats
        grad_sum = jax.tree_util.tree_map(jnp.zeros_like, sa.params)
        losses = []
        for i, batch in enumerate(batches):
            def loss_fn(params, batch=batch, bs=batch_stats, i=i):
                (loss, logits, aux), mutated = sa.apply_fn(
                    {"params": params, "batch_stats": bs},
                    **_model_inputs(batch),
                    deterministic=False, use_running_average=False,
                    rngs={"dropout": jax.random.fold_in(step_rng, i)},
                    mutable=["batch_stats"])
                return loss, mutated
            (loss, mutated), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(sa.params)
            batch_stats = mutated["batch_stats"]
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            losses.append(float(loss))
        mean_grads = jax.tree_util.tree_map(lambda g: g / K, grad_sum)
        sa = sa.apply_gradients(grads=mean_grads, batch_stats=batch_stats)

        # --- one jitted accumulation step ---
        sb = _copy(state)
        stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
                   for k in batches[0]}
        sb, metrics = make_accum_step(model, K)(sb, stacked, rng)

        np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                                   rtol=1e-5)
        assert int(sb.step) == int(sa.step) == 1
        for x, y in zip(jax.tree_util.tree_leaves(sa.params),
                        jax.tree_util.tree_leaves(sb.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)
        for x, y in zip(jax.tree_util.tree_leaves(sa.batch_stats),
                        jax.tree_util.tree_leaves(sb.batch_stats)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)


class TestAccumOnMesh:
    @pytest.mark.slow
    def test_accum_step_dp_mesh_matches_single_device(self, eight_devices):
        """make_accum_step over a dp x tp mesh (stacked batch sharded over
        'data' via shard_stacked_batch, params over 'model') must land on the
        same parameters and loss as the replicated run — accumulation composes
        with the training-time shardings the Trainer actually uses."""
        from d2r_tpu.parallel.mesh import (
            make_mesh,
            make_param_shardings,
            shard_stacked_batch,
        )

        K = 2
        cfg = tiny_test_config(batch_size=8)
        model = D2RClassifier(cfg)
        batches = [_tiny_batch(cfg, seed=s) for s in range(K)]
        stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
                   for k in batches[0]}
        rng = jax.random.key(7)

        def run(mesh_shape=None):
            state = create_train_state(model, cfg, None, jax.random.key(0),
                                       batches[0], total_steps=20)
            step = make_accum_step(model, K)
            if mesh_shape is None:
                state, m = step(state, stacked, rng)
                return state, float(m["loss"])
            mesh = make_mesh(mesh_shape, ("data", "model"))
            shardings = make_param_shardings(state.params, mesh)
            params = jax.tree_util.tree_map(jax.device_put, state.params,
                                            shardings)
            state = state.replace(params=params)
            with mesh:
                state, m = step(state, shard_stacked_batch(stacked, mesh),
                                rng)
                return state, float(m["loss"])

        s_rep, l_rep = run(None)
        s_dp, l_dp = run((2, 2))
        np.testing.assert_allclose(l_rep, l_dp, rtol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_rep.params),
                        jax.tree_util.tree_leaves(s_dp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)


class TestTrainerAccum:
    def test_trainer_grad_accum_counts_optimizer_steps(self):
        """5 microbatches at grad_accum_steps=2 -> ceil(5/2)=3 optimizer
        steps/epoch; the leftover group gets its own short program; the LR
        schedule horizon counts optimizer steps."""
        from d2r_tpu.train.trainer import Trainer

        cfg = tiny_test_config(batch_size=4, num_epochs=1,
                               eval_begin_epoch=99, save_path=None,
                               grad_accum_steps=2)
        model = D2RClassifier(cfg)
        data = [_tiny_batch(cfg, seed=s) for s in range(5)]
        tr = Trainer(train_data=data, dev_data=None, test_data=None,
                     model=model, cfg=cfg)
        assert tr.train_num_steps == 3
        tr.train()
        assert tr.step == 3
        assert int(tr.state.step) == 3
        assert sorted(tr._accum_steps) == [1, 2]
