"""Train state + jitted step functions.

The reference's epoch/step loop (ref: modules/train.py:117-128) does
forward -> backward -> AdamW step -> LR step -> zero_grad eagerly per batch;
here the entire step (loss, grads, optimiser update, BatchNorm stat update)
is ONE jitted XLA program with donated state, so a training step is a single
device launch. Under a data mesh the same program runs SPMD: batch sharded on
'data', params replicated (or model-sharded via parallel/mesh.py rules),
gradient psums and the Gram-matrix all-gathers inserted by the compiler.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax.training import train_state

from d2r_tpu.config import D2RConfig


class TrainState(train_state.TrainState):
    batch_stats: Any = None


BATCH_KEYS = ("input_ids", "attention_mask", "token_type_ids", "labels",
              "pixel_values")


def _model_inputs(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    inputs = {k: batch[k] for k in BATCH_KEYS}
    for optional in ("valid", "sentic_adj"):
        if optional in batch:
            inputs[optional] = batch[optional]
    return inputs


def create_train_state(model, cfg: D2RConfig, tx, rng, sample_batch,
                       total_steps: int = 1000, mesh=None) -> TrainState:
    """Init variables and build the train state. Pass ``tx=None`` to get the
    TPU-fast AdamW selected by ``cfg.optimizer_impl`` (train/optimizer.py,
    default: single-chain grouped) built against the freshly initialised
    param tree.

    ``mesh`` (multi-host, parallel/distributed.py): params must be born as
    GLOBAL arrays — committed single-device arrays cannot enter a
    multi-process jit. Init is jitted with out_shardings from the mesh's
    partition rules (replicated unless a >1 model axis shards them), over a
    zeroed copy of the sample batch so every process traces the identical
    value-independent program.
    """
    init_fn = functools.partial(model.init)
    inputs = _model_inputs(sample_batch)
    if mesh is not None and jax.process_count() > 1:
        import numpy as np
        from d2r_tpu.parallel.mesh import make_param_shardings
        inputs = jax.tree_util.tree_map(
            lambda x: np.zeros_like(np.asarray(x)), inputs)
        # make_param_shardings over the WHOLE variables tree keeps the exact
        # pytree structure; its path rules only ever match params leaves, so
        # batch_stats (and everything else) replicate.
        shapes = jax.eval_shape(init_fn, rng, **inputs)
        out_shardings = make_param_shardings(shapes, mesh)
        with mesh:
            variables = jax.jit(init_fn, out_shardings=out_shardings)(
                rng, **inputs)
    else:
        variables = jax.jit(init_fn)(rng, **inputs)
    if tx is None:
        from d2r_tpu.train.optimizer import make_optimizer
        tx = make_optimizer(cfg, total_steps, params=variables["params"])
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def _compute_cast(params, dtype):
    """Cast the >=2-D fp32 weights to the compute dtype ONCE per step.

    Every module already casts its params at use (`kernel.astype(dtype)`),
    so the values are bit-identical — but with per-use casts XLA materialises
    fp32 weight relayouts + bf16 copies at every use site (forward, dx, dW):
    the optimised HLO showed ~7 GB/step of fp32 weight-shaped buffers on a
    step that is HBM-bandwidth-bound. Hoisting the cast makes fwd/bwd touch
    only the half-width bf16 copies. LayerNorm/bias/BatchNorm scales keep
    fp32 so modules that consume them in fp32 (TorchBatchNorm) are
    byte-for-byte unchanged; their traffic is negligible. Selection is by
    LEAF NAME (kernel/embedding), not ndim — scanned (N, h) and pipelined
    (S, N/S, h) stacks make LN scales >=2-D, and an ndim test would cast
    exactly the params this docstring promises stay fp32.
    """
    if dtype == jnp.float32 or not _HOIST_PARAM_CAST:
        return params

    def cast(path, p):
        last = path[-1]
        leaf = str(getattr(last, "key", getattr(last, "name", last)))
        if leaf in ("kernel", "embedding") and p.dtype == jnp.float32:
            return p.astype(dtype)
        return p

    return jax.tree_util.tree_map_with_path(cast, params)


# A/B result on v5e (see docs/BENCHMARKS.md): hoisting the cast REGRESSED
# throughput (785 vs 824 samples/s) — XLA fuses the per-use f32->bf16
# converts into the dots for free, while the hoist forces a materialised
# bf16 copy of every weight. Kept off; the machinery stays for future A/Bs.
_HOIST_PARAM_CAST = False


def _train_step_body(model):
    """The un-jitted (state, batch, rng) -> (state, metrics) step body,
    shared by make_train_step and make_multi_step."""
    compute_dtype = model.cfg.dtype
    remat_ffn_act = getattr(model.cfg, "remat_ffn_act", False)

    def train_step(state: TrainState, batch, dropout_rng):
        step_rng = jax.random.fold_in(dropout_rng, state.step)

        def forward(params):
            return state.apply_fn(
                {"params": _compute_cast(params, compute_dtype),
                 "batch_stats": state.batch_stats},
                **_model_inputs(batch),
                deterministic=False,
                use_running_average=False,
                rngs={"dropout": step_rng},
                mutable=["batch_stats"],
            )

        if remat_ffn_act:
            # Surgical remat: save every residual EXCEPT the 4x-wide
            # post-GELU FFN activations (tagged 'ffn_act' in bert.py/vit.py);
            # backward recomputes the cheap elementwise GELU instead of
            # round-tripping ~25 MB per FFN site through HBM.
            forward = jax.checkpoint(
                forward,
                policy=jax.checkpoint_policies.save_anything_except_these_names(
                    "ffn_act"))

        def loss_fn(params):
            (loss, logits, aux), mutated = forward(params)
            return loss, (logits, aux, mutated)

        (loss, (logits, aux, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"])
        metrics = {"loss": loss, **aux}
        return state, metrics

    return train_step


def make_train_step(model):
    """Returns the jitted single (state, batch, rng) -> (state, metrics)
    step with donated state."""
    return functools.partial(jax.jit, donate_argnums=(0,))(
        _train_step_body(model))


def make_multi_step(model, num_steps: int):
    """K chained training steps in ONE jitted program via lax.scan.

    Takes batches stacked on a leading axis (K, B, ...). Amortises host
    dispatch (significant through the tunnelled runtime) and lets XLA
    pipeline across steps. Used by bench.py and available to the trainer
    when the input pipeline can prefetch K batches ahead.
    """
    single = _train_step_body(model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, stacked_batches, dropout_rng):
        def body(carry, batch):
            new_state, metrics = single(carry, batch, dropout_rng)
            return new_state, metrics["loss"]

        state, losses = jax.lax.scan(body, state, stacked_batches,
                                     length=num_steps)
        return state, {"loss": losses[-1], "losses": losses}

    return multi_step


def make_accum_step(model, accum_steps: int):
    """ONE optimizer step from grads averaged over ``accum_steps`` sequential
    microbatches (gradient accumulation), as a single jitted program.

    Takes microbatches stacked on a leading (K, B, ...) axis. A lax.scan
    computes per-microbatch grads with batch_stats carried through (train-mode
    BatchNorm sees each microbatch exactly as K sequential steps would) and
    sums grads on the fly — one live grad tree plus the running sum — then
    applies a single AdamW update with the mean. Effective batch is
    K*batch_size at the activation-memory footprint of ONE microbatch.
    Per-microbatch dropout streams fold in (optimizer step, microbatch index).
    Math pinned bit-exact vs an eager mean-of-grads oracle in
    tests/test_grad_accum.py. No reference equivalent (the torch reference
    steps the optimizer once per batch, ref: modules/train.py:117-128).
    """
    compute_dtype = model.cfg.dtype

    @functools.partial(jax.jit, donate_argnums=(0,))
    def accum_step(state: TrainState, stacked_microbatches, dropout_rng):
        step_rng = jax.random.fold_in(dropout_rng, state.step)

        def micro_grads(batch_stats, batch, rng):
            def loss_fn(params):
                (loss, logits, aux), mutated = state.apply_fn(
                    {"params": _compute_cast(params, compute_dtype),
                     "batch_stats": batch_stats},
                    **_model_inputs(batch),
                    deterministic=False,
                    use_running_average=False,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                return loss, mutated
            (loss, mutated), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return mutated["batch_stats"], grads, loss

        def body(carry, xs):
            batch_stats, grad_sum, loss_sum = carry
            batch, i = xs
            batch_stats, grads, loss = micro_grads(
                batch_stats, batch, jax.random.fold_in(step_rng, i))
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            return (batch_stats, grad_sum,
                    loss_sum + loss.astype(jnp.float32)), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        carry = (state.batch_stats, zeros, jnp.zeros((), jnp.float32))
        (batch_stats, grad_sum, loss_sum), _ = jax.lax.scan(
            body, carry, (stacked_microbatches, jnp.arange(accum_steps)),
            length=accum_steps)
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grad_sum)
        state = state.apply_gradients(grads=grads, batch_stats=batch_stats)
        return state, {"loss": loss_sum / accum_steps}

    return accum_step


def make_eval_step(model):
    """Deterministic forward returning (loss, logits); BatchNorm uses running
    stats (torch model.eval() semantics, ref: modules/train.py:162,170)."""

    compute_dtype = model.cfg.dtype

    @jax.jit
    def eval_step(state: TrainState, batch):
        loss, logits, aux = state.apply_fn(
            {"params": _compute_cast(state.params, compute_dtype),
             "batch_stats": state.batch_stats},
            **_model_inputs(batch),
            deterministic=True,
            use_running_average=True,
        )
        return {"loss": loss, "logits": logits, **aux}

    return eval_step
