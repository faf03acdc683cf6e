#!/usr/bin/env python
"""Ablation profiler: time the pieces of the flagship train step on TPU.

Usage: python tools/profile_step.py [--trace /tmp/trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from d2r_tpu.config import D2RConfig
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.bert import BertEncoder
from d2r_tpu.models.interaction import InteractionModule
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.models.vit import CLIPVisionEncoder
from d2r_tpu.train.state import create_train_state, make_train_step

B, L = 64, 64


def _host_sync(out):
    """block_until_ready can return early on the tunnelled runtime; a
    device->host transfer of one leaf is a true sync."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


_ROUNDTRIP = None


def _roundtrip() -> float:
    global _ROUNDTRIP
    if _ROUNDTRIP is None:
        x = jax.jit(lambda v: v + 1)(jnp.float32(0))
        _host_sync(x)
        t0 = time.perf_counter()
        _host_sync(x)
        _ROUNDTRIP = time.perf_counter() - t0
    return _ROUNDTRIP


def timeit(fn, *args, iters=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _host_sync(out)
    return max(time.perf_counter() - t0 - _roundtrip(), 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no_pallas", action="store_true")
    args = ap.parse_args()

    cfg = D2RConfig(DR_step=4, max_seq=L, batch_size=B,
                    compute_dtype=args.dtype, use_pallas=not args.no_pallas)
    tc, vc = cfg.text_config(), cfg.vision_config()
    model = D2RClassifier(cfg)
    batch_np = synthetic_batch(B, L, vc.image_size, vocab_size=tc.vocab_size, seed=0)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}

    # --- full train step ---
    tx = None
    state = create_train_state(model, cfg, tx, jax.random.key(0), batch)
    # non-donating variant so we can re-run with the same state
    import functools
    from d2r_tpu.train.state import _model_inputs

    @jax.jit
    def step(state, batch, rng):
        def loss_fn(params):
            (loss, logits, aux), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                **_model_inputs(batch), deterministic=False,
                use_running_average=False, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return loss, (logits, aux, mutated)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return loss, grads

    rng = jax.random.key(1)
    t_full = timeit(step, state, batch, rng)
    print(f"full fwd+bwd (no opt): {t_full*1e3:8.2f} ms  "
          f"({B/t_full:8.1f} samples/s)")

    train_step = make_train_step(model)
    s2 = jax.tree_util.tree_map(lambda x: x.copy() if isinstance(x, jax.Array) else x, state)
    for _ in range(3):
        s2, m = train_step(s2, batch, rng)
    _host_sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        s2, m = train_step(s2, batch, rng)
    _host_sync(m["loss"])
    t_step = max(time.perf_counter() - t0 - _roundtrip(), 1e-9) / 20
    print(f"full train step:       {t_step*1e3:8.2f} ms  "
          f"({B/t_step:8.1f} samples/s)  [opt overhead {100*(t_step-t_full)/t_step:.0f}%]")

    # --- eval (deterministic, pallas active) ---
    @jax.jit
    def eval_fwd(state, batch):
        loss, logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            **_model_inputs(batch), deterministic=True, use_running_average=True)
        return logits
    t_eval = timeit(eval_fwd, state, batch)
    print(f"eval forward:          {t_eval*1e3:8.2f} ms  ({B/t_eval:8.1f} samples/s)")

    # --- towers alone (fwd+bwd) ---
    dtype = cfg.dtype
    text_enc = BertEncoder(tc, dtype, cfg.use_pallas)
    x = jax.random.normal(jax.random.key(2), (B, L, tc.hidden_size), dtype)
    tvars = jax.jit(text_enc.init)(jax.random.key(3), x)

    @jax.jit
    def text_fb(v, x):
        return jax.value_and_grad(lambda v: jnp.sum(text_enc.apply(v, x) ** 2))(v)[0]
    print(f"text tower fwd+bwd:    {timeit(text_fb, tvars, x)*1e3:8.2f} ms")

    vis_enc = CLIPVisionEncoder(vc, dtype, cfg.use_pallas)
    xv = jax.random.normal(jax.random.key(4), (B, vc.num_tokens, vc.hidden_size), dtype)
    vvars = jax.jit(vis_enc.init)(jax.random.key(5), xv)

    @jax.jit
    def vis_fb(v, x):
        return jax.value_and_grad(lambda v: jnp.sum(vis_enc.apply(v, x) ** 2))(v)[0]
    print(f"vision tower fwd+bwd:  {timeit(vis_fb, vvars, xv)*1e3:8.2f} ms")

    # --- one routing branch (fwd+bwd) ---
    itr = InteractionModule(cfg)
    text = jax.random.normal(jax.random.key(6), (B, L, tc.hidden_size), dtype)
    image = jax.random.normal(jax.random.key(7), (B, vc.num_tokens, vc.hidden_size), dtype)
    ivars = jax.jit(itr.init)(jax.random.key(8), text, image)

    @jax.jit
    def itr_fb(v, t, i):
        def f(v):
            s, sim = itr.apply(v, t, i, True)
            return jnp.sum(s ** 2) + jnp.sum(sim ** 2)
        return jax.value_and_grad(f)(v)[0]
    print(f"routing branch fwd+bwd:{timeit(itr_fb, ivars, text, image)*1e3:8.2f} ms (x2 branches)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                s2, m = train_step(s2, batch, rng)
            jax.block_until_ready(m["loss"])
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
