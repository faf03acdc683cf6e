"""The fused flat-buffer AdamW must match the reference-shaped
multi_transform optimizer exactly (same math, different lowering)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.train.optimizer import (fused_adamw, fused_leaf_adamw,
                                     grouped_adamw, make_optimizer)


def _toy_params():
    k = jax.random.key(0)
    ks = jax.random.split(k, 6)
    return {
        "model": {
            "encoder_text_layers": {"w": jax.random.normal(ks[0], (8, 4))},
            "vision_embeddings": {"w": jax.random.normal(ks[1], (4, 4))},
            "itr_module": {"router": {"b": jax.random.normal(ks[2], (5,))}},
        },
        "fc": {"kernel": jax.random.normal(ks[3], (4, 3)),
               "bias": jax.random.normal(ks[4], (3,))},
    }


@pytest.mark.parametrize("variant", ["fused", "grouped", "fused_leaf"])
def test_fast_optimizers_match_multi_transform_over_steps(variant):
    cfg = tiny_test_config(lr=1e-3, warmup_ratio=0.1)
    params = _toy_params()
    grads_seed = jax.random.key(42)

    tx_ref = make_optimizer(cfg, total_steps=20)          # multi_transform
    if variant == "fused":
        tx_fused = fused_adamw(cfg, total_steps=20, params_template=params)
    elif variant == "fused_leaf":
        tx_fused = fused_leaf_adamw(cfg, total_steps=20)
    else:
        tx_fused = grouped_adamw(cfg, total_steps=20)

    s_ref = tx_ref.init(params)
    s_fused = tx_fused.init(params)
    p_ref = params
    p_fused = params

    for step in range(5):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.fold_in(grads_seed, step), p.shape),
            params)
        u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
        p_ref = jax.tree_util.tree_map(lambda p, u: p + u, p_ref, u_ref)
        u_fused, s_fused = tx_fused.update(g, s_fused, p_fused)
        p_fused = jax.tree_util.tree_map(lambda p, u: p + u, p_fused, u_fused)

    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_lr_groups_differ():
    """fc must move at 5e-2-scale steps, the rest at cfg.lr-scale."""
    cfg = tiny_test_config(lr=1e-4, warmup_ratio=0.0)
    params = _toy_params()
    tx = fused_adamw(cfg, total_steps=100, params_template=params)
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    fc_mag = float(jnp.abs(updates["fc"]["kernel"]).mean())
    main_mag = float(jnp.abs(
        updates["model"]["encoder_text_layers"]["w"]).mean())
    # first step: update ~ lr * sign-ish -> ratio ~ fc_lr / lr = 500
    assert fc_mag / main_mag > 100
