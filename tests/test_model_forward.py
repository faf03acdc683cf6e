"""Smoke + semantics tests for the full model forward on the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.models.unimo import D2RClassifier, D2RModel


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_test_config()
    model = D2RClassifier(cfg)
    rng = jax.random.key(0)
    b, l = 4, cfg.max_seq
    vc = cfg.vision_config()
    batch = dict(
        input_ids=jax.random.randint(jax.random.key(1), (b, l), 0, 100),
        attention_mask=jnp.concatenate(
            [jnp.ones((b, l // 2), jnp.int32), jnp.zeros((b, l - l // 2), jnp.int32)], axis=1),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        labels=jnp.array([0, 1, 2, 1]),
        pixel_values=jax.random.normal(
            jax.random.key(2), (b, vc.num_channels, vc.image_size, vc.image_size)),
    )
    variables = jax.jit(model.init)(rng, **batch)
    return cfg, model, variables, batch


def test_forward_shapes(tiny_setup):
    cfg, model, variables, batch = tiny_setup
    loss, logits, aux = model.apply(variables, **batch)
    assert logits.shape == (4, cfg.num_classes)
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(logits)).all()
    # js term is the negative-signed reference loss; ce must be positive
    assert float(aux["ce_loss"]) > 0


def test_forward_jits_and_is_deterministic(tiny_setup):
    cfg, model, variables, batch = tiny_setup

    @jax.jit
    def fwd(v, batch):
        return model.apply(v, **batch)[1]

    l1 = fwd(variables, batch)
    l2 = fwd(variables, batch)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_train_mode_updates_batch_stats(tiny_setup):
    cfg, model, variables, batch = tiny_setup
    (loss, logits, aux), mutated = model.apply(
        variables, **batch, deterministic=False, use_running_average=False,
        rngs={"dropout": jax.random.key(3)}, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    # running stats must actually move away from init
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_before, leaves_after))
    assert changed


def test_gradients_flow(tiny_setup):
    cfg, model, variables, batch = tiny_setup

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **batch, deterministic=False, use_running_average=False,
            rngs={"dropout": jax.random.key(4)}, mutable=["batch_stats"])
        return out[0]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the classifier head must receive gradient
    g_fc = np.asarray(grads["fc"]["kernel"])
    assert np.abs(g_fc).sum() > 0


def test_pathsig_dims(tiny_setup):
    """Path signature dims = 6^2*(DR_step-1)+6 (ref: InteractionModule.py:18)."""
    cfg, model, variables, batch = tiny_setup
    from d2r_tpu.models.interaction import InteractionModule

    b, l, d = 4, 8, cfg.embed_size
    text = jax.random.normal(jax.random.key(5), (b, l, d))
    image = jax.random.normal(jax.random.key(6), (b, 5, d))
    mod = InteractionModule(cfg)
    vs = jax.jit(mod.init)(jax.random.key(7), text, image)
    stream, sim = jax.jit(mod.apply)(vs, text, image)
    assert stream.shape == (b, l, d)
    assert sim.shape == (b, b)
    # Gram symmetry
    np.testing.assert_allclose(np.asarray(sim), np.asarray(sim).T, rtol=1e-5)
