"""cfg.scan_layers: the nn.scan tower stacks must compute EXACTLY what the
unrolled per-layer stacks compute, given restacked params
(utils/weights.py stack_tower_layers / unstack_tower_layers)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.utils.weights import stack_tower_layers, unstack_tower_layers


def _batch(cfg):
    from d2r_tpu.train.state import _model_inputs
    vc = cfg.vision_config()
    b = synthetic_batch(4, cfg.max_seq, vc.image_size,
                        vocab_size=cfg.text_config().vocab_size, seed=0)
    return {k: jnp.asarray(v) for k, v in _model_inputs(b).items()}


@pytest.mark.slow
def test_scanned_matches_unrolled_forward():
    cfg = tiny_test_config()
    cfg_scan = tiny_test_config(scan_layers=True)
    batch = _batch(cfg)

    model = D2RClassifier(cfg)
    model_scan = D2RClassifier(cfg_scan)

    variables = model.init(jax.random.key(0), **batch)
    stacked = {"params": stack_tower_layers(variables["params"]),
               "batch_stats": variables.get("batch_stats", {})}

    # the scanned tree must structurally match a scanned init
    scan_init = model_scan.init(jax.random.key(1), **batch)
    chex_tree = jax.tree_util.tree_structure(scan_init["params"])
    assert jax.tree_util.tree_structure(stacked["params"]) == chex_tree

    loss, logits, aux = model.apply(variables, **batch, deterministic=True,
                                    use_running_average=True)
    loss_s, logits_s, aux_s = model_scan.apply(stacked, **batch,
                                               deterministic=True,
                                               use_running_average=True)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(loss_s), float(loss), rtol=1e-5)


def test_stack_unstack_roundtrip():
    cfg = tiny_test_config()
    batch = _batch(cfg)
    variables = D2RClassifier(cfg).init(jax.random.key(0), **batch)
    params = variables["params"]
    rt = unstack_tower_layers(stack_tower_layers(params))
    assert jax.tree_util.tree_structure(rt) == jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(rt),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_scan_plus_remat_matches_scan():
    """remat composes with scan_layers (the combination used to be silently
    ignored): same forward values, and grads still flow."""
    cfg_scan = tiny_test_config(scan_layers=True)
    cfg_both = tiny_test_config(scan_layers=True, remat=True)
    batch = _batch(cfg_scan)

    model_scan = D2RClassifier(cfg_scan)
    model_both = D2RClassifier(cfg_both)
    variables = model_scan.init(jax.random.key(0), **batch)

    def loss_of(model, params):
        loss, _, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            **batch, deterministic=True, use_running_average=True)
        return loss

    l1, g1 = jax.value_and_grad(lambda p: loss_of(model_scan, p))(
        variables["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss_of(model_both, p))(
        variables["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_scanned_train_step_runs_and_matches():
    """One jitted train step with dropout DISABLED (zero-rate presets, so the
    per-layer rng split can't allocate different bits): scanned and unrolled
    must produce the same loss AND the same updated tower params (restacked
    for comparison) — guards the scan_layers backward/optimizer path."""
    from d2r_tpu.config import (TextEncoderConfig, VisionEncoderConfig,
                                register_text_preset, register_vision_preset)
    from d2r_tpu.train.state import create_train_state, make_train_step

    register_text_preset("nodrop-bert", lambda: TextEncoderConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0))
    register_vision_preset("nodrop-vit", lambda: VisionEncoderConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16))

    kw = dict(bert_name="nodrop-bert", vit_name="nodrop-vit",
              compute_dtype="float32")
    cfg = tiny_test_config(**kw)
    cfg_scan = tiny_test_config(scan_layers=True, **kw)
    batch = _batch(cfg)

    model = D2RClassifier(cfg)
    model_scan = D2RClassifier(cfg_scan)

    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=10)
    state_scan = create_train_state(model_scan, cfg_scan, None,
                                    jax.random.key(0), batch, total_steps=10)
    # fresh buffers: the jitted steps donate their state, so the scanned
    # state must not alias the unscanned one
    fresh = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                   stack_tower_layers(state.params))
    state_scan = state_scan.replace(params=fresh)

    rng = jax.random.key(7)
    new1, m1 = make_train_step(model)(state, batch, rng)
    new2, m2 = make_train_step(model_scan)(state_scan, batch, rng)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-6, atol=1e-7)
    restacked = stack_tower_layers(new1.params)
    assert (jax.tree_util.tree_structure(new2.params)
            == jax.tree_util.tree_structure(restacked))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(restacked),
            jax.tree_util.tree_leaves_with_path(new2.params)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p1))
