"""Scaled/parameterised-config tests (BASELINE config 4): the routing fabric
must work at any width — the reference hardcodes 768 inside several cells
(ref: models/Cells.py:140-143,193-195,229-234); this build must not."""

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import (
    D2RConfig,
    TextEncoderConfig,
    VisionEncoderConfig,
    clip_vit_l14_config,
    register_text_preset,
    register_vision_preset,
    roberta_large_config,
)
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier


def test_presets_for_scaled_towers():
    t = roberta_large_config()
    v = clip_vit_l14_config()
    assert t.hidden_size == v.hidden_size == 1024
    assert v.num_patches == (224 // 14) ** 2


def test_forward_at_width_96():
    """Non-768, non-64 width catches any hardcoded dimension."""
    register_text_preset("w96-bert", lambda: TextEncoderConfig(
        vocab_size=128, hidden_size=96, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32))
    register_vision_preset("w96-vit", lambda: VisionEncoderConfig(
        hidden_size=96, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16))
    cfg = D2RConfig(
        bert_name="w96-bert", vit_name="w96-vit", embed_size=96,
        num_head_IMRC=4, hid_IMRC=48, hid_router=24, DR_step=3,
        max_seq=8, batch_size=2, compute_dtype="float32", use_pallas=False)
    model = D2RClassifier(cfg)
    batch = synthetic_batch(2, 8, 32, vocab_size=128, seed=0)
    args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
            jnp.asarray(batch["pixel_values"]))
    variables = jax.jit(model.init)(jax.random.key(0), *args)
    loss, logits, _ = jax.jit(model.apply)(variables, *args)
    assert logits.shape == (2, 3)
    assert np.isfinite(float(loss))


def test_bf16_compute_dtype_is_finite():
    from d2r_tpu.config import tiny_test_config
    cfg = tiny_test_config(compute_dtype="bfloat16")
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(4, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=1)
    args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
            jnp.asarray(batch["pixel_values"]))
    variables = jax.jit(model.init)(jax.random.key(0), *args)
    loss, logits, aux = jax.jit(model.apply)(variables, *args)
    # params stay fp32, loss computed in fp32
    assert variables["params"]["fc"]["kernel"].dtype == jnp.float32
    assert np.isfinite(float(loss)) and np.isfinite(np.asarray(logits)).all()


def test_roberta_style_tiny_model_forward():
    """position_style='roberta' (BASELINE config 4's text tower) threads the
    attention mask through the FULL classifier: pad slots read the reserved
    padding_idx position row (parity pinned vs live HF in
    tests/parity/test_roberta_parity.py); this pins the e2e wiring."""
    register_text_preset("w32-roberta", lambda: TextEncoderConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=34, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, position_style="roberta"))
    register_vision_preset("w32-roberta-vit", lambda: VisionEncoderConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=16))
    cfg = D2RConfig(
        bert_name="w32-roberta", vit_name="w32-roberta-vit", embed_size=32,
        num_head_IMRC=2, hid_IMRC=16, hid_router=8, DR_step=3,
        max_seq=8, batch_size=2, compute_dtype="float32", use_pallas=False)
    model = D2RClassifier(cfg)
    batch = synthetic_batch(2, 8, 32, vocab_size=128, seed=3)
    assert (batch["attention_mask"] == 0).any()  # pads actually exercised
    args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
            jnp.asarray(batch["pixel_values"]))
    variables = jax.jit(model.init)(jax.random.key(0), *args)
    loss, logits, _ = jax.jit(model.apply)(variables, *args)
    assert logits.shape == (2, 3)
    assert np.isfinite(float(loss))
