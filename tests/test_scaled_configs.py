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


def test_width_1024_forward_on_dp2_tp2_mesh(eight_devices):
    """BASELINE config 4's PARALLEL path, CI-pinned: the 1024-dim partition
    rules (RoBERTa-large/ViT-L width, 16 heads -> 8 whole heads per model
    shard) must fire on a dp2 x tp2 mesh and produce a finite sharded loss.
    Shallow towers keep the 1-core CPU compile bounded; shard shapes are
    width-determined, so this exercises exactly what the wide dryrun
    (MULTICHIP_WIDE.json) runs at driver time."""
    from jax.sharding import PartitionSpec as P

    from d2r_tpu.parallel.mesh import (
        make_mesh,
        make_param_shardings,
        shard_batch,
    )

    register_text_preset("w1024-bert", lambda: TextEncoderConfig(
        vocab_size=256, hidden_size=1024, num_hidden_layers=1,
        num_attention_heads=16, intermediate_size=4096,
        max_position_embeddings=32))
    register_vision_preset("w1024-vit", lambda: VisionEncoderConfig(
        hidden_size=1024, num_hidden_layers=1, num_attention_heads=16,
        intermediate_size=4096, image_size=32, patch_size=16))
    cfg = D2RConfig(
        bert_name="w1024-bert", vit_name="w1024-vit", embed_size=1024,
        num_head_IMRC=16, hid_IMRC=256, hid_router=64, DR_step=3,
        max_seq=8, batch_size=4, compute_dtype="float32", use_pallas=False,
        mesh_shape=(2, 2), mesh_axis_names=("data", "model"))
    model = D2RClassifier(cfg)
    batch = synthetic_batch(4, 8, 32, vocab_size=256, seed=7)
    args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
            jnp.asarray(batch["pixel_values"]))
    variables = jax.jit(model.init)(jax.random.key(0), *args)

    mesh = make_mesh((2, 2), ("data", "model"))
    sh = make_param_shardings(variables["params"], mesh)
    # rules fire at width 1024: head-aligned qkv, MLP up/down, vocab rows
    layer = sh["model"]["encoder_text_layers"]["layer_0"]
    assert layer["attention_self"]["qkv"]["kernel"].spec == P(None, None, "model")
    assert layer["intermediate_dense"]["kernel"].spec == P(None, "model")
    assert layer["output_dense"]["kernel"].spec == P("model", None)
    emb = sh["model"]["text_embeddings"]["word_embeddings"]["embedding"]
    assert emb.spec == P("model", None)
    # 1024 / 2 shards = 512 = 8 whole heads of head_dim 64
    assert (1024 // 2) % cfg.text_config().head_dim == 0

    with mesh:
        params = jax.tree_util.tree_map(
            jax.device_put, variables["params"], sh)
        sharded = shard_batch(
            {"input_ids": batch["input_ids"],
             "attention_mask": batch["attention_mask"],
             "token_type_ids": batch["token_type_ids"],
             "labels": batch["labels"],
             "pixel_values": batch["pixel_values"]}, mesh)
        loss, logits, _ = jax.jit(model.apply)(
            {"params": params, "batch_stats": variables["batch_stats"]},
            sharded["input_ids"], sharded["attention_mask"],
            sharded["token_type_ids"], sharded["labels"],
            sharded["pixel_values"])
        assert logits.shape == (4, 3)
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


def test_seq128_train_and_eval(tmp_path):
    """BASELINE config 3 (padded seqlen 128) regression guard: the long-text
    recipe point is measured on TPU (SEQ128_BENCH.json / perf_sweep
    'seq128' variant) but was never CI-driven — this runs the FULL Trainer
    train+eval path at max_seq=128 with tiny towers. Position tables must
    cover 128 rows and every static shape must carry through the fabric,
    the Gram losses, and the eval metrics."""
    from d2r_tpu.train.trainer import Trainer

    register_text_preset("seq128-bert", lambda: TextEncoderConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=130))
    register_vision_preset("seq128-vit", lambda: VisionEncoderConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16))
    cfg = D2RConfig(
        bert_name="seq128-bert", vit_name="seq128-vit", embed_size=64,
        num_head_IMRC=4, hid_IMRC=64, hid_router=32, DR_step=3,
        max_seq=128, batch_size=2, num_epochs=1, eval_begin_epoch=99,
        save_path=None, compute_dtype="float32", use_pallas=False)
    model = D2RClassifier(cfg)
    data = [synthetic_batch(2, 128, 32, vocab_size=128, seed=s)
            for s in range(2)]
    # long-text shape: tokens past position 64 must actually be attended
    assert data[0]["input_ids"].shape[1] == 128
    tr = Trainer(train_data=data, dev_data=data[:1], test_data=None,
                 model=model, cfg=cfg)
    tr.train()
    assert tr.step == 2
    metrics = tr.evaluate(epoch=1)
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["f_score"] <= 1.0


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
