"""bf16 drift guard (round-1 VERDICT item 7).

The flagship recipe runs with ``compute_dtype='bfloat16'`` (params stay fp32).
This pins the bf16-vs-fp32 logits/loss drift at FLAGSHIP WIDTH (768, 12/16
heads, full routing fabric, shallow towers to keep CPU time sane) so the
default compute dtype can't silently diverge from the parity story. The
tolerance is documented in docs/PARITY.md.
"""

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import (
    D2RConfig,
    TextEncoderConfig,
    VisionEncoderConfig,
    register_text_preset,
    register_vision_preset,
)
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier

# pinned drift budget at flagship width (see docs/PARITY.md deviation 11)
LOGITS_ATOL = 0.05
LOSS_RTOL = 0.02


def test_bf16_within_pinned_tolerance_of_fp32():
    register_text_preset("w768-drift-bert", lambda: TextEncoderConfig(
        vocab_size=512, hidden_size=768, num_hidden_layers=2,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=64))
    register_vision_preset("w768-drift-vit", lambda: VisionEncoderConfig(
        hidden_size=768, num_hidden_layers=2, num_attention_heads=12,
        intermediate_size=3072, image_size=64, patch_size=32))
    cfg32 = D2RConfig(
        bert_name="w768-drift-bert", vit_name="w768-drift-vit",
        embed_size=768, num_head_IMRC=16, hid_IMRC=768, hid_router=768,
        DR_step=4, max_seq=16, batch_size=4,
        compute_dtype="float32", use_pallas=False)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    model32 = D2RClassifier(cfg32)
    model16 = D2RClassifier(cfg16)

    batch = synthetic_batch(4, 16, 64, vocab_size=512, seed=0)
    args = (jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
            jnp.asarray(batch["pixel_values"]))

    # ONE fp32 param tree drives both models: compute dtype is the only delta
    variables = jax.jit(model32.init)(jax.random.key(0), *args)
    loss32, logits32, aux32 = jax.jit(model32.apply)(variables, *args)
    loss16, logits16, aux16 = jax.jit(model16.apply)(variables, *args)

    assert logits16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(logits16, np.float32), np.asarray(logits32, np.float32),
        atol=LOGITS_ATOL)
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=LOSS_RTOL)
    # the JS component is computed in fp32 in both (losses.py upcasts)
    np.testing.assert_allclose(float(aux16["js_loss"]), float(aux32["js_loss"]),
                               atol=5e-3)
