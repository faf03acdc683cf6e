"""The PAD word-embedding row must receive ZERO gradient.

The reference builds its word embeddings with
``nn.Embedding(..., padding_idx=config.pad_token_id)``
(ref: models/modeling_unimo.py:277): torch zeroes d loss/d table[pad], so
the PAD row never trains even though pad activations reach the loss through
the Router's pad-pooling quirk. Caught by the DR_step=4 oracle gradient test
(tests/parity/test_parity_dr4.py) — the earlier training oracle drew token
ids from [1, 128) and never exercised id 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier


def test_pad_row_gradient_is_exactly_zero():
    cfg = tiny_test_config()
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    b = synthetic_batch(cfg.batch_size, cfg.max_seq, vc.image_size,
                        vocab_size=cfg.text_config().vocab_size, seed=3)
    ids = np.array(b["input_ids"])
    # force PAD (id 0) into the batch: the tail of every row, like the real
    # tokenizer's padding, plus one MID-sequence occurrence (torch zeroes by
    # ROW, not by mask — any id==pad position must contribute zero)
    ids[:, -4:] = 0
    ids[0, 2] = 0
    mask = np.array(b["attention_mask"])
    mask[:, -4:] = 0.0
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "token_type_ids": jnp.asarray(b["token_type_ids"]),
        "labels": jnp.asarray(b["labels"]),
        "pixel_values": jnp.asarray(b["pixel_values"]),
    }
    variables = jax.jit(model.init)(jax.random.key(0), **batch)

    def loss_fn(params):
        loss, _, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **batch, deterministic=True, use_running_average=False)
        return loss

    g = jax.grad(loss_fn)(variables["params"])
    emb = g["model"]["text_embeddings"]["word_embeddings"]["embedding"]
    emb = np.asarray(emb)
    np.testing.assert_array_equal(
        emb[0], np.zeros_like(emb[0]),
        err_msg="PAD row gradient must be exactly zero (padding_idx parity)")
    used_nonpad = np.unique(ids[(ids != 0)])
    assert any(np.max(np.abs(emb[int(t)])) > 0 for t in used_nonpad), \
        "some non-pad used row must have nonzero gradient"
