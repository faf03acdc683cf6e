"""RoBERTa text-tower parity (BASELINE config 4: roberta-large branches).

The reference loads only BertModel (ref: run.py:150); the scaled config
swaps in RoBERTa, whose one architectural delta is position-id semantics:
rows 0..padding_idx are reserved, non-pad token i reads row
padding_idx + 1 + i, and pad slots read the padding_idx row (HF
``create_position_ids_from_input_ids``). Pad-slot fidelity is load-bearing
here because the Router mean-pools over padded tokens (parity quirk,
ref: models/Router.py:23). This pins:

* the PRODUCTION converter path (``convert_pretrained`` with the same
  ``bert_mapping`` — RobertaModel's state_dict is key-compatible) against
  a live tiny HF RobertaModel, and
* ``position_style='roberta'`` forward parity on ALL slots, pads included.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from d2r_tpu.config import TextEncoderConfig, VisionEncoderConfig  # noqa: E402
from d2r_tpu.models.bert import BertEmbeddings, BertEncoder  # noqa: E402
from d2r_tpu.models.vit import CLIPVisionEmbeddings, CLIPVisionEncoder  # noqa: E402
from d2r_tpu.ops.attention import padding_key_bias  # noqa: E402
from d2r_tpu.utils.weights import convert_pretrained  # noqa: E402

HID, LAYERS, HEADS, INTER = 32, 2, 2, 64
VOCAB, MAXPOS, PAD = 117, 66, 1
IMG, PATCH = 32, 16


class _TextTower(nn.Module):
    """Text tower under the production param paths (models/unimo.py names);
    the vision tower exists only so convert_pretrained's two-tower contract
    holds."""

    tc: TextEncoderConfig
    vc: VisionEncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, attention_mask,
                 pixel_values):
        t = BertEmbeddings(self.tc, name="text_embeddings")(
            input_ids, token_type_ids, True, attention_mask=attention_mask)
        t = BertEncoder(self.tc, use_pallas=False,
                        name="encoder_text_layers")(
            t, padding_key_bias(attention_mask), True)
        v = CLIPVisionEmbeddings(self.vc, name="vision_embeddings")(pixel_values)
        v = nn.LayerNorm(epsilon=self.vc.layer_norm_eps,
                         name="vision_pre_layernorm")(v)
        v = CLIPVisionEncoder(self.vc, use_pallas=False,
                              name="encoder_vision_layers")(v, True)
        return t


def _our_config():
    return TextEncoderConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=MAXPOS, type_vocab_size=1,
        layer_norm_eps=1e-5, pad_token_id=PAD, position_style="roberta")


@pytest.fixture(scope="module")
def hf_roberta():
    from transformers import RobertaConfig, RobertaModel
    torch.manual_seed(0)
    cfg = RobertaConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, type_vocab_size=1,
        layer_norm_eps=1e-5, pad_token_id=PAD, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return RobertaModel(cfg, add_pooling_layer=False).eval()


def test_roberta_position_ids_match_hf_formula():
    """pad slots -> padding_idx row; non-pad token i -> padding_idx+1+i."""
    tc = _our_config()
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    ids = jnp.asarray([[5, 6, 7, PAD, PAD]], jnp.int32)
    emb = BertEmbeddings(tc)
    variables = emb.init(jax.random.key(0), ids, jnp.zeros_like(ids), True,
                         attention_mask=mask)
    table = np.asarray(
        variables["params"]["position_embeddings"]["embedding"])
    # recompute what rows the module gathered by probing with a one-hot
    # position table is overkill; instead pin the formula directly
    mask_np = np.asarray(mask)
    pos = np.cumsum(mask_np, axis=1) * mask_np + PAD
    np.testing.assert_array_equal(pos, [[2, 3, 4, 1, 1]])
    assert table.shape[0] == MAXPOS


def test_roberta_requires_mask():
    tc = _our_config()
    ids = jnp.ones((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="attention mask"):
        BertEmbeddings(tc).init(jax.random.key(0), ids, jnp.zeros_like(ids))


def test_converted_roberta_tower_matches_hf(hf_roberta):
    from transformers import CLIPVisionConfig, CLIPVisionModel
    torch.manual_seed(1)
    clip = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=HID, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, image_size=IMG, patch_size=PATCH)).eval()

    tc = _our_config()
    vc = VisionEncoderConfig(
        hidden_size=HID, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, image_size=IMG, patch_size=PATCH)
    tower = _TextTower(tc, vc)

    rng = np.random.default_rng(0)
    B, L = 3, 12
    # valid ids avoid the pad id — HF derives positions from
    # input_ids.ne(padding_idx), we derive them from the attention mask;
    # the two agree exactly for right-padded batches whose valid tokens
    # never reuse the pad id (the tokenizer never emits <pad> mid-text)
    input_ids = rng.integers(PAD + 1, VOCAB, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 7:] = 0
    mask[2, 3:] = 0
    input_ids[mask == 0] = PAD
    tt = np.zeros((B, L), np.int32)
    pix = rng.normal(size=(B, 3, IMG, IMG)).astype(np.float32)

    variables = tower.init(
        jax.random.key(0), jnp.asarray(input_ids), jnp.asarray(tt),
        jnp.asarray(mask), jnp.asarray(pix))
    new = convert_pretrained(
        {"model": variables["params"]}, hf_roberta.state_dict(),
        clip.vision_model.state_dict(), LAYERS, LAYERS)
    ours = tower.apply(
        {"params": new["model"]}, jnp.asarray(input_ids), jnp.asarray(tt),
        jnp.asarray(mask), jnp.asarray(pix))
    with torch.no_grad():
        theirs = hf_roberta(
            input_ids=torch.tensor(input_ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    # ALL slots, pads included: pad slots read the padding_idx position row
    # and their queries attend over the same masked keys in both stacks
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               atol=1e-4, rtol=1e-4)
