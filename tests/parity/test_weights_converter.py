"""Production weight-converter tests (d2r_tpu/utils/weights.py).

Round-1 gap: the production converter — the gate to the F1-parity north
star — had zero tests; the parity suite used a second, module-object-based
converter (tests/parity/convert.py). Here the PRODUCTION path
(torch ``state_dict`` -> ``convert_pretrained``) is exercised end-to-end
against live HF models: converted tower forwards must match HF outputs,
which covers the fused-QKV concat, the conv (out,in,kh,kw)->(kh,kw,in,out)
transpose, the HF ``pre_layrnorm`` spelling, and the unused-key whitelist.
The substring surgery being replaced is ref: modules/train.py:92-111.
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
VOCAB, MAXPOS = 99, 64
IMG, PATCH = 32, 16


class _Towers(nn.Module):
    """Both towers under the exact production param paths the converter
    writes to (models/unimo.py names)."""

    tc: TextEncoderConfig
    vc: VisionEncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, key_bias, pixel_values):
        t = BertEmbeddings(self.tc, name="text_embeddings")(
            input_ids, token_type_ids, True)
        t = BertEncoder(self.tc, use_pallas=False,
                        name="encoder_text_layers")(t, key_bias, True)
        v = CLIPVisionEmbeddings(self.vc, name="vision_embeddings")(pixel_values)
        v = nn.LayerNorm(epsilon=self.vc.layer_norm_eps,
                         name="vision_pre_layernorm")(v)
        v = CLIPVisionEncoder(self.vc, use_pallas=False,
                              name="encoder_vision_layers")(v, True)
        return t, v


def _our_configs():
    tc = TextEncoderConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=MAXPOS)
    vc = VisionEncoderConfig(
        hidden_size=HID, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, image_size=IMG, patch_size=PATCH)
    return tc, vc


@pytest.fixture(scope="module")
def hf_models():
    from transformers import (BertConfig, BertModel, CLIPVisionConfig,
                              CLIPVisionModel)
    torch.manual_seed(0)
    bcfg = BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, type_vocab_size=2, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    bert = BertModel(bcfg).eval()
    vcfg = CLIPVisionConfig(
        hidden_size=HID, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=INTER, image_size=IMG, patch_size=PATCH)
    clip = CLIPVisionModel(vcfg).eval()
    return bert, clip


@pytest.fixture(scope="module")
def converted(hf_models):
    bert, clip = hf_models
    tc, vc = _our_configs()
    towers = _Towers(tc, vc)
    rng = np.random.default_rng(0)
    B, L = 2, 10
    input_ids = rng.integers(0, VOCAB, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 6:] = 0
    tt = np.zeros((B, L), np.int32)
    pix = rng.normal(size=(B, 3, IMG, IMG)).astype(np.float32)
    variables = towers.init(
        jax.random.key(0), jnp.asarray(input_ids), jnp.asarray(tt),
        padding_key_bias(jnp.asarray(mask)), jnp.asarray(pix))
    new = convert_pretrained(
        {"model": variables["params"]}, bert.state_dict(),
        clip.vision_model.state_dict(), LAYERS, LAYERS)
    return towers, new["model"], (input_ids, mask, tt, pix)


class TestConvertedForwardParity:
    def test_text_tower_matches_hf(self, hf_models, converted):
        bert, _ = hf_models
        towers, params, (input_ids, mask, tt, pix) = converted
        ours_t, _ = towers.apply(
            {"params": params}, jnp.asarray(input_ids), jnp.asarray(tt),
            padding_key_bias(jnp.asarray(mask)), jnp.asarray(pix))
        with torch.no_grad():
            theirs = bert(
                input_ids=torch.tensor(input_ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                token_type_ids=torch.tensor(tt.astype(np.int64)),
            ).last_hidden_state.numpy()
        # padded positions attend degenerately in both; compare valid tokens
        valid = mask.astype(bool)
        np.testing.assert_allclose(
            np.asarray(ours_t)[valid], theirs[valid], atol=1e-4, rtol=1e-4)

    def test_vision_tower_matches_hf(self, hf_models, converted):
        _, clip = hf_models
        towers, params, (input_ids, mask, tt, pix) = converted
        _, ours_v = towers.apply(
            {"params": params}, jnp.asarray(input_ids), jnp.asarray(tt),
            padding_key_bias(jnp.asarray(mask)), jnp.asarray(pix))
        with torch.no_grad():
            theirs = clip(
                pixel_values=torch.tensor(pix)).last_hidden_state.numpy()
        np.testing.assert_allclose(
            np.asarray(ours_v), theirs, atol=1e-4, rtol=1e-4)


class TestConverterGuards:
    def _tree(self, hf_models):
        bert, clip = hf_models
        tc, vc = _our_configs()
        towers = _Towers(tc, vc)
        variables = towers.init(
            jax.random.key(0), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.float32),
            jnp.zeros((1, 3, IMG, IMG), jnp.float32))
        return {"model": variables["params"]}, bert, clip

    def test_unconsumed_key_raises(self, hf_models):
        tree, bert, clip = self._tree(hf_models)
        sd = dict(bert.state_dict())
        sd["rogue.weight"] = torch.zeros(1)
        with pytest.raises(AssertionError, match="unconsumed"):
            convert_pretrained(tree, sd, clip.vision_model.state_dict(),
                               LAYERS, LAYERS)

    def test_missing_key_raises(self, hf_models):
        tree, bert, clip = self._tree(hf_models)
        sd = dict(bert.state_dict())
        del sd["encoder.layer.0.attention.self.query.weight"]
        with pytest.raises(KeyError, match="missing source key"):
            convert_pretrained(tree, sd, clip.vision_model.state_dict(),
                               LAYERS, LAYERS)

    def test_shape_mismatch_raises(self, hf_models):
        tree, bert, clip = self._tree(hf_models)
        sd = dict(bert.state_dict())
        sd["embeddings.word_embeddings.weight"] = torch.zeros(VOCAB, HID + 1)
        with pytest.raises(ValueError, match="shape mismatch"):
            convert_pretrained(tree, sd, clip.vision_model.state_dict(),
                               LAYERS, LAYERS)

    def test_whitelisted_keys_tolerated(self, hf_models):
        # BertModel ships pooler.*; CLIPVisionModel ships post_layernorm.*;
        # both are on the unused whitelist (the reference instead instantiates
        # dummy modules so its coverage assert passes, ref: modeling_unimo.py:743,784)
        tree, bert, clip = self._tree(hf_models)
        assert any(k.startswith("pooler.") for k in bert.state_dict())
        assert any(k.startswith("post_layernorm.")
                   for k in clip.vision_model.state_dict())
        convert_pretrained(tree, bert.state_dict(),
                           clip.vision_model.state_dict(), LAYERS, LAYERS)
