"""Golden-tensor parity: encoder layers and the FULL UnimoModelF forward
(loss + logits) vs the torch reference, eval mode, fp32 CPU."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.parity import convert  # noqa: E402
from tests.parity.ref_loader import (  # noqa: E402
    import_reference,
    make_flax_config,
    make_ref_args,
    write_tiny_config_dirs,
)

B, L, D = 4, 16, 768


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cfgs"))
    bert_dir, clip_dir = write_tiny_config_dirs(root)
    mods = import_reference()
    args = make_ref_args(bert_dir, clip_dir)
    return mods, args


@pytest.fixture(scope="module")
def cfg():
    return make_flax_config()


def _t2n(t):
    return t.detach().cpu().numpy()


class TestEncoderLayers:
    def test_bert_layer_with_mask(self, ref, cfg):
        mods, args = ref
        from transformers import BertConfig
        torch.manual_seed(0)
        bc = BertConfig.from_pretrained(args.bert_name)
        rmod = mods["unimo"].BertLayer(bc).eval()

        rng = np.random.default_rng(0)
        x = rng.normal(size=(B, L, D)).astype(np.float32)
        mask = np.ones((B, L), np.float32)
        mask[:, L // 2:] = 0.0
        ext = mods["unimo"].get_extended_attention_mask(
            torch.tensor(mask), (B, L), "cpu")
        expect = rmod(torch.tensor(x), attention_mask=ext)[0]

        from d2r_tpu.models.bert import BertLayer
        from d2r_tpu.ops.attention import padding_key_bias
        ours = BertLayer(cfg.text_config(), use_pallas=False)
        vs = convert.as_variables(convert.bert_layer(rmod))
        got = ours.apply(vs, jnp.asarray(x), padding_key_bias(jnp.asarray(mask)))
        np.testing.assert_allclose(np.asarray(got), _t2n(expect), atol=2e-4)

    def test_clip_layer(self, ref, cfg):
        mods, args = ref
        from transformers import CLIPConfig
        torch.manual_seed(1)
        vc = CLIPConfig.from_pretrained(args.vit_name).vision_config
        rmod = mods["unimo"].CLIPEncoderLayer(vc).eval()

        rng = np.random.default_rng(1)
        x = rng.normal(size=(B, 5, D)).astype(np.float32)
        expect = rmod(torch.tensor(x))[0]

        from d2r_tpu.models.vit import CLIPEncoderLayer
        ours = CLIPEncoderLayer(cfg.vision_config(), use_pallas=False)
        vs = convert.as_variables(convert.clip_layer(rmod))
        got = ours.apply(vs, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), _t2n(expect), atol=2e-4)

    def test_embeddings(self, ref, cfg):
        mods, args = ref
        from transformers import BertConfig, CLIPConfig
        torch.manual_seed(2)
        bc = BertConfig.from_pretrained(args.bert_name)
        vc = CLIPConfig.from_pretrained(args.vit_name).vision_config

        remb = mods["unimo"].BertEmbeddings(bc).eval()
        ids = np.random.default_rng(2).integers(0, 128, size=(B, L))
        tt = np.zeros((B, L), np.int64)
        expect = remb(torch.tensor(ids), token_type_ids=torch.tensor(tt))

        from d2r_tpu.models.bert import BertEmbeddings
        ours = BertEmbeddings(cfg.text_config())
        vs = convert.as_variables(convert.bert_embeddings(remb))
        got = ours.apply(vs, jnp.asarray(ids), jnp.asarray(tt, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), _t2n(expect), atol=2e-4)

        rvemb = mods["unimo"].CLIPVisionEmbeddings(vc).eval()
        pix = np.random.default_rng(3).normal(size=(B, 3, 32, 32)).astype(np.float32)
        expect_v = rvemb(torch.tensor(pix))

        from d2r_tpu.models.vit import CLIPVisionEmbeddings
        ours_v = CLIPVisionEmbeddings(cfg.vision_config())
        vs_v = convert.as_variables(convert.clip_embeddings(rvemb))
        got_v = ours_v.apply(vs_v, jnp.asarray(pix))
        np.testing.assert_allclose(np.asarray(got_v), _t2n(expect_v), atol=2e-4)


class TestFullModel:
    def test_unimo_model_f_loss_and_logits(self, ref, cfg):
        mods, args = ref
        from transformers import BertConfig, CLIPConfig
        torch.manual_seed(3)
        bc = BertConfig.from_pretrained(args.bert_name)
        vc = CLIPConfig.from_pretrained(args.vit_name).vision_config
        rmod = mods["model"].UnimoModelF(args, vc, bc).eval()

        rng = np.random.default_rng(4)
        ids = rng.integers(0, 128, size=(B, L))
        mask = np.ones((B, L), np.float32)
        mask[:, 10:] = 0.0
        tt = np.zeros((B, L), np.int64)
        labels = np.array([0, 1, 2, 1])
        pix = rng.normal(size=(B, 3, 32, 32)).astype(np.float32)

        with torch.no_grad():
            ref_loss, ref_logits = rmod(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                token_type_ids=torch.tensor(tt),
                labels=torch.tensor(labels),
                images=torch.tensor(pix))

        from d2r_tpu.models.unimo import D2RClassifier
        ours = D2RClassifier(cfg)
        vs = convert.unimo_model_f(rmod)
        loss, logits, aux = jax.jit(
            lambda v, *a: ours.apply(v, *a))(
            {"params": vs["params"], "batch_stats": vs["batch_stats"]},
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt, jnp.int32),
            jnp.asarray(labels), jnp.asarray(pix))

        np.testing.assert_allclose(np.asarray(logits), _t2n(ref_logits),
                                   atol=1e-3, err_msg="full-model logits")
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-3,
                                   err_msg="full-model loss (CE + js)")

        # js component separately (ref: modeling_unimo.py:848-849)
        with torch.no_grad():
            _, ref_js = rmod.model(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                token_type_ids=torch.tensor(tt),
                pixel_values=torch.tensor(pix),
                return_dict=True)
        np.testing.assert_allclose(float(aux["js_loss"]), float(ref_js),
                                   atol=1e-4, err_msg="js component")
