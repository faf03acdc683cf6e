"""Data pipeline tests: tokenizer, dataset transform, loader static shapes,
the corrupt-image fallback (ref: processor/dataset.py:94-97), and the sentic
graph builder (ref: processor/generate_sentic_graph.py:21-41)."""

import json
import os

import numpy as np
import pytest

from d2r_tpu.data.dataset import (
    DataLoader,
    MSDDataset,
    MSDProcessor,
    synthetic_batch,
    write_fake_dataset,
)
from d2r_tpu.data.sentic import affective_adjacency, batched_affective_adjacency
from d2r_tpu.data.tokenizer import BasicTokenizer, BertTokenizer, HashTokenizer


class TestTokenizer:
    def test_basic_tokenizer_lowercases_and_splits(self):
        t = BasicTokenizer()
        assert t.tokenize("Hello, World!") == ["hello", ",", "world", "!"]

    def test_wordpiece_with_vocab(self, tmp_path):
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "un", "##aff", "##able", "hello", "world"]
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(vocab) + "\n")
        tok = BertTokenizer.from_vocab_file(str(p))
        assert tok.tokenize("unaffable hello") == ["un", "##aff", "##able", "hello"]
        assert tok.tokenize("xyzzy") == ["[UNK]"]
        ids = tok.convert_tokens_to_ids(["hello", "world"])
        assert ids == [8, 9]

    def test_hash_tokenizer_deterministic(self):
        t = HashTokenizer(vocab_size=1000)
        a = t.convert_tokens_to_ids(t.tokenize("some stable words"))
        b = t.convert_tokens_to_ids(t.tokenize("some stable words"))
        assert a == b
        assert all(5 <= i < 1000 for i in a)

    def test_hf_parity_when_available(self, tmp_path):
        """When HF's tokenizer is importable, check WordPiece agreement on a
        local vocab (no hub access)."""
        transformers = pytest.importorskip("transformers")
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "the", "quick", "brown", "fox", "##es", "jump", "##ing",
                 "over", "lazy", "dog", ",", "!"]
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(vocab) + "\n")
        theirs = transformers.BertTokenizer(str(p), do_lower_case=True)
        ours = BertTokenizer.from_vocab_file(str(p))
        text = "The quick brown Foxes jumping over the lazy dog!"
        assert ours.tokenize(text) == theirs.tokenize(text)


class TestDataset:
    @pytest.fixture(scope="class")
    def fake_data(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("msd"))
        paths = write_fake_dataset(root, n=10, image_size=32, corrupt_every=4)
        return paths

    def test_item_shapes_and_padding(self, fake_data):
        proc = MSDProcessor(fake_data, "no-such-vocab", vocab_size=500)
        ds = MSDDataset(proc, fake_data["img_dir"], max_seq=16, mode="train",
                        image_size=32)
        item = ds[0]
        assert item["input_ids"].shape == (16,)
        assert item["attention_mask"].shape == (16,)
        assert item["pixel_values"].shape == (3, 32, 32)
        # [CLS] first, mask covers the real tokens then zeros
        assert item["input_ids"][0] == proc.tokenizer.cls_token_id
        n = int(item["attention_mask"].sum())
        assert (item["input_ids"][n:] == 0).all()
        assert item["img_mask"].shape == (50,)

    def test_corrupt_image_falls_back(self, fake_data):
        proc = MSDProcessor(fake_data, "no-such-vocab", vocab_size=500)
        ds = MSDDataset(proc, fake_data["img_dir"], max_seq=16, mode="train",
                        image_size=32)
        # item 0 was written corrupt (corrupt_every=4); must not raise and
        # must equal the preprocessed fallback image
        item = ds[0]
        from d2r_tpu.data.image import load_image
        fb = load_image(os.path.join(fake_data["img_dir"], "inf.png"), 32)
        np.testing.assert_allclose(item["pixel_values"], fb, atol=1e-6)

    def test_cache_items_serves_identical_items_with_zero_rebuilds(self, fake_data):
        """--cache_items: epoch 2 does NO host-side transform work, and the
        cached items are value-identical to freshly built ones."""
        proc = MSDProcessor(fake_data, "no-such-vocab", vocab_size=500)
        ds = MSDDataset(proc, fake_data["img_dir"], max_seq=16, mode="train",
                        image_size=32, cache_items=True)
        fresh = MSDDataset(proc, fake_data["img_dir"], max_seq=16,
                           mode="train", image_size=32)
        calls = {"n": 0}
        orig = ds._build_item

        def counting(idx):
            calls["n"] += 1
            return orig(idx)

        ds._build_item = counting
        loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                            seed=7)
        list(loader)                       # epoch 1 populates the cache
        built = calls["n"]
        assert built >= len(ds)
        list(loader)                       # epoch 2 must be all cache hits
        assert calls["n"] == built
        for i in range(len(ds)):
            a, b = ds[i], fresh[i]
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]))
        assert ds.cache_footprint_bytes() > 0

    def test_loader_static_shapes_with_wrap_padding(self, fake_data):
        proc = MSDProcessor(fake_data, "no-such-vocab", vocab_size=500)
        ds = MSDDataset(proc, fake_data["img_dir"], max_seq=16, mode="train",
                        image_size=32)
        loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
        batches = list(loader)
        assert len(batches) == 3  # 10 samples / bs 4 -> 3 batches
        for b in batches:
            assert b["input_ids"].shape == (4, 16)
            assert b["pixel_values"].shape == (4, 3, 32, 32)
        # last batch wraps: 2 valid + 2 padding
        assert batches[-1]["valid"].sum() == 2
        assert batches[0]["valid"].all()

    def test_loader_shuffles_between_epochs(self, fake_data):
        proc = MSDProcessor(fake_data, "no-such-vocab", vocab_size=500)
        ds = MSDDataset(proc, fake_data["img_dir"], max_seq=16, mode="train",
                        image_size=32)
        loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1, seed=7)
        e1 = np.concatenate([b["labels"] for b in loader])
        e2 = np.concatenate([b["labels"] for b in loader])
        assert e1.shape == e2.shape  # may coincide by chance but shapes fixed

    def test_synthetic_batch(self):
        b = synthetic_batch(4, 16, 32, seed=3)
        assert b["input_ids"].shape == (4, 16)
        assert (b["attention_mask"].sum(1) >= 4).all()
        assert b["pixel_values"].dtype == np.float32


class TestSentic:
    LEX = {"good": 0.9, "bad": -0.8}

    def test_adjacency_semantics(self):
        m = affective_adjacency("good movie", "", self.LEX)
        # 'good': 0.9+1=1.9 added to row0 and col0 (diag 2x), 'movie': 0
        assert m.shape == (2, 2)
        np.testing.assert_allclose(m[0, 0], 3.8)
        np.testing.assert_allclose(m[0, 1], 1.9)
        np.testing.assert_allclose(m[1, 0], 1.9)
        np.testing.assert_allclose(m[1, 1], 1.0)  # zero diag forced to 1

    def test_aspect_bonus(self):
        m = affective_adjacency("good", "good things", self.LEX)
        np.testing.assert_allclose(m[0, 0], (0.9 + 1 + 1) * 2)

    def test_batched_padding(self):
        out = batched_affective_adjacency(["good bad", "bad"], self.LEX, max_seq=4)
        assert out.shape == (2, 4, 4)
        # padding rows keep unit diagonal
        np.testing.assert_allclose(out[1, 3, 3], 1.0)
        np.testing.assert_allclose(out[1, 2, 3], 0.0)

    def test_vendored_lexicon_loads_by_default(self):
        # the reference's 39,891-entry asset is vendored
        # (ref: processor/senticnet_word.txt)
        from d2r_tpu.data.sentic import load_sentic_lexicon
        lex = load_sentic_lexicon()
        assert len(lex) == 39891
        np.testing.assert_allclose(lex["bombastic"], -0.96)
        assert all(-1.0 <= v <= 1.0 for v in lex.values())


class TestPixelTransfer:
    """pixel_transfer='uint8' ships raw resized pixels; the model's
    device-side normalisation must reproduce host-side float32 exactly on
    the PIL path (identical fp32 op order) and within 1 LSB on the native
    path (it re-quantises a float resample)."""

    @pytest.fixture(scope="class")
    def fake_data(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("msd_u8"))
        return write_fake_dataset(root, n=6, image_size=32, corrupt_every=4)

    def test_uint8_matches_float32_after_device_normalise(self, fake_data):
        import jax.numpy as jnp

        from d2r_tpu.data.image import CLIP_MEAN, CLIP_STD

        proc = MSDProcessor(fake_data, "no-such-vocab", vocab_size=500)
        ds32 = MSDDataset(proc, fake_data["img_dir"], max_seq=16, mode="train",
                          image_size=32, pixel_transfer="float32")
        ds8 = MSDDataset(proc, fake_data["img_dir"], max_seq=16, mode="train",
                         image_size=32, pixel_transfer="uint8")
        for i in range(len(ds8)):
            raw = ds8[i]["pixel_values"]
            assert raw.dtype == np.uint8
            # the exact op order CLIPVisionEmbeddings applies on device
            dev = np.asarray(
                (jnp.asarray(raw).astype(jnp.float32) / 255.0
                 - jnp.asarray(CLIP_MEAN, jnp.float32)[:, None, None])
                / jnp.asarray(CLIP_STD, jnp.float32)[:, None, None])
            host = ds32[i]["pixel_values"]
            # 1 uint8 LSB after normalisation: (1/255)/std ~ 0.015
            np.testing.assert_allclose(dev, host, atol=0.016)

    def test_text_only_placeholder_normalises_to_zero(self, fake_data):
        """img_path=None: the uint8 placeholder must be the CLIP mean pixel
        so device normalisation maps it to ~0 — matching the float32 path's
        already-normalised zeros (raw uint8 ZEROS would be black pixels)."""
        from d2r_tpu.data.image import CLIP_MEAN, CLIP_STD

        proc = MSDProcessor(fake_data, "no-such-vocab", vocab_size=500)
        ds8 = MSDDataset(proc, None, max_seq=16, mode="train",
                         image_size=32, pixel_transfer="uint8")
        raw = ds8[0]["pixel_values"]
        assert raw.dtype == np.uint8
        dev = ((raw.astype(np.float32) / 255.0 - CLIP_MEAN[:, None, None])
               / CLIP_STD[:, None, None])
        # within 1 uint8 quantisation LSB of the float32 path's zeros
        assert np.abs(dev).max() <= (0.5 / 255.0) / CLIP_STD.min() + 1e-6

        ds32 = MSDDataset(proc, None, max_seq=16, mode="train",
                          image_size=32, pixel_transfer="float32")
        assert ds32[0]["pixel_values"].dtype == np.float32
        np.testing.assert_array_equal(ds32[0]["pixel_values"], 0.0)

    def test_model_accepts_uint8_pixels(self):
        import jax
        import jax.numpy as jnp

        from d2r_tpu.config import tiny_test_config
        from d2r_tpu.models.vit import CLIPVisionEmbeddings

        cfg = tiny_test_config().vision_config()
        rng = np.random.RandomState(0)
        u8 = rng.randint(0, 256, size=(2, 3, cfg.image_size, cfg.image_size)
                         ).astype(np.uint8)
        f32 = ((u8.astype(np.float32) / 255.0
                - np.asarray([0.48145466, 0.4578275, 0.40821073],
                             np.float32)[:, None, None])
               / np.asarray([0.26862954, 0.26130258, 0.27577711],
                            np.float32)[:, None, None])
        mod = CLIPVisionEmbeddings(cfg)
        variables = mod.init(jax.random.key(0), jnp.asarray(f32))
        out_f32 = mod.apply(variables, jnp.asarray(f32))
        out_u8 = mod.apply(variables, jnp.asarray(u8))
        np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f32),
                                   atol=1e-5, rtol=1e-5)
