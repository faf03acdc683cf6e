"""Unit tests for ops: attention, losses, norms, metrics — several verified
against torch/sklearn (both CPU-only, used as oracles; never at runtime)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.ops.attention import dot_product_attention, padding_key_bias, split_heads, merge_heads
from d2r_tpu.ops.losses import cross_entropy_loss, js_div, kl_div_batchmean
from d2r_tpu.ops.norms import l1norm, l2norm, torch_style_normalize


class TestAttention:
    # layout: (B, L, H, D) — see ops/attention.py

    def test_matches_manual_softmax(self):
        rng = np.random.default_rng(0)
        b, l, s, h, d = 2, 8, 6, 3, 16
        q = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        out = dot_product_attention(q, k, v, use_pallas=False)

        scores = np.einsum("blhd,bshd->bhls", q, k) / np.sqrt(d)
        e = np.exp(scores - scores.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        expect = np.einsum("bhls,bshd->blhd", p, v)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_key_bias_masks_padding(self):
        rng = np.random.default_rng(1)
        b, l, s, h, d = 1, 4, 6, 1, 8
        q = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        mask = jnp.array([[1, 1, 1, 0, 0, 0]])
        bias = padding_key_bias(mask)
        out_masked = dot_product_attention(q, k, v, key_bias=bias, use_pallas=False)
        # equivalent: attention over only the first 3 keys
        out_sliced = dot_product_attention(q, k[:, :3], v[:, :3], use_pallas=False)
        np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_sliced), atol=1e-4)

    def test_pad_ragged_seq_is_exact(self):
        """PAD_RAGGED_SEQ (50 vision tokens -> 64 inside the einsum path)
        must not change the math: padded keys' -1e9 bias underflows to
        exactly 0 probability, padded query rows are sliced off."""
        from d2r_tpu.ops import attention

        rng = np.random.default_rng(3)
        b, l, s, h, d = 2, 50, 50, 4, 16
        q = jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        mask = np.asarray(rng.integers(0, 2, size=(b, s)))
        mask[:, 0] = 1  # keep each row's first key so no row is fully masked
        assert mask.min() == 0, "mask must exercise real padding columns"
        mask = jnp.asarray(mask)
        bias = padding_key_bias(mask)
        baseline = dot_product_attention(q, k, v, key_bias=bias,
                                         use_pallas=False)
        no_bias_baseline = dot_product_attention(q, k, v, use_pallas=False)
        prev = attention.PAD_RAGGED_SEQ
        attention.PAD_RAGGED_SEQ = True
        try:
            padded = dot_product_attention(q, k, v, key_bias=bias,
                                           use_pallas=False)
            padded_nb = dot_product_attention(q, k, v, use_pallas=False)
        finally:
            attention.PAD_RAGGED_SEQ = prev
        assert padded.shape == baseline.shape
        np.testing.assert_allclose(np.asarray(padded), np.asarray(baseline),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(padded_nb),
                                   np.asarray(no_bias_baseline), atol=1e-6)

    def test_split_merge_roundtrip(self):
        x = jnp.arange(2 * 4 * 12, dtype=jnp.float32).reshape(2, 4, 12)
        np.testing.assert_array_equal(
            np.asarray(merge_heads(split_heads(x, 3))), np.asarray(x))

    def test_torch_parity(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        b, h, l, d = 2, 4, 10, 16
        q = rng.normal(size=(b, h, l, d)).astype(np.float32)
        k = rng.normal(size=(b, h, l, d)).astype(np.float32)
        v = rng.normal(size=(b, h, l, d)).astype(np.float32)
        # ours takes (B, L, H, D)
        ours = dot_product_attention(
            jnp.asarray(q).transpose(0, 2, 1, 3),
            jnp.asarray(k).transpose(0, 2, 1, 3),
            jnp.asarray(v).transpose(0, 2, 1, 3), use_pallas=False)
        theirs = torch.nn.functional.scaled_dot_product_attention(
            torch.tensor(q), torch.tensor(k), torch.tensor(v))
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1, 3),
                                   theirs.numpy(), atol=2e-5)


class TestLosses:
    def test_kl_batchmean_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        p = rng.dirichlet(np.ones(5), size=4).astype(np.float32)
        m = rng.dirichlet(np.ones(5), size=4).astype(np.float32)
        ours = kl_div_batchmean(jnp.log(jnp.asarray(m)), jnp.asarray(p))
        theirs = torch.nn.KLDivLoss(reduction="batchmean")(
            torch.tensor(np.log(m)), torch.tensor(p))
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    def test_js_div_matches_reference_formula(self):
        """JS against a from-scratch numpy transcription of the math at
        ref: models/XModules.py:32-41."""
        rng = np.random.default_rng(4)
        a = rng.normal(size=(6, 6)).astype(np.float32)
        b = rng.normal(size=(6, 6)).astype(np.float32)

        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        p, q = softmax(a), softmax(b)
        m = np.log((p + q) / 2)
        kl = lambda tgt: np.sum(tgt * (np.log(tgt) - m)) / tgt.shape[0]
        expect = (kl(p) + kl(q)) / 2
        np.testing.assert_allclose(float(js_div(jnp.asarray(a), jnp.asarray(b))),
                                   expect, rtol=1e-5)

    def test_js_div_zero_for_identical(self):
        a = jnp.asarray(np.random.default_rng(5).normal(size=(4, 4)), jnp.float32)
        assert abs(float(js_div(a, a))) < 1e-6

    def test_js_div_valid_mask_equals_submatrix(self):
        # masked JS over a wrap-padded (B,B) Gram == plain JS over the valid
        # (r,r) submatrix — the reference's ragged-final-batch math
        # (ref: models/modeling_unimo.py:845-849)
        rng = np.random.default_rng(7)
        B, r = 8, 5
        p = rng.normal(size=(B, B)).astype(np.float32)
        q = rng.normal(size=(B, B)).astype(np.float32)
        valid = np.zeros(B, bool)
        valid[:r] = True
        masked = float(js_div(jnp.asarray(p), jnp.asarray(q),
                              valid=jnp.asarray(valid)))
        sub = float(js_div(jnp.asarray(p[:r, :r]), jnp.asarray(q[:r, :r])))
        np.testing.assert_allclose(masked, sub, rtol=1e-6)

    def test_js_div_all_valid_equals_unmasked(self):
        rng = np.random.default_rng(8)
        p = rng.normal(size=(6, 6)).astype(np.float32)
        q = rng.normal(size=(6, 6)).astype(np.float32)
        ones = jnp.ones(6, bool)
        np.testing.assert_allclose(
            float(js_div(jnp.asarray(p), jnp.asarray(q), valid=ones)),
            float(js_div(jnp.asarray(p), jnp.asarray(q))), rtol=1e-6)

    def test_cross_entropy_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(6)
        logits = rng.normal(size=(8, 3)).astype(np.float32)
        labels = rng.integers(0, 3, size=8)
        ours = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
        theirs = torch.nn.CrossEntropyLoss()(
            torch.tensor(logits), torch.tensor(labels))
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-6)


class TestNorms:
    def test_l2norm_eps_placement(self):
        x = jnp.asarray([[3.0, 4.0]])
        out = np.asarray(l2norm(x))
        np.testing.assert_allclose(out, [[3 / (5 + 1e-8), 4 / (5 + 1e-8)]], rtol=1e-6)

    def test_l1norm(self):
        x = jnp.asarray([[1.0, -3.0]])
        np.testing.assert_allclose(
            np.asarray(l1norm(x, axis=-1)), [[1 / 4.0, -3 / 4.0]], rtol=1e-5)

    def test_torch_normalize_parity(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(7).normal(size=(4, 9)).astype(np.float32)
        ours = torch_style_normalize(jnp.asarray(x))
        theirs = torch.nn.functional.normalize(torch.tensor(x), p=2, dim=-1)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


class TestMetrics:
    def test_weighted_metrics_match_sklearn(self):
        sk = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(8)
        labels = rng.integers(0, 3, size=100)
        preds = rng.integers(0, 3, size=100)
        from d2r_tpu.train.metrics import get_four_metrics
        m = get_four_metrics(labels, preds, average="weighted", num_classes=3)
        assert abs(m["accuracy"] - sk.accuracy_score(labels, preds)) < 1e-9
        assert abs(m["f_score"] - sk.f1_score(labels, preds, average="weighted")) < 1e-9
        assert abs(m["precision"] - sk.precision_score(
            labels, preds, average="weighted", zero_division=0)) < 1e-9
        assert abs(m["recall"] - sk.recall_score(labels, preds, average="weighted")) < 1e-9
