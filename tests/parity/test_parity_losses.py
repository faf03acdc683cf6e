"""Parity for the auxiliary loss library vs the reference's torch versions."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from d2r_tpu.ops.losses_extra import diff_loss, soft_contrastive_loss, supcon_loss  # noqa: E402
from tests.parity.ref_loader import import_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def test_soft_contrastive_loss(ref):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 16)).astype(np.float32)
    b = rng.normal(size=(6, 16)).astype(np.float32)
    # normalise like the reference call sites do
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)

    rmod = ref["xm"].SoftContrastiveLoss(
        alpha=0.3, margin=0.2, max_violation=True,
        threshold_hetero=0.5, threshold_homo=0.5)
    expect = rmod(torch.tensor(a), torch.tensor(b))
    got = soft_contrastive_loss(jnp.asarray(a), jnp.asarray(b), alpha=0.3,
                                margin=0.2, max_violation=True,
                                threshold_hetero=0.5, threshold_homo=0.5)
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)


def test_diff_loss(ref):
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(4, 5, 8)).astype(np.float32)
    x2 = rng.normal(size=(4, 5, 8)).astype(np.float32)
    rmod = ref["xm"].DiffLoss(None)
    expect = rmod(torch.tensor(x1), torch.tensor(x2))
    got = diff_loss(jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)


def test_labeled_js_div(ref):
    from d2r_tpu.ops.losses_extra import labeled_js_div
    rng = np.random.default_rng(5)
    p = rng.normal(size=(6, 2)).astype(np.float32)
    q = rng.normal(size=(6, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=6).astype(np.float32)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        expect = ref["model"].js_div(torch.tensor(p), torch.tensor(q),
                                     torch.tensor(labels))
    got = labeled_js_div(jnp.asarray(p), jnp.asarray(q), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)


def test_supcon_loss(ref):
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(6, 2, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = np.array([0, 1, 2, 0, 1, 2])
    sim = rng.random(12).astype(np.float32)  # (B * n_views,)

    rmod = ref["model"].SupConLoss(temperature=0.07)
    expect = rmod(torch.tensor(feats), labels=torch.tensor(labels),
                  similary=torch.tensor(sim))
    got = supcon_loss(jnp.asarray(feats), labels=jnp.asarray(labels),
                      similarity=jnp.asarray(sim), temperature=0.07)
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-4)
