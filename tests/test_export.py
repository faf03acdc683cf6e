"""StableHLO serving-artifact export/reload (d2r_tpu/export.py).

The artifact must reproduce the live Predictor's probabilities exactly,
inherit all request plumbing (bucketing, padding-strip), and fail loudly on
dtype / manifest-version mismatches instead of serving wrong numbers.
"""

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.export import export_predictor, load_exported
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.serve import Predictor


@functools.lru_cache(maxsize=1)
def _setup():
    cfg = tiny_test_config()
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(4, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["pixel_values"]))
    return cfg, variables, batch


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """One exported artifact shared by the module's tests (float32 pixels —
    the synthetic_batch transfer dtype). export_predictor's built-in
    self-check already asserts disk-roundtrip == live forward."""
    cfg, variables, batch = _setup()
    out = str(tmp_path_factory.mktemp("export"))
    manifest = export_predictor(cfg, variables, out, batch_buckets=(1, 4),
                                pixel_dtype=jnp.float32)
    return out, manifest


def test_exported_matches_predictor_through_bucket_plumbing(artifact):
    """3 rows into a 4-bucket: the exported path must pad, strip, and
    agree with the live model bit-for-bit (same program, same inputs)."""
    out_dir, _ = artifact
    cfg, variables, batch = _setup()
    live = Predictor(cfg, variables, batch_buckets=(1, 4))
    loaded = load_exported(out_dir, variables)
    assert loaded.model is None  # no traced Flax model on the serving host
    args = (batch["input_ids"][:3], batch["attention_mask"][:3],
            batch["token_type_ids"][:3], batch["pixel_values"][:3])
    want = live.predict(*args)
    got = loaded.predict(*args)
    assert got["probs"].shape == (3, cfg.num_classes)
    np.testing.assert_array_equal(got["label"], want["label"])
    np.testing.assert_allclose(got["probs"], want["probs"], atol=1e-6)


def test_exported_rejects_wrong_pixel_dtype(artifact):
    out_dir, _ = artifact
    cfg, variables, batch = _setup()
    loaded = load_exported(out_dir, variables)
    with pytest.raises(ValueError, match="pixel dtype"):
        loaded.predict(batch["input_ids"][:1], batch["attention_mask"][:1],
                       batch["token_type_ids"][:1],
                       batch["pixel_values"][:1].astype(np.uint8))


def test_exported_rejects_unknown_manifest_version(artifact):
    out_dir, _ = artifact
    cfg, variables, _ = _setup()
    path = os.path.join(out_dir, "manifest.json")
    manifest = json.load(open(path))
    try:
        json.dump(dict(manifest, version=999), open(path, "w"))
        with pytest.raises(ValueError, match="manifest version"):
            load_exported(out_dir, variables)
    finally:
        json.dump(manifest, open(path, "w"))


def test_exported_rejects_wrong_geometry_variables(artifact):
    """A checkpoint whose shapes disagree with the exported calling
    convention must error at call time, not silently mis-serve."""
    out_dir, _ = artifact
    cfg, variables, batch = _setup()
    wrong = jax.tree_util.tree_map(
        lambda x: jnp.zeros((3,) + tuple(x.shape[1:]), x.dtype)
        if jnp.ndim(x) >= 1 else x, variables)
    loaded = load_exported(out_dir, wrong)
    with pytest.raises(Exception):
        loaded.predict(batch["input_ids"][:1], batch["attention_mask"][:1],
                       batch["token_type_ids"][:1], batch["pixel_values"][:1])


def test_manifest_contents(artifact):
    out_dir, manifest = artifact
    assert manifest["batch_buckets"] == [1, 4]
    assert manifest["pixel_dtype"] == "float32"
    assert set(manifest["files"]) == {"1", "4"}
    for fname in manifest["files"].values():
        assert os.path.getsize(os.path.join(out_dir, fname)) > 0
    assert os.path.exists(os.path.join(out_dir, "config.json"))


def test_quantized_export_roundtrip(tmp_path):
    """--quantize int8 bakes the weight-only int8 forward into the artifact:
    the exported calling convention takes the QUANTIZED tree, load_exported
    re-quantizes the paired checkpoint per the manifest, and the reloaded
    predictions match the live quantized Predictor exactly."""
    cfg, variables, batch = _setup()
    out = str(tmp_path / "export_q")
    manifest = export_predictor(cfg, variables, out, batch_buckets=(1, 4),
                                pixel_dtype=jnp.float32, quantize="int8")
    assert manifest["quantize"] == "int8"

    live = Predictor(cfg, variables, batch_buckets=(1, 4), quantize="int8")
    loaded = load_exported(out, variables)
    assert loaded.quantize == "int8"
    args = (batch["input_ids"][:3], batch["attention_mask"][:3],
            batch["token_type_ids"][:3], batch["pixel_values"][:3])
    want = live.predict(*args)
    got = loaded.predict(*args)
    np.testing.assert_allclose(got["probs"], want["probs"], atol=1e-6)

    # and the quantized path really differs from (while agreeing closely
    # with) the fp32 artifact -- guards against quantize being a no-op
    dense = Predictor(cfg, variables, batch_buckets=(1, 4))
    ref = dense.predict(*args)
    assert not np.array_equal(got["probs"], ref["probs"])
    np.testing.assert_allclose(got["probs"], ref["probs"], atol=0.05)
