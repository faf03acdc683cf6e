"""Serving-path tests: bucketing, padding-strip, jit-cache reuse."""

import numpy as np
import jax

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.serve import Predictor


import functools


@functools.lru_cache(maxsize=1)
def _setup():
    cfg = tiny_test_config()
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(4, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    import jax.numpy as jnp
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["pixel_values"]))
    return cfg, variables, batch


def test_predict_strips_padding_and_buckets():
    cfg, variables, batch = _setup()
    pred = Predictor(cfg, variables, batch_buckets=(2, 4),
                     seq_buckets=(cfg.max_seq,))
    out = pred.predict(batch["input_ids"][:3], batch["attention_mask"][:3],
                       batch["token_type_ids"][:3], batch["pixel_values"][:3])
    assert out["label"].shape == (3,)          # 3 rows in a 4-bucket
    assert out["probs"].shape == (3, cfg.num_classes)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-5)
    assert (0 <= out["label"]).all() and (out["label"] < cfg.num_classes).all()


def test_bucketed_result_matches_exact_batch():
    cfg, variables, batch = _setup()
    pred = Predictor(cfg, variables, batch_buckets=(4,), seq_buckets=(cfg.max_seq,))
    full = pred.predict(batch["input_ids"], batch["attention_mask"],
                        batch["token_type_ids"], batch["pixel_values"])
    # row 0 alone, padded into the same bucket, must give the same probs:
    # padding rows cannot leak into real rows' logits... note the JS Gram
    # matrices touch the whole batch but logits only depend on per-row
    # streams; verify that claim empirically.
    one = pred.predict(batch["input_ids"][:1], batch["attention_mask"][:1],
                       batch["token_type_ids"][:1], batch["pixel_values"][:1])
    np.testing.assert_allclose(one["probs"][0], full["probs"][0], atol=2e-5)


def test_multi_seq_buckets_rejected():
    """The router pad-pooling quirk makes logits depend on padded seq length,
    so multi-bucket seq serving would be a silent correctness bug."""
    import pytest

    cfg, variables, _ = _setup()
    with pytest.raises(ValueError, match="pad-pooling"):
        Predictor(cfg, variables, seq_buckets=(8, cfg.max_seq))
    # single non-default bucket is fine
    Predictor(cfg, variables, seq_buckets=(cfg.max_seq,))


def test_batch_bucket_choice_is_invariant():
    """BATCH bucketing is the safe axis: the same rows served through a
    2-bucket and a 4-bucket give the same probabilities."""
    cfg, variables, batch = _setup()
    pred_small = Predictor(cfg, variables, batch_buckets=(2,),
                           seq_buckets=(cfg.max_seq,))
    pred_big = Predictor(cfg, variables, batch_buckets=(4,),
                         seq_buckets=(cfg.max_seq,))
    a = pred_small.predict(batch["input_ids"][:2], batch["attention_mask"][:2],
                           batch["token_type_ids"][:2], batch["pixel_values"][:2])
    b = pred_big.predict(batch["input_ids"][:2], batch["attention_mask"][:2],
                         batch["token_type_ids"][:2], batch["pixel_values"][:2])
    np.testing.assert_allclose(a["probs"], b["probs"], atol=2e-5)


def test_jit_cache_reused_across_requests():
    cfg, variables, batch = _setup()
    pred = Predictor(cfg, variables, batch_buckets=(4,), seq_buckets=(cfg.max_seq,))
    pred.predict(batch["input_ids"], batch["attention_mask"],
                 batch["token_type_ids"], batch["pixel_values"])
    assert len(pred._fns) == 1
    pred.predict(batch["input_ids"][:2], batch["attention_mask"][:2],
                 batch["token_type_ids"][:2], batch["pixel_values"][:2])
    assert len(pred._fns) == 1  # same bucket -> same compiled fn


def test_mesh_serving_matches_single_device():
    """Multi-chip serving (BASELINE config 5): the same requests through a
    4-way DP mesh and a 2x2 dp x tp mesh reproduce the plain single-device
    probabilities; TP rules actually fire on the tower params."""
    from jax.sharding import PartitionSpec as P

    from d2r_tpu.parallel.mesh import make_mesh

    cfg, variables, batch = _setup()
    args = (batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], batch["pixel_values"])
    want = Predictor(cfg, variables, batch_buckets=(4,)).predict(*args)

    dp = Predictor(cfg, variables, batch_buckets=(4,),
                   mesh=make_mesh((4,), ("data",)))
    np.testing.assert_allclose(dp.predict(*args)["probs"], want["probs"],
                               atol=1e-5)

    tp = Predictor(cfg, variables, batch_buckets=(4,),
                   mesh=make_mesh((2, 2), ("data", "model")))
    np.testing.assert_allclose(tp.predict(*args)["probs"], want["probs"],
                               atol=1e-5)
    specs = {s.spec for s in jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, tp.variables))}
    assert any(s != P() for s in specs), "no TP rule fired on the params"


def test_mesh_warmup_compiles_the_serving_programs():
    """Warmup must stage inputs with the same shardings predict() uses, or
    it compiles programs the requests never hit (jit specializes on
    shardings). Guard: after warmup, predict() reuses the cached fn."""
    from d2r_tpu.parallel.mesh import make_mesh

    cfg, variables, batch = _setup()
    pred = Predictor(cfg, variables, batch_buckets=(4,),
                     mesh=make_mesh((4,), ("data",)))
    pred.warmup(pixel_dtype=batch["pixel_values"].dtype)
    fn = pred._fn(4, pred.seq_len)
    assert fn._cache_size() == 1
    pred.predict(batch["input_ids"], batch["attention_mask"],
                 batch["token_type_ids"], batch["pixel_values"])
    assert fn._cache_size() == 1, \
        "predict() retraced: warmup staged inputs with different shardings"


def test_pipelined_checkpoint_serves_and_matches_sequential():
    """A checkpoint trained with --mesh_stage (pipelined (S, N/S, ...) tower
    stacks) must still serve: the Predictor relayouts it to the scanned
    stack (pure reshape) — before that fix the default batch bucket 1 could
    never divide pipeline_microbatches and EVERY pipelined checkpoint
    crashed at the first request."""
    import dataclasses

    from d2r_tpu.utils.weights import pipeline_tower_layers

    cfg, variables, batch = _setup()
    pred_seq = Predictor(cfg, variables, batch_buckets=(1,),
                         seq_buckets=(cfg.max_seq,))
    ref = pred_seq.predict(
        batch["input_ids"][:1], batch["attention_mask"][:1],
        batch["token_type_ids"][:1], batch["pixel_values"][:1])

    pcfg = dataclasses.replace(cfg, pipeline_stages=2,
                               pipeline_microbatches=2)
    pvars = dict(variables,
                 params=pipeline_tower_layers(variables["params"], 2))
    pred = Predictor(pcfg, pvars, batch_buckets=(1,),
                     seq_buckets=(cfg.max_seq,))
    out = pred.predict(
        batch["input_ids"][:1], batch["attention_mask"][:1],
        batch["token_type_ids"][:1], batch["pixel_values"][:1])
    np.testing.assert_allclose(out["probs"], ref["probs"], atol=2e-5)
