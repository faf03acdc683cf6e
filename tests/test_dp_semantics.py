"""Data-parallel exactness: the jitted step over a mesh-sharded batch must
reproduce single-device math — the batch-global Gram matrices of the JS loss
and the BatchNorm statistics are the coupling points (SURVEY.md section 5.8).
"""

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.parallel.mesh import make_mesh, shard_batch
from d2r_tpu.train.state import _model_inputs


def test_sharded_loss_matches_unsharded(eight_devices):
    cfg = tiny_test_config(batch_size=8)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(8, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in _model_inputs(batch).items()}
    variables = jax.jit(model.init)(jax.random.key(0), **inputs)

    @jax.jit
    def train_loss(variables, inputs):
        (loss, logits, aux), _ = model.apply(
            variables, **inputs, deterministic=True,  # no dropout: comparable
            use_running_average=False, mutable=["batch_stats"])
        return loss, logits, aux["js_loss"]

    # single device (replicated)
    loss_1, logits_1, js_1 = train_loss(variables, inputs)

    # batch sharded over the 8-device data mesh
    mesh = make_mesh((-1,), ("data",))
    sharded = shard_batch(inputs, mesh)
    with mesh:
        loss_8, logits_8, js_8 = train_loss(variables, sharded)

    np.testing.assert_allclose(float(loss_1), float(loss_8), rtol=2e-5)
    np.testing.assert_allclose(float(js_1), float(js_8), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_8),
                               atol=2e-5)


def test_sharded_batchnorm_stats_match(eight_devices):
    """Train-mode BatchNorm statistics must reduce over the GLOBAL batch."""
    cfg = tiny_test_config(batch_size=8)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(8, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=1)
    inputs = {k: jnp.asarray(v) for k, v in _model_inputs(batch).items()}
    variables = jax.jit(model.init)(jax.random.key(0), **inputs)

    @jax.jit
    def stats(variables, inputs):
        _, mutated = model.apply(
            variables, **inputs, deterministic=True,
            use_running_average=False, mutable=["batch_stats"])
        return mutated["batch_stats"]

    s1 = stats(variables, inputs)
    mesh = make_mesh((-1,), ("data",))
    with mesh:
        s8 = stats(variables, shard_batch(inputs, mesh))
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5)
