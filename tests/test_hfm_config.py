"""HFM (sarcasm) configuration: the 2-class variant trains, evaluates, and
predicts end-to-end. The reference carries HFM as a commented-out dataset
dict (ref: run.py:93-105) with the same 3-wide classifier; our CLI maps
--dataset hfm to num_classes=2 (d2r_tpu/cli.py:198-224), so the binary
path needs its own end-to-end proof."""

import jax
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier


def _batches(cfg, n, seed0=0):
    vc = cfg.vision_config()
    out = []
    for s in range(n):
        b = synthetic_batch(cfg.batch_size, cfg.max_seq, vc.image_size,
                            num_classes=cfg.num_classes,
                            vocab_size=cfg.text_config().vocab_size,
                            seed=seed0 + s)
        assert b["labels"].max() < cfg.num_classes
        out.append(b)
    return out


@pytest.mark.slow
def test_two_class_trainer_end_to_end(tmp_path):
    """Train + dev-eval + best-checkpoint test pass at num_classes=2:
    logits are (B, 2), the weighted F1 is well-defined on binary labels,
    and the saved best model restores for the test pass."""
    from d2r_tpu.train.trainer import Trainer

    cfg = tiny_test_config(num_classes=2, num_epochs=2, eval_begin_epoch=1,
                           save_path=str(tmp_path / "out"),
                           steps_per_dispatch=2)
    model = D2RClassifier(cfg)
    train = _batches(cfg, 4)
    dev = _batches(cfg, 2, seed0=10)
    test = _batches(cfg, 2, seed0=20)
    tr = Trainer(train_data=train, dev_data=dev, test_data=test,
                 model=model, cfg=cfg)
    result = tr.train()
    assert tr.best_dev_epoch is not None
    assert 0.0 <= result["f_score"] <= 1.0
    assert np.isfinite(result["loss"])


def test_two_class_forward_shapes():
    cfg = tiny_test_config(num_classes=2)
    model = D2RClassifier(cfg)
    batch = _batches(cfg, 1)[0]
    import jax.numpy as jnp
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["pixel_values"]))
    loss, logits, _ = model.apply(
        variables,
        jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["pixel_values"]))
    assert logits.shape == (cfg.batch_size, 2)
    assert np.isfinite(float(loss))
