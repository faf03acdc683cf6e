"""--patience early stopping and --metrics_jsonl structured observability.

Both are TPU-build additions with no reference equivalent (the reference
always trains all epochs and only emits log lines,
ref: modules/train.py:153-207).
"""

import json

import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.train.trainer import Trainer


def _tiny_batch(cfg, seed=0):
    vc = cfg.vision_config()
    return synthetic_batch(cfg.batch_size, cfg.max_seq, vc.image_size,
                           vocab_size=cfg.text_config().vocab_size, seed=seed)


class _ScriptedEvalTrainer(Trainer):
    """Replaces the dev eval with a scripted F1 sequence so the early-stop
    decision under plateau/decline is deterministic; mirrors evaluate()'s
    bookkeeping exactly (strict-improvement tracking + >= best policy)."""

    F1S = {}

    def evaluate(self, epoch):
        f = self.F1S[epoch]
        if self.last_improve_epoch is None or f > self.best_dev_metric:
            self.last_improve_epoch = epoch
        if f >= self.best_dev_metric:
            self.best_dev_epoch = epoch
            self.best_dev_metric = f
        return {"f_score": f}


@pytest.mark.parametrize("f1s,expected_epochs", [
    # strict improvement every epoch -> never stops
    ({1: .5, 2: .6, 3: .7, 4: .8}, 4),
    # plateau (ties) counts toward patience: improve at 1, ties after ->
    # stop at epoch 3 (3 - 1 >= 2) even though >= keeps re-saving best
    ({1: .5, 2: .5, 3: .5, 4: .5}, 3),
    # decline after epoch 2 -> stop at epoch 4
    ({1: .5, 2: .6, 3: .4, 4: .3}, 4),
])
def test_patience_early_stop(f1s, expected_epochs):
    cfg = tiny_test_config(batch_size=4, num_epochs=4, eval_begin_epoch=1,
                           save_path=None, steps_per_dispatch=4, patience=2)
    data = [_tiny_batch(cfg, seed=s) for s in range(2)]

    class T(_ScriptedEvalTrainer):
        F1S = f1s

    tr = T(train_data=data, dev_data=[], test_data=None,
           model=D2RClassifier(cfg), cfg=cfg)
    tr.train()
    assert tr.step == expected_epochs * len(data)


def test_metrics_jsonl_records(tmp_path):
    """One real tiny run emits parseable train_window/dev/test/summary lines
    consistent with the run's shape (and TensorBoard event files when
    --tensorboard_dir is set — the reference's writer made functional)."""
    path = str(tmp_path / "m" / "metrics.jsonl")
    tb_dir = str(tmp_path / "tb")
    cfg = tiny_test_config(batch_size=4, num_epochs=2, eval_begin_epoch=1,
                           save_path=None, steps_per_dispatch=2, log_steps=2,
                           metrics_jsonl=path, tensorboard_dir=tb_dir)
    data = [_tiny_batch(cfg, seed=s) for s in range(2)]
    dev = [_tiny_batch(cfg, seed=7)]
    tr = Trainer(train_data=data, dev_data=dev, test_data=dev,
                 model=D2RClassifier(cfg), cfg=cfg)
    tr.train()

    records = [json.loads(line) for line in open(path)]
    kinds = [r["kind"] for r in records]
    assert kinds.count("dev") == 2
    assert kinds.count("test") == 1
    assert kinds.count("summary") == 1
    assert kinds.count("train_window") >= 2
    for r in records:
        assert "ts" in r
    summary = next(r for r in records if r["kind"] == "summary")
    assert summary["steps"] == tr.step == 4
    assert summary["samples_per_sec"] > 0
    dev_rec = next(r for r in records if r["kind"] == "dev")
    assert {"f_score", "eval_accuracy", "loss"} <= set(dev_rec)

    import os
    events = [f for _, _, fs in os.walk(tb_dir) for f in fs
              if "tfevents" in f]
    assert events, f"no TensorBoard event files under {tb_dir}"
