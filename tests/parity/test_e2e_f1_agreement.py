"""End-to-end F1 agreement: BOTH full trainers, same data, same init.

The last e2e gap after test_parity_training.py: drive the COMPLETE
data -> train -> best-dev-selection -> test path through the reference's
own MSDTrainer (ref: modules/train.py:77-159,161-218) AND through our
Trainer on an identical fabricated 64-sample dataset from an identical
converter-shared init, and require the two stacks to land on the SAME
predictions (dev + test, after best-model restore) and the same dev
weighted-F1.

Determinism setup: fp32, dropout 0 both sides, fixed batch order (no
shuffling — both trainers iterate the same pre-built batch lists each
epoch). The fabricated data carries a class-conditional signal (token
bands + pixel mean shift) so the trained classifier is CONFIDENT — argmax
predictions are then robust to the ~1e-3-scale fp32 trajectory divergence
the chaotic softmax(100x) attention induces between any two correct stacks
(measured in test_parity_training.py). Training runs at the reference's
small-lr regime; the fc head (hardcoded lr 5e-2, ref: modules/train.py:315)
does the fast learning.
"""

import copy
import logging
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from tests.parity import convert  # noqa: E402
from tests.parity.ref_loader import (  # noqa: E402
    import_reference,
    make_flax_config,
    make_ref_args,
    write_tiny_config_dirs,
)

pytestmark = pytest.mark.slow

B, L = 8, 16
N_TRAIN, N_DEV, N_TEST = 64, 16, 16
NUM_EPOCHS = 2
LR, WARMUP_RATIO = 1e-4, 0.1


def _make_split(rng, n):
    """Class-conditional fabricated split: label k draws its tokens from a
    k-specific band and shifts the pixel mean — learnable in a few steps."""
    labels = np.asarray([i % 3 for i in range(n)])
    ids = np.zeros((n, L), np.int64)
    mask = np.ones((n, L), np.float32)
    for i, lab in enumerate(labels):
        lo = 5 + 40 * lab
        ids[i] = rng.integers(lo, lo + 38, size=L)
        length = int(rng.integers(10, L + 1))
        mask[i, length:] = 0.0
        ids[i, length:] = 0
    pix = rng.normal(size=(n, 3, 32, 32)).astype(np.float32)
    pix += (labels[:, None, None, None] - 1.0) * 0.7
    return {"input_ids": ids, "attention_mask": mask,
            "token_type_ids": np.zeros((n, L), np.int64),
            "labels": labels.astype(np.int64),
            "pixel_values": pix.astype(np.float32)}


def _batches(split, bs=B):
    n = len(split["labels"])
    return [{k: v[i:i + bs] for k, v in split.items()}
            for i in range(0, n, bs)]


def _torch_batches(batches):
    """Our dict batches -> the reference's 6-tuple batch format
    (ref: modules/train.py:280-284; img_mask is unpacked then dropped)."""
    out = []
    for b in batches:
        out.append((torch.tensor(b["input_ids"]),
                    torch.tensor(b["attention_mask"]),
                    torch.tensor(b["token_type_ids"]),
                    torch.ones(len(b["labels"]), 5),
                    torch.tensor(b["labels"]),
                    torch.tensor(b["pixel_values"])))
    return out


def _identity_pretrained_dicts(rmod):
    """Fabricate clip/bert state dicts FROM the model so the reference's
    substring weight surgery (ref: modules/train.py:92-111) runs as a
    covered identity load — the path executes, the init stays shared."""
    clip_d, bert_d = {}, {}
    for name, t in rmod.state_dict().items():
        if "vision" in name:
            clip_d[name.replace("vision_", "").replace("model.", "")] = t
        elif "text" in name:
            bert_d[name.replace("text_", "").replace("model.", "")] = t
    return clip_d, bert_d


def _torch_eval_preds(rmod, batches):
    rmod.eval()
    preds = []
    with torch.no_grad():
        for b in _torch_batches(batches):
            ids, mask, tt, _img_mask, labels, pix = b
            _loss, logits = rmod(input_ids=ids, attention_mask=mask,
                                 token_type_ids=tt, labels=labels,
                                 images=pix)
            preds.extend(logits.argmax(-1).tolist())
    return np.asarray(preds)


def test_full_trainers_agree_on_f1_and_predictions(tmp_path, monkeypatch):
    root = str(tmp_path / "cfgs")
    bert_dir, clip_dir = write_tiny_config_dirs(root)
    mods = import_reference()
    import modules.train as ref_train
    from transformers import BertConfig, CLIPConfig

    rng = np.random.default_rng(11)
    train_split = _make_split(rng, N_TRAIN)
    dev_split = _make_split(rng, N_DEV)
    test_split = _make_split(rng, N_TEST)
    train_b, dev_b, test_b = (_batches(train_split), _batches(dev_split),
                              _batches(test_split))

    # ---- torch stack: the reference's own full trainer ----
    ref_save = str(tmp_path / "ref_out") + "/"   # ref string-concats paths
    os.makedirs(ref_save, exist_ok=True)
    args = make_ref_args(
        bert_dir, clip_dir, lr=LR, warmup_ratio=WARMUP_RATIO,
        num_epochs=NUM_EPOCHS, eval_begin_epoch=1, batch_size=B,
        save_path=ref_save, load_path=None)
    torch.manual_seed(3)
    bc = BertConfig.from_pretrained(args.bert_name)
    vc = CLIPConfig.from_pretrained(args.vit_name).vision_config
    rmod = mods["model"].UnimoModelF(args, vc, bc)
    for m in rmod.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    init_vars = convert.unimo_model_f(rmod)  # shared init, BEFORE training

    trainer = ref_train.MSDTrainer(
        train_data=_torch_batches(train_b), dev_data=_torch_batches(dev_b),
        test_data=_torch_batches(test_b), model=rmod, args=args,
        logger=logging.getLogger("ref_e2e"))
    clip_d, bert_d = _identity_pretrained_dicts(rmod)
    # the reference hard-codes shutil.rmtree("./output") at the end of
    # train() (ref: modules/train.py:149) — sandbox it in tmp
    monkeypatch.chdir(tmp_path)
    os.makedirs(tmp_path / "output", exist_ok=True)
    trainer.train(clip_model_dict=clip_d, bert_model_dict=bert_d)
    # train() ends with test(): best weights are loaded into the model
    ref_dev_preds = _torch_eval_preds(rmod, dev_b)
    ref_test_preds = _torch_eval_preds(rmod, test_b)
    ref_best_f1 = float(trainer.best_dev_metric)

    # ---- our stack: the full TPU-native trainer on the same init ----
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.checkpoint import restore_checkpoint
    from d2r_tpu.train.trainer import Trainer

    our_save = str(tmp_path / "our_out")
    cfg = make_flax_config(
        dropout=0.0, lr=LR, warmup_ratio=WARMUP_RATIO, batch_size=B,
        num_epochs=NUM_EPOCHS, eval_begin_epoch=1, save_path=our_save)
    model = D2RClassifier(cfg)
    tr = Trainer(train_data=train_b, dev_data=dev_b, test_data=test_b,
                 model=model, cfg=cfg)
    tr.init_state(train_b[0],
                  params=jax.tree_util.tree_map(np.asarray,
                                                init_vars["params"]),
                  batch_stats=jax.tree_util.tree_map(
                      np.asarray, init_vars["batch_stats"]))
    tr.train()
    # best-model restore, then predictions (the selection path itself)
    tr.state = restore_checkpoint(os.path.join(our_save, "best_model"),
                                  tr.state)
    _, _, our_dev_preds = tr._run_eval(dev_b)
    _, _, our_test_preds = tr._run_eval(test_b)

    # ---- agreement ----
    np.testing.assert_array_equal(
        np.asarray(our_dev_preds), ref_dev_preds,
        err_msg="dev predictions diverged between the two full trainers")
    np.testing.assert_array_equal(
        np.asarray(our_test_preds), ref_test_preds,
        err_msg="test predictions diverged between the two full trainers")
    assert abs(float(tr.best_dev_metric) - ref_best_f1) < 1e-9, \
        (f"best dev weighted-F1 diverged: ours {tr.best_dev_metric} "
         f"vs ref {ref_best_f1}")
    # the task was actually learned — agreement on a degenerate
    # all-one-class predictor would be vacuous
    assert len(set(np.asarray(our_test_preds).tolist())) > 1
    assert ref_best_f1 > 0.5, f"synthetic task not learned (F1={ref_best_f1})"
