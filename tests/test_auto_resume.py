"""Preemption-safe auto-resume (--auto_resume).

The reference cannot continue an interrupted run (ref: modules/train.py only
ever reloads the dev-best state_dict, restarting the LR schedule); on
preemptible TPU pods this build checkpoints the FULL train state at every
epoch boundary and continues bit-exactly: a run killed mid-epoch-3 and
resumed must land on EXACTLY the arrays an uninterrupted run produces.
"""

import os

import jax
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import DataLoader, synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.train.checkpoint import (
    load_resume_meta,
    restore_resume_checkpoint,
    save_resume_checkpoint,
)
from d2r_tpu.train.trainer import Trainer


def _tiny_batch(cfg, seed=0):
    vc = cfg.vision_config()
    return synthetic_batch(cfg.batch_size, cfg.max_seq, vc.image_size,
                           vocab_size=cfg.text_config().vocab_size, seed=seed)


class _PreemptingData:
    """List-of-batches train_data whose N-th __iter__ raises — simulating a
    preemption at the start of an epoch (a mid-epoch kill replays the epoch
    from its start on resume, which is the same recovery point)."""

    def __init__(self, batches, fail_on_iter=10**9):
        self.batches = batches
        self.fail_on = fail_on_iter
        self.calls = 0

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        self.calls += 1
        if self.calls == self.fail_on:
            raise RuntimeError("simulated preemption")
        return iter(self.batches)


def _cfg(tmp, **kw):
    base = dict(batch_size=4, num_epochs=3, eval_begin_epoch=1,
                save_path=str(tmp), steps_per_dispatch=2, auto_resume=True)
    base.update(kw)
    return tiny_test_config(**base)


def _leaves_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_auto_resume_bit_exact(tmp_path):
    """Uninterrupted 3-epoch run == (2 epochs, kill, resume for epoch 3):
    identical final full train state, best-F1 bookkeeping, and test result."""
    train = [_tiny_batch(_cfg(tmp_path), seed=s) for s in range(4)]
    dev = [_tiny_batch(_cfg(tmp_path), seed=9)]
    tst = [_tiny_batch(_cfg(tmp_path), seed=11)]

    def make(cfg, data):
        return Trainer(train_data=data, dev_data=dev, test_data=tst,
                       model=D2RClassifier(cfg), cfg=cfg)

    # --- run A: straight through -------------------------------------
    cfg_a = _cfg(tmp_path / "a")
    tr_a = make(cfg_a, _PreemptingData(train))
    res_a = tr_a.train()

    # --- run B: preempted at the start of epoch 3, then resumed -------
    cfg_b = _cfg(tmp_path / "b")
    # __iter__ calls: 1 = the trainer's shape-init peek, 2 = epoch 1,
    # 3 = epoch 2, 4 = epoch 3 -> preempt there
    tr_b1 = make(cfg_b, _PreemptingData(train, fail_on_iter=4))
    with pytest.raises(RuntimeError, match="preemption"):
        tr_b1.train()
    meta = load_resume_meta(cfg_b.save_path)
    assert meta is not None and meta["epoch"] == 2

    tr_b2 = make(cfg_b, _PreemptingData(train))
    res_b = tr_b2.train()

    # final full train state: compare the epoch-3 resume checkpoints
    # (train() then reloads best_model into .state, which may be any epoch)
    ma, mb = load_resume_meta(cfg_a.save_path), load_resume_meta(cfg_b.save_path)
    assert ma["epoch"] == mb["epoch"] == 3
    assert ma["trainer_step"] == mb["trainer_step"] == tr_a.step
    assert ma["best_dev_epoch"] == mb["best_dev_epoch"]
    assert ma["best_dev_metric"] == mb["best_dev_metric"]
    sa = restore_resume_checkpoint(cfg_a.save_path, tr_a.state, ma)
    sb = restore_resume_checkpoint(cfg_b.save_path, tr_b2.state, mb)
    _leaves_equal(sa.params, sb.params)
    _leaves_equal(sa.batch_stats, sb.batch_stats)
    _leaves_equal(sa.opt_state, sb.opt_state)
    assert int(sa.step) == int(sb.step)
    # best-model test pass agrees too
    assert res_a == res_b


@pytest.mark.slow
def test_auto_resume_finished_run_skips_training(tmp_path):
    """Resuming a run whose epochs all completed trains zero further steps
    and goes straight to the best-model test pass."""
    # async_checkpoint on: exercises the async best-model save + the
    # durability barriers (before resume-meta publish and the test reload)
    cfg = _cfg(tmp_path, num_epochs=1, async_checkpoint=True)
    train = [_tiny_batch(cfg, seed=s) for s in range(2)]
    dev = [_tiny_batch(cfg, seed=9)]
    tr1 = Trainer(train_data=train, dev_data=dev, test_data=dev,
                  model=D2RClassifier(cfg), cfg=cfg)
    tr1.train()
    steps_done = tr1.step

    tr2 = Trainer(train_data=train, dev_data=dev, test_data=dev,
                  model=D2RClassifier(cfg), cfg=cfg)
    res = tr2.train()
    assert tr2.step == steps_done  # restored, not re-trained
    assert res  # the test pass still ran


def test_resume_meta_crash_safety(tmp_path):
    """Slots alternate by epoch parity and the meta is only ever replaced
    atomically, so a kill during a save leaves the previous epoch intact."""
    cfg = tiny_test_config(batch_size=2)
    model = D2RClassifier(cfg)
    batch = _tiny_batch(cfg)
    from d2r_tpu.train.state import create_train_state
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=5)
    save_resume_checkpoint(str(tmp_path), state, {"epoch": 1})
    save_resume_checkpoint(str(tmp_path), state, {"epoch": 2})
    m = load_resume_meta(str(tmp_path))
    assert m["epoch"] == 2 and m["slot"] == "slot_0"
    # epoch-1 slot still restorable after epoch 2's save started/finished
    s1 = restore_resume_checkpoint(str(tmp_path), state,
                                   {"epoch": 1, "slot": "slot_1"})
    assert int(s1.step) == int(state.step)
    # a meta whose slot was pruned reads as nothing-to-resume, not an error
    import shutil
    shutil.rmtree(os.path.join(str(tmp_path), "resume", "slot_0"))
    assert load_resume_meta(str(tmp_path)) is None


def test_dataloader_set_epoch_reproduces_order():
    """set_epoch(n) makes the next __iter__ shuffle with seed+n — the
    fast-forward the trainer uses to keep the post-resume data order
    identical to an uninterrupted run's."""

    class _Len:
        def __len__(self):
            return 13

    def orders(loader, k):
        out = []
        for _ in range(k):
            out.append([idx.tolist() for idx, _ in loader._index_batches()])
            loader._epoch += 1  # what __iter__ does
        return out

    a = DataLoader(_Len(), batch_size=4, shuffle=True, seed=7)
    straight = orders(a, 4)

    b = DataLoader(_Len(), batch_size=4, shuffle=True, seed=7)
    _ = orders(b, 1)  # the trainer's shape-init peek
    b.set_epoch(3)
    assert orders(b, 1)[0] == straight[3]


class _EpochRecordingData(_PreemptingData):
    """set_epoch-capable train_data that records the epoch counter each
    __iter__ observes (what the shuffle stream would key on)."""

    def __init__(self, batches):
        super().__init__(batches)
        self._epoch = 0
        self.epochs_iterated = []

    def set_epoch(self, n):
        self._epoch = int(n)

    def __iter__(self):
        self.epochs_iterated.append(self._epoch)
        return super().__iter__()


@pytest.mark.slow
def test_epoch_shuffle_pinned_and_no_test_data(tmp_path):
    """Two guarantees in one tiny run: (a) the trainer pins the shuffle
    epoch at the top of EVERY epoch, so extra up-front __iter__ consumption
    (shape init, the --pretrained_dir path) cannot shift the stream — the
    bit-exact auto-resume contract depends on this; (b) a run with
    test_data=None finishes its best-checkpoint pass without crashing."""
    cfg = _cfg(tmp_path, num_epochs=2)
    train = [_tiny_batch(cfg, seed=s) for s in range(2)]
    dev = [_tiny_batch(cfg, seed=9)]
    data = _EpochRecordingData(train)
    tr = Trainer(train_data=data, dev_data=dev, test_data=None,
                 model=D2RClassifier(cfg), cfg=cfg)
    # simulate the --pretrained_dir path: one extra iteration before train()
    next(iter(data))
    res = tr.train()
    assert res == {}  # no test set -> no test metrics, and no crash
    # the training epochs iterated with the PINNED epoch numbers, unshifted
    # by the two earlier consumptions (extra + shape-init, both at 0)
    assert data.epochs_iterated[:2] == [0, 0]
    assert data.epochs_iterated[2:] == [1, 2]
