"""--freeze_towers (linear-probe mode): the five pretrained tower modules
get ZERO optimizer updates — gradients and the decoupled weight decay —
while the routing fabric, fusion head, and fc keep training. No reference
equivalent (it always fine-tunes everything, ref: modules/train.py:287-322).
"""

import jax
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.train.optimizer import TOWER_MODULES, make_optimizer, trainable_mask
from d2r_tpu.train.state import create_train_state, make_train_step


def _path_str(key_path):
    return "/".join(
        str(getattr(k, "key", getattr(k, "name", k))) for k in key_path)


def test_trainable_mask_scopes_exactly_the_tower_modules():
    z = np.zeros(1)
    params = {"model": {
        "encoder_text_layers": {"layer_0": {"w": z}},
        "text_embeddings": {"e": z},
        "vision_pre_layernorm": {"scale": z},
        # 'text'/'vision' in the NAME is not enough — fabric stays trainable
        "text_pool": {"kernel": z},
        "self_vision": {"kernel": z},
        "itr_module": {"w": z},
    }, "fc": {"kernel": z}}
    mask = trainable_mask(params)
    assert mask["model"]["encoder_text_layers"]["layer_0"]["w"] is False
    assert mask["model"]["text_embeddings"]["e"] is False
    assert mask["model"]["vision_pre_layernorm"]["scale"] is False
    assert mask["model"]["text_pool"]["kernel"] is True
    assert mask["model"]["self_vision"]["kernel"] is True
    assert mask["model"]["itr_module"]["w"] is True
    assert mask["fc"]["kernel"] is True


def test_freeze_rejects_flat_fused_impl():
    cfg = tiny_test_config(freeze_towers=True, optimizer_impl="fused")
    with pytest.raises(ValueError, match="freeze_towers"):
        make_optimizer(cfg, 10, params={"fc": {"k": np.zeros(2)}})


@pytest.mark.slow
def test_freeze_towers_full_train_step():
    """One real jitted train step: every tower leaf bit-identical (weight
    decay must not leak onto frozen params), fabric/fc leaves move."""
    # warmup_ratio 0: the first step's LR is already nonzero (under warmup,
    # step 0 has lr=0 and NOTHING moves, frozen or not)
    cfg = tiny_test_config(batch_size=4, freeze_towers=True, warmup_ratio=0.0)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(4, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=10)
    # snapshot BEFORE stepping: the jitted step donates the old state
    old_params = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                        state.params)
    step = make_train_step(model)
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))

    old = jax.tree_util.tree_flatten_with_path(old_params)[0]
    new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    assert len(old) == len(new)
    frozen_seen = trainable_seen = moved = 0
    for (kp, a), (kp2, b) in zip(old, new):
        assert _path_str(kp) == _path_str(kp2)
        if any(part in TOWER_MODULES for part in _path_str(kp).split("/")):
            frozen_seen += 1
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=_path_str(kp))
        else:
            trainable_seen += 1
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                moved += 1
    assert frozen_seen > 10 and trainable_seen > 10
    # essentially every trainable leaf moves under AdamW+wd with real grads
    assert moved >= trainable_seen * 0.9
