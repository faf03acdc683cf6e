"""Optimizer + LR schedule.

Reproduces the reference's 4-group AdamW (ref: modules/train.py:287-322):
substring grouping over parameter names — group 'other' (everything not
vision/text/fc), 'text' ('text' in name), 'vision' ('vision' in name), 'fc'
(name startswith 'fc', hardcoded lr 5e-2 at ref: modules/train.py:315) — all
with weight_decay 1e-2 applied to EVERY param in the group (the reference
does not exempt LayerNorm/bias, and neither do we). Expressed TPU-natively as
one ``optax.multi_transform`` over the flax param tree.

LR schedule: HF get_linear_schedule_with_warmup semantics
(ref: modules/train.py:326-328) — linear 0->lr over warmup_ratio*total
steps, then linear decay to 0. The schedule multiplier applies to every
group's base lr, including fc's 5e-2, exactly as torch does.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from d2r_tpu.config import D2RConfig


def param_group_label(path: str) -> str:
    """Mirror the reference's substring grouping (ref: modules/train.py:292-319).

    ``path`` is the '/'-joined flax param path, e.g.
    'model/encoder_text_layers/layer_0/attention_self/query/kernel'.
    """
    top = path.split("/", 1)[0]
    if top.startswith("fc"):
        return "fc"
    if "text" in path:
        return "text"
    if "vision" in path:
        return "vision"
    return "other"


def linear_warmup_decay(base_lr: float, warmup_steps: float, total_steps: int):
    """HF linear schedule: step/warmup then (total-step)/(total-warmup)."""
    warmup = max(int(round(warmup_steps)), 0)
    total = max(int(total_steps), warmup + 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, max(warmup, 1)),
            optax.linear_schedule(base_lr, 0.0, total - warmup),
        ],
        [max(warmup, 1)] if warmup > 0 else [0],
    )


def _adamw(lr_schedule) -> optax.GradientTransformation:
    # torch.optim.AdamW defaults: betas=(0.9, 0.999), eps=1e-8; decoupled
    # weight decay scaled by lr — optax.adamw matches both conventions.
    return optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=1e-2)


def make_optimizer(cfg: D2RConfig, total_steps: int) -> optax.GradientTransformation:
    warmup = cfg.warmup_ratio * total_steps

    tx = optax.multi_transform(
        {
            "other": _adamw(linear_warmup_decay(cfg.lr, warmup, total_steps)),
            "text": _adamw(linear_warmup_decay(cfg.lr, warmup, total_steps)),
            "vision": _adamw(linear_warmup_decay(cfg.lr, warmup, total_steps)),
            "fc": _adamw(linear_warmup_decay(cfg.fc_lr, warmup, total_steps)),
        },
        param_labels=lambda params: _label_tree(params),
    )
    return tx


def _label_tree(params: Any):
    def label(key_path, _leaf):
        parts = []
        for k in key_path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "name"):
                parts.append(str(k.name))
            else:
                parts.append(str(k))
        return param_group_label("/".join(parts))

    return jax.tree_util.tree_map_with_path(label, params)
