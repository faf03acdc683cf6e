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

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from d2r_tpu.config import D2RConfig


# The exact module set the pretrained converter populates
# (utils/weights.py::bert_mapping/clip_vision_mapping): freezing these is
# "linear-probe the fabric" — everything downstream (self_text/self_vision,
# poolers, routing cells, fusion, fc) stays trainable. Matching is by path
# COMPONENT, so the scan_layers / pipeline relayouts (which nest extra
# levels under the same tower names) freeze identically.
TOWER_MODULES = frozenset({
    "text_embeddings", "encoder_text_layers",
    "vision_embeddings", "vision_pre_layernorm", "encoder_vision_layers",
})


def _path_parts(key_path) -> list:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return parts


def trainable_mask(params: Any):
    """Pytree of bools for optax.masked: False on pretrained-tower leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: not any(p in TOWER_MODULES for p in _path_parts(kp)),
        params)


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
    """HF get_linear_schedule_with_warmup semantics, implemented as the HF
    lambda directly — with FLOAT warmup: the reference passes
    ``warmup_ratio * train_num_steps`` unrounded (ref: modules/train.py:326-328)
    and HF uses that fractional value in both the warmup divisor and the decay
    denominator, so we must not round it either.

        lambda(step) = step / max(1, warmup)              if step < warmup
                       max(0, (total-step)/max(1, total-warmup))  otherwise
    """
    warmup_f = max(float(warmup_steps), 0.0)
    total_f = float(total_steps)

    def schedule(count):
        step = jnp.asarray(count, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_f)
        decay = jnp.maximum(
            0.0, (total_f - step) / jnp.maximum(1.0, total_f - warmup_f))
        return base_lr * jnp.where(step < warmup_f, warm, decay)

    return schedule


def _adamw(lr_schedule) -> optax.GradientTransformation:
    # torch.optim.AdamW defaults: betas=(0.9, 0.999), eps=1e-8; decoupled
    # weight decay scaled by lr — optax.adamw matches both conventions.
    return optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=1e-2)


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray
    m: Any          # dict group -> flat first-moment vector
    v: Any          # dict group -> flat second-moment vector


def fused_adamw(cfg: D2RConfig, total_steps: int, params_template
                ) -> optax.GradientTransformation:
    """TPU-fused AdamW: one contiguous flat buffer per lr-group.

    The D2R tree has ~2000 small leaves (36 routing cells x ~20 params each);
    a per-leaf AdamW lowers to thousands of tiny kernels that dominate step
    time (~160ms vs 22ms fwd+bwd measured on v5e). Ravelling each lr-group
    into one flat vector turns the update into a handful of full-bandwidth
    VPU ops.

    Grouping note: the reference's 4 AdamW groups all share args.lr except
    the fc head at 5e-2 (ref: modules/train.py:287-322), so exactly two
    *value* groups exist: 'fc' and everything else. `param_group_label`
    remains the source of truth for the 4-way labelling.
    """
    warmup = cfg.warmup_ratio * total_steps
    schedules = {
        "main": linear_warmup_decay(cfg.lr, warmup, total_steps),
        "fc": linear_warmup_decay(cfg.fc_lr, warmup, total_steps),
    }
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 1e-2

    def split(tree):
        groups = {"fc": {}, "main": {}}
        for key, sub in tree.items():
            groups["fc" if param_group_label(key) == "fc" else "main"][key] = sub
        return groups

    # unravel fns are built once from the template (pure structure)
    unravels = {}
    for gname, sub in split(params_template).items():
        _, unravels[gname] = ravel_pytree(sub)

    def init_fn(params):
        groups = split(params)
        m = {g: jnp.zeros_like(ravel_pytree(sub)[0]) for g, sub in groups.items()}
        v = {g: jnp.zeros_like(ravel_pytree(sub)[0]) for g, sub in groups.items()}
        return FusedAdamWState(count=jnp.zeros((), jnp.int32), m=m, v=v)

    def update_fn(updates, state, params=None):
        assert params is not None, "fused_adamw requires params (for decay)"
        g_groups = split(updates)
        p_groups = split(params)
        count = state.count + 1
        t = count.astype(jnp.float32)
        new_m, new_v, out = {}, {}, {}
        for gname in g_groups:
            g, _ = ravel_pytree(g_groups[gname])
            p, _ = ravel_pytree(p_groups[gname])
            g = g.astype(jnp.float32)
            m = b1 * state.m[gname] + (1 - b1) * g
            v = b2 * state.v[gname] + (1 - b2) * jnp.square(g)
            mhat = m / (1 - b1 ** t)
            vhat = v / (1 - b2 ** t)
            lr = schedules[gname](state.count)
            upd = -lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * p)
            new_m[gname], new_v[gname] = m, v
            out.update(unravels[gname](upd))
        return out, FusedAdamWState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


class FusedLeafAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def fused_leaf_adamw(cfg: D2RConfig, total_steps: int
                     ) -> optax.GradientTransformation:
    """Per-leaf AdamW with the ENTIRE update fused into one expression.

    The optax chain (scale_by_adam -> add_decayed_weights -> group lr ->
    apply_updates) materialises an intermediate updates tree between every
    stage: ~14 HBM passes over the fp32 param bytes per step. A device trace
    of the flagship step showed ~20 ms/step of weight-shaped multiply-add
    fusions — the single largest non-matmul class on an HBM-bandwidth-bound
    step (docs/BENCHMARKS.md). Computing mu'/nu'/update in one tree_map leaf
    expression lets XLA emit ONE kernel per leaf that reads (g, p, mu, nu)
    and writes (mu', nu', update): the minimal 7 passes.

    Math is bit-identical to the 4-group multi_transform oracle
    (ref: modules/train.py:287-322; tests/test_fused_optimizer.py): same
    operation order as optax.scale_by_adam ((1-b)*g + b*m moments, bias
    correction by 1-b^t with t=count+1, sqrt outside the eps), decoupled
    weight decay 1e-2 against the pre-update params, group lr (fc @ 5e-2)
    from the schedule evaluated at the PRE-increment count.
    """
    warmup = cfg.warmup_ratio * total_steps
    sched_main = linear_warmup_decay(cfg.lr, warmup, total_steps)
    sched_fc = linear_warmup_decay(cfg.fc_lr, warmup, total_steps)
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 1e-2

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
        return FusedLeafAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update_fn(updates, state, params=None):
        assert params is not None, "fused_leaf_adamw requires params (decay)"
        count_inc = optax.safe_int32_increment(state.count)
        t = count_inc.astype(jnp.float32)
        c1 = 1.0 - b1 ** t
        c2 = 1.0 - b2 ** t
        lr_main = sched_main(state.count)
        lr_fc = sched_fc(state.count)
        labels = _label_tree(updates)

        def leaf(g, p, mu, nu, lab):
            g = g.astype(jnp.float32)
            mu2 = (1.0 - b1) * g + b1 * mu
            nu2 = (1.0 - b2) * jnp.square(g) + b2 * nu
            lr = lr_fc if lab == "fc" else lr_main
            u = (mu2 / c1) / (jnp.sqrt(nu2 / c2) + eps) + wd * p
            return (u * (-lr)).astype(p.dtype), mu2, nu2

        g_flat, treedef = jax.tree_util.tree_flatten(updates)
        p_flat = treedef.flatten_up_to(params)
        mu_flat = treedef.flatten_up_to(state.mu)
        nu_flat = treedef.flatten_up_to(state.nu)
        lab_flat = treedef.flatten_up_to(labels)
        out = [leaf(*args) for args in
               zip(g_flat, p_flat, mu_flat, nu_flat, lab_flat)]
        unflat = treedef.unflatten
        return unflat([o[0] for o in out]), FusedLeafAdamWState(
            count=count_inc,
            mu=unflat([o[1] for o in out]),
            nu=unflat([o[2] for o in out]))

    return optax.GradientTransformation(init_fn, update_fn)


def grouped_adamw(cfg: D2RConfig, total_steps: int) -> optax.GradientTransformation:
    """Single AdamW chain with a per-leaf group learning rate.

    One scale_by_adam over the whole tree (instead of 4 masked copies as in
    multi_transform) plus a final per-leaf multiply by the group's scheduled
    lr — the multiply fuses into the update chain, so this costs one AdamW,
    not four. Math identical to the reference's 4-group AdamW
    (ref: modules/train.py:287-322): groups other/text/vision share args.lr,
    fc uses 5e-2, all with decoupled weight decay 1e-2 scaled by lr.
    """
    warmup = cfg.warmup_ratio * total_steps
    sched_main = linear_warmup_decay(cfg.lr, warmup, total_steps)
    sched_fc = linear_warmup_decay(cfg.fc_lr, warmup, total_steps)

    def scale_by_group_lr() -> optax.GradientTransformation:
        def init_fn(params):
            return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

        def update_fn(updates, state, params=None):
            del params
            lr_main = sched_main(state.count)
            lr_fc = sched_fc(state.count)
            labels = _label_tree(updates)
            out = jax.tree_util.tree_map(
                lambda u, lab: u * (-lr_fc if lab == "fc" else -lr_main),
                updates, labels)
            return out, optax.ScaleByScheduleState(count=state.count + 1)

        return optax.GradientTransformation(init_fn, update_fn)

    mu_dtype = getattr(cfg, "adam_mu_dtype", "float32")
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype),
        optax.add_decayed_weights(1e-2),
        scale_by_group_lr(),
    )


def make_optimizer(cfg: D2RConfig, total_steps: int,
                   params: Optional[Any] = None) -> optax.GradientTransformation:
    """With ``params`` (a template tree): the TPU-fast implementation chosen
    by ``cfg.optimizer_impl`` — 'grouped' (default: one scale_by_adam chain +
    per-leaf group lr) or 'fused' (one flat moment buffer per lr-group).
    Without ``params``: the reference-shaped 4-group optax.multi_transform
    (identical math, 4x the per-leaf kernels — fine on CPU, used as the
    oracle in tests). All three match bit-for-bit at fp32
    (tests/test_fused_optimizer.py)."""
    impl = getattr(cfg, "optimizer_impl", "grouped")
    freeze = getattr(cfg, "freeze_towers", False)
    if freeze and impl == "fused":
        # the flat-buffer impl ravels against a full-tree template and can't
        # see optax.masked's pruned subtrees
        raise ValueError("freeze_towers is incompatible with "
                         "optimizer_impl='fused'; use 'grouped' (default), "
                         "'fused_leaf', or 'multi_transform'")

    def _wrap(tx: optax.GradientTransformation) -> optax.GradientTransformation:
        if not freeze:
            return tx
        # tower leaves get set_to_zero: NO update at all — gradients AND the
        # decoupled weight decay (zeroing grads alone would still decay
        # frozen params). NB optax.masked alone would be wrong here: it
        # passes masked-out leaves' updates through UNTRANSFORMED (raw
        # grads), it does not zero them — multi_transform routes each label
        # to its own transform.
        def labels(params):
            # single source of truth for the freezing scope: trainable_mask
            return jax.tree_util.tree_map(
                lambda trainable: "train" if trainable else "frozen",
                trainable_mask(params))
        return optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels)

    if params is not None and impl != "multi_transform":
        if impl == "fused":
            return fused_adamw(cfg, total_steps, params)
        if impl == "fused_leaf":
            return _wrap(fused_leaf_adamw(cfg, total_steps))
        if impl != "grouped":
            raise ValueError(f"unknown optimizer_impl: {impl!r}")
        return _wrap(grouped_adamw(cfg, total_steps))

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
    return _wrap(tx)


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
