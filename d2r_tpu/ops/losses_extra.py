"""Auxiliary loss library (SURVEY.md section 2.7).

These are checked-in-but-dead on the reference's live path (never
constructed from run.py); they are part of its public module surface, so
they are provided here as importable, tested implementations:

  * SoftContrastiveLoss / MildTriple (ref: models/XModules.py:146-197) —
    constructed in commented-out variants of GESC and UnimoModel.
  * DiffLoss (ref: models/XModules.py:558-585) — the weight_diff flag's
    target (ref: run.py:73), used only by a commented-out block
    (ref: models/modeling_unimo.py:855-857).
  * SupConLoss (ref: models/unimo_model.py:29-135) — supervised contrastive.

All are pure functions over arrays; none participate in the default
training objective (matching the reference exactly).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def soft_contrastive_loss(
    emb1: jnp.ndarray,
    emb2: jnp.ndarray,
    alpha: float,
    margin: float = 0.0,
    max_violation: bool = False,
    threshold_hetero: float = 1.0,
    threshold_homo: float = 1.0,
) -> jnp.ndarray:
    """Bidirectional MildTriple ranking loss (ref: models/XModules.py:159-197)."""

    def compute(a, b, thr_a, thr_b):
        scores = a @ b.T                                    # (B, B)
        if max_violation:
            sa = a @ a.T
            sb = b @ b.T
            mask_a = (sa > thr_a) & (sa < 1 - 1e-6)
            mask_b = (sb > thr_b) & (sb < 1 - 1e-6)
            scores = jnp.where(mask_a | mask_b, 0.0, scores)
        d = jnp.diagonal(scores)[:, None]
        cost = jnp.clip(margin + scores - d, min=0.0)
        eye = jnp.eye(scores.shape[0], dtype=bool)
        cost = jnp.where(eye, 0.0, cost)
        if max_violation:
            cost = jnp.max(cost, axis=1)
        return alpha * jnp.sum(cost)

    return (compute(emb1, emb2, threshold_hetero, threshold_homo)
            + compute(emb2, emb1, threshold_hetero, threshold_homo))


def diff_loss(input1: jnp.ndarray, input2: jnp.ndarray) -> jnp.ndarray:
    """Inverse mean-distance between batch-whitened views
    (ref: models/XModules.py:563-585). Note: the reference DIVIDES 1 by the
    mean norm — small differences are penalised, the opposite of a
    conventional 'difference' loss; reproduced as written."""
    b = input1.shape[0]
    x1 = input1.reshape(b, -1)
    x2 = input2.reshape(b, -1)
    x1 = x1 - jnp.mean(x1, axis=0, keepdims=True)
    x2 = x2 - jnp.mean(x2, axis=0, keepdims=True)
    n1 = jax.lax.stop_gradient(
        jnp.linalg.norm(x1, axis=1, keepdims=True))
    n2 = jax.lax.stop_gradient(
        jnp.linalg.norm(x2, axis=1, keepdims=True))
    x1 = x1 / (n1 + 1e-6)
    x2 = x2 / (n2 + 1e-6)
    return 1.0 / jnp.mean(jnp.linalg.norm(x1 - x2, axis=1))


def labeled_js_div(p_output: jnp.ndarray, q_output: jnp.ndarray,
                   labels: jnp.ndarray, get_softmax: bool = True) -> jnp.ndarray:
    """The sarcasm-variant JS divergence (ref: models/unimo_model.py:8-26,
    dead). Quirks reproduced exactly: softmax over dim 1, label-flipped
    target, and the regulariser's as-written parenthesisation
    ``(1/(||0.5-q||+margin) + (1/||0.5-p||) + margin)/2``."""
    from d2r_tpu.ops.losses import kl_div_batchmean

    margin = 0.5
    labels = labels[:, None].astype(jnp.float32)
    if get_softmax:
        p = jax.nn.softmax(p_output.astype(jnp.float32), axis=1)
        q = jax.nn.softmax(q_output.astype(jnp.float32), axis=1)
    else:
        p, q = p_output, q_output
    new_q = labels * q + (1.0 - labels) * (1.0 - q)
    regularizer = (1.0 / (jnp.linalg.norm(0.5 - q) + margin)
                   + (1.0 / jnp.linalg.norm(0.5 - p)) + margin) / 2.0
    return kl_div_batchmean(jnp.log(p), new_q) + 0.5 * regularizer


def supcon_loss(
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    similarity: Optional[jnp.ndarray] = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
) -> jnp.ndarray:
    """Supervised contrastive loss (ref: models/unimo_model.py:49-135).

    features: (B, n_views, D). The reference multiplies the per-anchor
    log-prob by (1 - similarity); pass similarity=0 for the vanilla loss.
    """
    b, n_views = features.shape[:2]
    feats = features.reshape(b, n_views, -1)
    contrast = jnp.concatenate([feats[:, i] for i in range(n_views)], axis=0)

    if labels is not None:
        labels = labels.reshape(-1, 1)
        base_mask = (labels == labels.T).astype(jnp.float32)
    elif mask is not None:
        base_mask = mask.astype(jnp.float32)
    else:
        base_mask = jnp.eye(b, dtype=jnp.float32)

    if contrast_mode == "one":
        anchor, anchor_count = feats[:, 0], 1
    else:
        anchor, anchor_count = contrast, n_views

    logits = (anchor @ contrast.T) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    full_mask = jnp.tile(base_mask, (anchor_count, n_views))
    n = b * anchor_count
    self_mask = 1.0 - jnp.eye(n, contrast.shape[0], dtype=jnp.float32)
    full_mask = full_mask * self_mask

    exp_logits = jnp.exp(logits) * self_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))

    mask_sum = jnp.sum(full_mask, axis=1)
    mask_sum = jnp.where(mask_sum == 0, 1.0, mask_sum)
    mean_log_prob_pos = jnp.sum(full_mask * log_prob, axis=1) / mask_sum

    if similarity is not None:
        mean_log_prob_pos = mean_log_prob_pos * (1.0 - similarity)

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, b))
