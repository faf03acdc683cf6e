"""Loss functions.

Live reference losses (SURVEY.md section 2.6):
  * 3-way classification cross-entropy (ref: models/unimo_model.py:147,160)
  * the path-consistency JS term, added with a NEGATIVE sign — the reference
    rewards divergence and we reproduce that faithfully
    (ref: models/modeling_unimo.py:848-849)
  * the CCR contrastive loss computed inside CrossModalAlignment — every
    caller discards it (``_`` at ref: models/Cells.py:147,238) and the default
    alpha=0 makes it exactly zero, so it is provided here for API parity but
    never wired into the training objective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy


def kl_div_batchmean(log_input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.KLDivLoss(reduction='batchmean') semantics.

    sum(target * (log(target) - log_input)) / first_dim, with the
    0*log(0)=0 convention (torch uses xlogy internally).
    """
    pointwise = xlogy(target, target) - target * log_input
    return jnp.sum(pointwise) / target.shape[0]


def js_div(p_logits: jnp.ndarray, q_logits: jnp.ndarray, get_softmax: bool = True,
           valid=None) -> jnp.ndarray:
    """Symmetric JS divergence of two row-softmaxed similarity matrices.

    Mirrors ref: models/XModules.py:32-41 — softmax over the last axis,
    then (KL(p||m) + KL(q||m)) / 2 with batchmean reduction.

    Robustness (identical values wherever the reference is finite): when a
    softmax row entry underflows to exactly 0 in BOTH p and q, the reference
    computes 0 * log(0) = NaN (torch does too). Here the p=0 terms contribute
    0 via xlogy, and the mean is clamped where the target is 0 so gradients
    stay finite. This matters for the scaled (1024-dim) configs, whose Gram
    logits are spread widely enough for softmax rows to hit exact zeros.

    ``valid`` (optional, (B,) bool/0-1): with static-shape wrap-padded batches
    the Gram matrices carry duplicated rows/columns; masking excludes invalid
    COLUMNS from each row softmax and invalid ROWS from the batchmean (divides
    by the valid count), which makes the result identical to computing JS over
    just the valid r x r submatrix — exactly what the reference computes on
    its ragged final batch (ref: models/modeling_unimo.py:845-849). All-valid
    reduces bit-identically to the unmasked path semantics.
    """
    if valid is not None and get_softmax:
        v = valid.astype(jnp.float32)
        col_bias = (1.0 - v)[None, :] * -1e30  # exclude invalid columns
        p = jax.nn.softmax(p_logits.astype(jnp.float32) + col_bias, axis=-1)
        q = jax.nn.softmax(q_logits.astype(jnp.float32) + col_bias, axis=-1)
        row_mask = v[:, None]
        denom = jnp.maximum(jnp.sum(v), 1.0)
    elif get_softmax:
        p = jax.nn.softmax(p_logits.astype(jnp.float32), axis=-1)
        q = jax.nn.softmax(q_logits.astype(jnp.float32), axis=-1)
        row_mask = None
        denom = p_logits.shape[0]
    else:
        p, q = p_logits, q_logits
        row_mask = None
        denom = p.shape[0]
    m = (p + q) / 2.0

    def kl_vs_mean(t):
        pos = t > 0
        safe_t = jnp.where(pos, t, 1.0)    # log-grad of t*log(t) at 0 is -inf
        safe_m = jnp.where(pos, m, 1.0)    # t>0 implies m >= t/2 > 0
        pointwise = jnp.where(
            pos, safe_t * (jnp.log(safe_t) - jnp.log(safe_m)), 0.0)
        if row_mask is not None:
            pointwise = pointwise * row_mask
        return jnp.sum(pointwise) / denom

    return (kl_vs_mean(p) + kl_vs_mean(q)) / 2.0


def path_consistency_loss(
    sim_paths: jnp.ndarray,
    sim_text: jnp.ndarray,
    reversed_sim_paths: jnp.ndarray,
    sim_vision: jnp.ndarray,
    weight_js_1: float,
    weight_js_2: float,
    valid=None,
) -> jnp.ndarray:
    """The reference's js_loss, NEGATIVE sign included.

    ``js_loss = -w1*JS(sim_paths, sim_text) - w2*JS(rev_sim_paths, sim_vision)``
    (ref: models/modeling_unimo.py:848-849). As written this *rewards*
    divergence between path signatures and CLS similarity structure; the
    reference adds it verbatim to the CE loss and we reproduce that.

    ``valid`` masks wrap-padded Gram rows/columns (see js_div) so the loss on
    a static-shape padded batch equals the reference's on its ragged batch.
    """
    return (
        -weight_js_1 * js_div(sim_paths, sim_text, valid=valid)
        - weight_js_2 * js_div(reversed_sim_paths, sim_vision, valid=valid)
    )


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       valid=None) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels.

    torch.nn.CrossEntropyLoss default (mean reduction),
    ref: models/unimo_model.py:147,160. ``valid`` optionally masks rows
    (used for the static-shape wrap-padded final batch — with all rows valid
    this is exactly the reference's plain mean).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if valid is None:
        return jnp.mean(nll)
    v = valid.astype(jnp.float32)
    return jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)


def ccr_contrastive_loss(
    img_rep: jnp.ndarray,
    txt_rep: jnp.ndarray,
    alpha: float,
    beta: float = 0.0,
    margin: float = 0.2,
) -> jnp.ndarray:
    """CCR + CCS margin ranking loss (ref: models/XModules.py:200-255).

    Latent in the live reference: returned by CrossModalAlignment but
    discarded by all callers, and alpha defaults to 0 (ref: run.py:62).
    Implemented for API/parity completeness.

    Args:
      img_rep: (B, L, 2, D) attention + reverse-attention views, normalized.
      txt_rep: (B, L, 1, D) text view, normalized.
    """
    d = img_rep.shape[-1]
    inv_sqrt_d = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))

    # CCR: (B, L, 2) scores of each view against the text vector
    scores = jnp.einsum("blvd,blud->blvu", img_rep, txt_rep)[..., 0] * inv_sqrt_d
    cost_ccr = jnp.clip(margin + scores - scores[..., 0:1], min=0.0)
    view_mask = jnp.array([1.0, 0.0])  # mask out the positive (first) view
    cost_ccr = jnp.where(view_mask[None, None, :] == 1.0, 0.0, cost_ccr)

    # CCS: (B, L, L) attention-view vs text-token Gram
    ccs = jnp.einsum("bld,bmd->blm", img_rep[:, :, 0, :], txt_rep[:, :, 0, :]) * inv_sqrt_d
    diag = jnp.diagonal(ccs, axis1=-2, axis2=-1)[..., None]
    cost_ccs = jnp.clip(margin + ccs - diag, min=0.0)
    eye = jnp.eye(ccs.shape[-1], dtype=bool)[None]
    cost_ccs = jnp.where(eye, 0.0, cost_ccs)
    cost_ccs = jnp.max(cost_ccs, axis=-1)  # max_violation=True

    return alpha * jnp.sum(cost_ccr) + beta * jnp.sum(cost_ccs)
