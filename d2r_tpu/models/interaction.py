"""Dynamic-routing fusion fabric (ref: models/DynamicInteraction.py,
models/InteractionModule.py).

TPU-first re-expression: the reference's "dynamic" routing is soft — every
cell always executes and outputs are probability-weighted sums
(ref: models/DynamicInteraction.py:56-67) — so the whole fabric compiles to a
static XLA graph. The per-path Python loops become one einsum mix
``out[i] = sum_j prob[b,i,j] * cell_j(x)`` with the skip-gate as a
``jnp.where``-style mask term. The text branch and the image ("Reversed")
branch share this code with swapped primary/context roles
(ref: models/DynamicInteraction.py:140-254 mirrors :20-134).

Parity-critical quirks preserved:
  * the skip gate uses the RAW (pre-normalisation) gate sums against
    threshold 1e-4 (ref: models/DynamicInteraction.py:50,24);
  * the final (num_out_path==1) layer does NOT normalise probabilities over
    cells; instead it divides by sum(gates)+sum(raw probs)
    (ref: models/DynamicInteraction.py:104-117);
  * the path signature concatenates NORMALISED layer-0/mid probabilities but
    RAW final-layer probabilities (ref: models/DynamicInteraction.py:52,116),
    giving 6^2*(DR_step-1)+6 dims per sample
    (ref: models/InteractionModule.py:18);
  * sim_paths = paths @ paths^T is a batch-global Gram matrix
    (ref: models/InteractionModule.py:53) — under data parallelism XLA
    all-gathers the (B, ~100) path signatures across the mesh, preserving
    exact single-device semantics (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from d2r_tpu.config import D2RConfig
from d2r_tpu.models.cells import (
    ContextRichCrossModalCell,
    CrossModalRefinementCell,
    GlobalEnhancedSemanticCell,
    GlobalLocalAlignmentCell,
    IntraModelReasoningCell,
    RectifiedIdentityCell,
)

Array = jnp.ndarray

NUM_CELLS = 6  # ref: modeling_unimo.py:781-782


class DynamicRoutingLayer(nn.Module):
    """One routing layer: run all 6 cells, mix their outputs by router gates.

    ``streams=None`` marks layer 0 (all cells read the raw primary tokens,
    ref: models/DynamicInteraction.py:37-48); otherwise cell j consumes
    aggregated stream j from the previous layer
    (ref: models/DynamicInteraction.py:95-102). ``context`` is always the
    ORIGINAL other-modality encoder output, at every depth.
    """

    cfg: D2RConfig
    num_out_path: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        streams: Optional[Array],          # (6, B, L, D) or None for layer 0
        primary: Optional[Array],          # (B, L, D); required iff streams is None
        context: Array,                    # (B, S, D) other-modality tokens
        use_running_average: bool = False,
        valid: Optional[Array] = None,     # (B,) row mask -> GLAC's BN stats
    ) -> Tuple[Array, Array]:
        c = self.cfg
        threshold = c.routing_threshold    # 1e-4, ref: DynamicInteraction.py:24
        eps = 1e-8                         # ref: DynamicInteraction.py:25

        if streams is None:
            inputs = [primary] * NUM_CELLS
        else:
            inputs = [streams[j] for j in range(NUM_CELLS)]

        # Cell order is load-bearing (stream 0 feeds the skip gate):
        # [RIC, GLAC, IMRC, CMRC, CRCMC, GESC], ref: DynamicInteraction.py:41-48.
        emb0, p0 = RectifiedIdentityCell(c, self.num_out_path, self.dtype,
                                         name="ric")(inputs[0])
        emb1, p1 = GlobalLocalAlignmentCell(c, self.num_out_path, self.dtype,
                                            name="glac")(
            inputs[1], context, use_running_average=use_running_average,
            valid=valid)
        emb2, p2 = IntraModelReasoningCell(c, self.num_out_path, self.dtype,
                                           name="imrc")(inputs[2])
        emb3, p3 = CrossModalRefinementCell(c, self.num_out_path, self.dtype,
                                            name="cmrc")(inputs[3], context)
        emb4, p4 = ContextRichCrossModalCell(c, self.num_out_path, self.dtype,
                                             name="crcmc")(inputs[4], context)
        emb5, p5 = GlobalEnhancedSemanticCell(c, self.num_out_path, self.dtype,
                                              name="gesc")(inputs[5], context)

        embs = jnp.stack([emb0, emb1, emb2, emb3, emb4, emb5])     # (6, B, L, D)
        raw = jnp.stack([p0, p1, p2, p3, p4, p5], axis=2)          # (B, O, 6)

        if self.num_out_path == 1:
            # Final layer (ref: DynamicInteraction.py:104-117): per-cell skip
            # gates from RAW probs vs threshold/num_cells; weighted average
            # normalised by sum(gates) + sum(raw probs). No prob normalisation.
            probs = raw[:, 0, :]                                   # (B, 6)
            gates = (probs < threshold / NUM_CELLS).astype(probs.dtype)
            refs = jnp.stack(inputs)                               # (6, B, L, D)
            mixed = jnp.einsum("bj,jbld->bld", probs, embs,
                               preferred_element_type=jnp.float32)
            skip = jnp.einsum("bj,jbld->bld", gates, refs,
                              preferred_element_type=jnp.float32)
            denom = (jnp.sum(gates, axis=-1) + jnp.sum(probs, axis=-1))
            out = ((mixed + skip) / denom[:, None, None]).astype(embs.dtype)
            return out[None], raw                                  # (1,B,L,D), (B,1,6)

        # Layer 0 / mid layers (ref: DynamicInteraction.py:50-67): skip gate
        # from RAW per-path sums; probabilities normalised over cells.
        gate_mask = (jnp.sum(raw, axis=-1) < threshold).astype(raw.dtype)  # (B, O)
        norm = raw / (jnp.sum(raw, axis=-1, keepdims=True) + eps)          # (B, O, 6)
        mixed = jnp.einsum("bij,jbld->ibld", norm, embs,
                           preferred_element_type=jnp.float32)             # (O, B, L, D)
        skip = jnp.einsum("bi,bld->ibld", gate_mask, embs[0],
                          preferred_element_type=jnp.float32)
        out = (mixed + skip).astype(embs.dtype)
        return out, norm


class InteractionModule(nn.Module):
    """Full routing pipeline for one branch
    (ref: models/InteractionModule.py:9-55 and the Reversed mirror :61-108).

    ``reversed_mode=False``: text is primary, image is context (text branch).
    ``reversed_mode=True``: image is primary, text is context (image branch).
    Returns the fused stream (B, L, D) and the (B, B) path-similarity Gram.
    """

    cfg: D2RConfig
    reversed_mode: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: Array, image: Array,
                 use_running_average: bool = False,
                 valid: Optional[Array] = None) -> Tuple[Array, Array]:
        c = self.cfg
        num_layers = c.DR_step  # num_layer_routing, ref: modeling_unimo.py:781
        assert num_layers >= 3, "DR_step must be >= 3 (reference requires one mid layer)"

        primary, context = (image, text) if self.reversed_mode else (text, image)
        batch = primary.shape[0]

        streams, paths_l0 = DynamicRoutingLayer(
            c, NUM_CELLS, self.dtype, name="dynamic_itr_l0")(
            None, primary, context, use_running_average, valid)

        mid_paths = []
        for i in range(num_layers - 2):
            streams, p = DynamicRoutingLayer(
                c, NUM_CELLS, self.dtype, name=f"dynamic_itr_l1_{i}")(
                streams, None, context, use_running_average, valid)
            mid_paths.append(p)

        final_streams, paths_l2 = DynamicRoutingLayer(
            c, 1, self.dtype, name="dynamic_itr_l2")(
            streams, None, context, use_running_average, valid)

        # Path signature: 6^2*(DR_step-1) + 6 dims
        # (ref: models/InteractionModule.py:33-47).
        pieces = [paths_l0.reshape(batch, -1)]
        pieces += [p.reshape(batch, -1) for p in mid_paths]
        pieces += [paths_l2.reshape(batch, -1)]
        paths = jnp.concatenate(pieces, axis=-1)

        # Batch-global Gram matrix (ref: models/InteractionModule.py:53).
        sim_paths = jnp.matmul(paths, paths.T,
                               preferred_element_type=jnp.float32)
        return final_streams[0], sim_paths
