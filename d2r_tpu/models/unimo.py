"""The full D2R network: dual-branch encoders + dynamic-routing fusion +
bilinear-pooled classification head.

``D2RModel`` mirrors UnimoModel (ref: models/modeling_unimo.py:733-894) and
``D2RClassifier`` mirrors UnimoModelF (ref: models/unimo_model.py:138-162).

Omitted unused-but-constructed reference params (see docs/PARITY.md):
vision_post_layernorm (ref: :743), the commented-out Mild/Diff/BiAffine/SE
blocks (ref: :756-775), path_mapping/bn inside the interaction modules
(ref: models/InteractionModule.py:19-20), and the trailing ``text_pooler``
(ref: :784) — none touch the forward computation.

Module names keep 'vision'/'text' substrings so the reference's
substring-based optimiser grouping (ref: modules/train.py:287-322) and
weight surgery (ref: modules/train.py:92-111) map cleanly onto the flax tree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from d2r_tpu.config import D2RConfig
from d2r_tpu.models.bert import BertEmbeddings, BertEncoder, BertLayer
from d2r_tpu.models.interaction import InteractionModule
from d2r_tpu.models.layers import BertPooler
from d2r_tpu.models.vit import CLIPEncoderLayer, CLIPVisionEmbeddings, CLIPVisionEncoder
from d2r_tpu.models.xmodules import BlockFusion
from d2r_tpu.ops import qdot
from d2r_tpu.ops.attention import padding_key_bias
from d2r_tpu.ops.losses import cross_entropy_loss, path_consistency_loss

Array = jnp.ndarray


class D2RModel(nn.Module):
    """UnimoModel equivalent (ref: models/modeling_unimo.py:733-894)."""

    cfg: D2RConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Array,          # (B, L) int32
        attention_mask: Array,     # (B, L) 1/0
        token_type_ids: Array,     # (B, L) int32
        pixel_values: Array,       # (B, 3, H, W) float
        deterministic: bool = True,
        use_running_average: bool = True,
        sentic_adj: Array = None,  # (B, L, L) affective adjacency (optional)
        valid: Array = None,       # (B,) row mask for wrap-padded batches
    ) -> Tuple[Array, Array]:
        c = self.cfg
        # trace-time dispatch: set BEFORE any TorchLinear/QKVDense body is
        # traced so every projection in this trace uses this cfg's mode
        # (default "none" = the plain-dot path, byte-identical)
        qdot.set_mode(getattr(c, "quant_train", "none"))
        dtype = c.dtype
        tc = c.text_config()
        vc = c.vision_config()

        # --- vision pre (ref: :798-799) ---
        vision_emb = CLIPVisionEmbeddings(vc, dtype, name="vision_embeddings")(pixel_values)
        vision_emb = nn.LayerNorm(epsilon=vc.layer_norm_eps, dtype=dtype,
                                  name="vision_pre_layernorm")(vision_emb)

        # --- text pre (ref: :812-816) ---
        key_bias = padding_key_bias(attention_mask)
        text_emb = BertEmbeddings(tc, dtype, name="text_embeddings")(
            input_ids, token_type_ids, deterministic,
            attention_mask=attention_mask)

        # --- dual towers, sequential and independent (ref: :649-729) ---
        scan = getattr(c, "scan_layers", False)
        sp = getattr(c, "seq_shard", False)
        pp = getattr(c, "pipeline_stages", 1)
        pp_mb = getattr(c, "pipeline_microbatches", 0)
        vision_out = CLIPVisionEncoder(vc, dtype, c.use_pallas, c.remat, scan,
                                       sp, pp, pp_mb,
                                       name="encoder_vision_layers")(
            vision_emb, deterministic)
        text_out = BertEncoder(tc, dtype, c.use_pallas, c.remat, scan, sp,
                               pp, pp_mb, name="encoder_text_layers")(
            text_emb, key_bias, deterministic)

        # --- optional SenticNet affective-graph refinement (extension; the
        # reference checks in GraphConvolution + the graph builder but never
        # connects them, SURVEY.md section 2.8; BASELINE config 2 enables) ---
        if c.use_sentic_graph and sentic_adj is not None:
            from d2r_tpu.models.graph import GraphConvolution
            import jax
            gcn_out = GraphConvolution(tc.hidden_size, dtype,
                                       name="sentic_gcn")(text_out, sentic_adj)
            text_out = text_out + jax.nn.relu(gcn_out)

        # --- one extra self-attention layer per branch (ref: :834-840) ---
        text_self = BertLayer(tc, dtype, c.use_pallas, name="self_text")(
            text_out, key_bias, deterministic)
        text_cls = BertPooler(tc.hidden_size, dtype, name="text_cls_pool")(text_self)
        vision_self = CLIPEncoderLayer(vc, dtype, c.use_pallas, name="self_vision")(
            vision_out, deterministic)
        vision_cls = BertPooler(vc.hidden_size, dtype, name="vision_cls_pool")(vision_self)

        # --- dynamic routing, both branch directions (ref: :842-843).
        # Both consume the raw tower outputs, NOT the self-attended ones. ---
        # `valid` also reaches GLAC's SAF BatchNorm so train-mode statistics
        # on wrap-padded final batches match the reference's ragged batch
        # exactly (docs/PARITY.md item 3).
        fab_text, fab_vision = text_out, vision_out
        if getattr(c, "fabric_shard", False):
            # work-share the fabric over (data x model): tp devices take
            # disjoint batch slices of the dense 6-cell compute instead of
            # replicating it (parallel/mesh.py fabric_batch_constraint)
            from d2r_tpu.parallel.mesh import fabric_batch_constraint
            fab_text = fabric_batch_constraint(text_out)
            fab_vision = fabric_batch_constraint(vision_out)
        text_stream, sim_paths = InteractionModule(
            c, reversed_mode=False, dtype=dtype, name="itr_module")(
            fab_text, fab_vision, use_running_average, valid)
        vision_stream, rev_sim_paths = InteractionModule(
            c, reversed_mode=True, dtype=dtype, name="Reversed_itr_module")(
            fab_text, fab_vision, use_running_average, valid)
        if getattr(c, "fabric_shard", False):
            text_stream = fabric_batch_constraint(text_stream, undo=True)
            vision_stream = fabric_batch_constraint(vision_stream, undo=True)

        # --- CLS Gram matrices + (negative) JS loss (ref: :845-849).
        # `valid` masks wrap-padded rows out of the Gram softmaxes + batchmean
        # so the padded-batch loss equals the reference's ragged-batch loss. ---
        sim_text = jnp.matmul(text_cls, text_cls.T, preferred_element_type=jnp.float32)
        sim_vision = jnp.matmul(vision_cls, vision_cls.T, preferred_element_type=jnp.float32)
        js_loss = path_consistency_loss(
            sim_paths, sim_text, rev_sim_paths, sim_vision,
            c.weight_js_1, c.weight_js_2, valid=valid)

        # --- fusion (ref: :871-884). Both poolers use the TEXT config
        # (ref: :778-779), even the vision-side one. ---
        text_pooled = BertPooler(tc.hidden_size, dtype, name="text_pool")(text_stream)
        vision_pooled = BertPooler(tc.hidden_size, dtype, name="vision_pool")(vision_stream)
        fused = BlockFusion(tc.hidden_size, dtype=dtype, name="block_fusion")(
            text_pooled, vision_pooled)

        return fused, js_loss


class D2RClassifier(nn.Module):
    """UnimoModelF equivalent: task head + CE loss
    (ref: models/unimo_model.py:138-162)."""

    cfg: D2RConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        token_type_ids: Array,
        labels: Array,             # (B,) int
        pixel_values: Array,
        deterministic: bool = True,
        use_running_average: bool = True,
        valid: Array = None,       # optional row mask for wrap-padded batches
        sentic_adj: Array = None,  # optional affective adjacency
    ) -> Tuple[Array, Array, Dict[str, Array]]:
        pooled, js_loss = D2RModel(self.cfg, name="model")(
            input_ids, attention_mask, token_type_ids, pixel_values,
            deterministic, use_running_average, sentic_adj, valid)
        # 'fc' is top-level so the reference's startswith('fc') optimiser
        # group (lr 5e-2, ref: modules/train.py:314-320) maps onto it.
        from d2r_tpu.models.layers import TorchLinear
        logits = TorchLinear(self.cfg.num_classes, dtype=self.cfg.dtype,
                             name="fc")(pooled)
        ce = cross_entropy_loss(logits, labels, valid)
        loss = ce + js_loss  # ref: models/unimo_model.py:160
        return loss, logits, {"ce_loss": ce, "js_loss": js_loss}
