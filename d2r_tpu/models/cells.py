"""The six routing cells (ref: models/Cells.py) plus the CMRC Refinement op
(ref: models/Refinement.py:120-154).

Every cell owns its own Router and returns ``(emb, path_prob)`` where emb is
(B, L, D) and path_prob is (B, num_out_path). Soft routing means every cell
always executes — no data-dependent control flow, so the whole fabric jits
into one static XLA graph (the TPU-native win over the reference's Python
loops).

Cell order inside a routing layer is load-bearing for the skip-gate (stream 0
must be the RectifiedIdentityCell): [RIC, GLAC, IMRC, CMRC, CRCMC, GESC]
(ref: models/DynamicInteraction.py:41-48).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from d2r_tpu.config import D2RConfig
from d2r_tpu.models.layers import BertPooler, TorchLinear
from d2r_tpu.models.router import Router
from d2r_tpu.models.xmodules import AttentionFiltration, CrossModalAlignment
from d2r_tpu.ops.attention import dot_product_attention, merge_heads, split_heads
from d2r_tpu.ops.norms import l2norm

Array = jnp.ndarray
CellOut = Tuple[Array, Array]

# Stream order within every routing layer (ref: models/DynamicInteraction.py:41-48).
CELL_NAMES = ("ric", "glac", "imrc", "cmrc", "crcmc", "gesc")


class RectifiedIdentityCell(nn.Module):
    """ReLU pass-through (ref: models/Cells.py:30-40)."""

    cfg: D2RConfig
    num_out_path: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> CellOut:
        path_prob = Router(self.num_out_path, self.cfg.hid_router,
                           dtype=self.dtype, name="router")(x)
        return jax.nn.relu(x), path_prob


class IntraModelReasoningCell(nn.Module):
    """One post-norm-free self-attention block (ref: models/Cells.py:42-60;
    models/SelfAttention.py:56-70): residual MHA then residual FFN, no
    LayerNorm, dropout 0."""

    cfg: D2RConfig
    num_out_path: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> CellOut:
        c = self.cfg
        path_prob = Router(self.num_out_path, c.hid_router,
                           dtype=self.dtype, name="router")(x)
        d = c.embed_size
        h = c.num_head_IMRC
        from d2r_tpu.models.layers import QKVDense
        q, k, v = QKVDense(d, dtype=self.dtype, name="sa_qkv")(x)
        ctx = dot_product_attention(
            split_heads(q, h), split_heads(k, h), split_heads(v, h),
            scale=(d // h) ** -0.5, use_pallas=c.use_pallas)
        # NOTE: the reference AttentionLayer has no output projection
        # (ref: models/SelfAttention.py:27-42).
        self_att = x + merge_heads(ctx)
        f = TorchLinear(c.hid_IMRC, dtype=self.dtype, name="ffn_fc1")(self_att)
        f = TorchLinear(d, dtype=self.dtype, name="ffn_fc2")(jax.nn.relu(f))
        return self_att + f, path_prob


class GlobalLocalAlignmentCell(nn.Module):
    """SGRAF-style global+local similarity filtration
    (ref: models/Cells.py:131-175)."""

    cfg: D2RConfig
    num_out_path: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: Array, image: Array,
                 use_running_average: bool = False,
                 valid: Array = None) -> CellOut:
        c = self.cfg
        d = c.embed_size
        path_prob = Router(self.num_out_path, c.hid_router,
                           dtype=self.dtype, name="router")(text)

        text_aware_image, _ = CrossModalAlignment(
            d, temperature=c.cma_temperature, alpha=c.alpha, margin=c.margin,
            dtype=self.dtype, name="cma")(text, image)

        sim_local = jnp.square(text - text_aware_image)
        sim_local = l2norm(TorchLinear(d, dtype=self.dtype,
                                       name="fc_sim_tranloc")(sim_local), axis=-1)
        sim_local = TorchLinear(d, dtype=self.dtype, name="fc_1")(sim_local)

        text_cls = BertPooler(d, dtype=self.dtype, name="text_cls_pool")(text)
        image_cls = BertPooler(d, dtype=self.dtype, name="image_cls_pool")(image)
        sim_global = jnp.square(text_cls - image_cls)
        sim_global = l2norm(TorchLinear(d, dtype=self.dtype,
                                        name="fc_sim_tranglo")(sim_global), axis=-1)
        sim_global = TorchLinear(d, dtype=self.dtype, name="fc_2")(sim_global)

        sim_emb = jnp.concatenate([sim_global[:, None, :], sim_local], axis=1)
        sim_emb = AttentionFiltration(d, dtype=self.dtype, name="saf")(
            sim_emb, use_running_average=use_running_average,
            row_valid=valid)  # (B, D)
        emb = jnp.broadcast_to(sim_emb[:, None, :],
                               (text.shape[0], text.shape[1], d))
        return emb, path_prob


class Refinement(nn.Module):
    """FiLM-style cross-modal modulation (ref: models/Refinement.py:120-154).

    Its private CrossModalAlignment (config-only ctor, no loss,
    ref: models/Refinement.py:86-117) is distinct from the XModules flavour;
    the unused fc_1/fc_2 params it constructs are omitted (docs/PARITY.md).
    """

    cfg: D2RConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: Array, image: Array) -> Array:
        c = self.cfg
        d = c.embed_size
        wei_context, _ = CrossModalAlignment(
            d, temperature=c.cma_temperature, alpha=0.0,
            with_projections=False, dtype=self.dtype, name="cma")(text, image)
        scaling = jnp.tanh(TorchLinear(d, dtype=self.dtype, name="fc_scale")(wei_context))
        shifting = TorchLinear(d, dtype=self.dtype, name="fc_shift")(wei_context)
        modu = TorchLinear(d, dtype=self.dtype, name="fc_1")(text * scaling + shifting)
        modu = TorchLinear(d, dtype=self.dtype, name="fc_2")(jax.nn.relu(modu))
        return modu + text


class CrossModalRefinementCell(nn.Module):
    """(ref: models/Cells.py:76-87)."""

    cfg: D2RConfig
    num_out_path: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: Array, image: Array) -> CellOut:
        path_prob = Router(self.num_out_path, self.cfg.hid_router,
                           dtype=self.dtype, name="router")(text)
        refined = Refinement(self.cfg, dtype=self.dtype, name="refine")(text, image)
        return refined, path_prob


class ContextRichCrossModalCell(nn.Module):
    """Two-round cross-modal attention (ref: models/Cells.py:222-255).
    The second score matmul is UNscaled before its softmax
    (ref: models/Cells.py:244-245)."""

    cfg: D2RConfig
    num_out_path: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: Array, image: Array) -> CellOut:
        c = self.cfg
        d = c.embed_size
        path_prob = Router(self.num_out_path, c.hid_router,
                           dtype=self.dtype, name="router")(text)
        text_aware_image, _ = CrossModalAlignment(
            d, temperature=c.cma_temperature, alpha=c.alpha, margin=c.margin,
            dtype=self.dtype, name="cma")(text, image)
        q_state = jnp.tanh(TorchLinear(d, dtype=self.dtype, name="fc_mlp_1")(text_aware_image))
        k_state = jnp.tanh(TorchLinear(d, dtype=self.dtype, name="fc_mlp_2")(text))
        q = TorchLinear(d, dtype=self.dtype, name="fc_1")(q_state)
        k = TorchLinear(d, dtype=self.dtype, name="fc_2")(k_state)
        scores = jax.nn.softmax(
            jnp.einsum("bld,bmd->blm", q, k, preferred_element_type=jnp.float32),
            axis=-1)
        out = q_state + jnp.einsum("blm,bmd->bld", scores.astype(q.dtype), k_state,
                                   preferred_element_type=jnp.float32).astype(q.dtype)
        return out, path_prob


class GlobalEnhancedSemanticCell(nn.Module):
    """Gated global fusion (ref: models/Cells.py:179-218). The gate is a
    softmax over the FEATURE dimension (ref: models/Cells.py:207)."""

    cfg: D2RConfig
    num_out_path: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text: Array, image: Array) -> CellOut:
        c = self.cfg
        d = c.embed_size
        path_prob = Router(self.num_out_path, c.hid_router,
                           dtype=self.dtype, name="router")(text)
        text_cls = BertPooler(d, dtype=self.dtype, name="text_cls_pool")(text)
        image_cls = BertPooler(d, dtype=self.dtype, name="image_cls_pool")(image)
        h = TorchLinear(d, dtype=self.dtype, name="fc_mlp_0")(text_cls + image_cls)
        h = TorchLinear(d, dtype=self.dtype, name="fc_mlp_2")(jnp.tanh(h))
        gate = jax.nn.softmax(h, axis=-1)
        gate_out = gate * text_cls + (1.0 - gate) * image_cls
        emb = jnp.broadcast_to(gate_out[:, None, :],
                               (text.shape[0], text.shape[1], d))
        return emb, path_prob
