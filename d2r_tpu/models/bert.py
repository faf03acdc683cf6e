"""Flax BERT text tower.

Matches the reference's vendored BERT semantics
(ref: models/modeling_unimo.py:272-512): post-LN blocks, additive
(1-mask)*-10000 padding bias, exact-erf GELU, dropout on embeddings /
attention probs / FFN output. The reference's ``BertIntermediate`` carries an
extra ``fusion_dense`` Linear that is never used in forward
(ref: models/modeling_unimo.py:447 vs :453-456) — it exists there only so
checkpoint key-matching tolerates it; we omit it (behaviour-identical, see
docs/PARITY.md).

Attention runs through the shared fused kernel (ops/attention.py) instead of
materialising (B,H,L,S) scores in HBM as torch bmm does.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from d2r_tpu.config import TextEncoderConfig
from d2r_tpu.models.layers import ACT2FN, QKVDense, TorchLinear
from d2r_tpu.ops.attention import (
    dot_product_attention,
    merge_heads,
    split_heads,
)


class BertEmbeddings(nn.Module):
    """word + position + token_type embeddings, LayerNorm, dropout
    (ref: models/modeling_unimo.py:272-331)."""

    cfg: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool = True,
                 attention_mask=None):
        c = self.cfg
        seq_len = input_ids.shape[1]
        if c.position_style == "roberta":
            # HF RoBERTa create_position_ids_from_input_ids: non-pad token
            # i (1-based cumsum over the mask) -> row pad_token_id + i; pad
            # slots -> the pad_token_id row. Pad-slot fidelity matters here
            # because the Router mean-pools over PADDED tokens (parity
            # quirk, ref: models/Router.py:23) so pad embeddings reach the
            # routing gates.
            if attention_mask is None:
                raise ValueError(
                    "position_style='roberta' needs the attention mask to "
                    "derive position ids")
            # a full-length sequence reaches row seq_len + pad_token_id;
            # XLA's gather CLAMPS out-of-range indices silently, so a
            # too-small table would duplicate the last position rows with
            # no error — fail at trace time instead
            if seq_len + c.pad_token_id + 1 > c.max_position_embeddings:
                raise ValueError(
                    f"roberta positions need max_position_embeddings >= "
                    f"seq_len + pad_token_id + 1 = "
                    f"{seq_len + c.pad_token_id + 1}, have "
                    f"{c.max_position_embeddings}")
            mask = attention_mask.astype(jnp.int32)
            position_ids = jnp.cumsum(mask, axis=1) * mask + c.pad_token_id
        elif c.position_style == "absolute":
            if seq_len > c.max_position_embeddings:
                raise ValueError(
                    f"seq_len {seq_len} exceeds max_position_embeddings "
                    f"{c.max_position_embeddings}")
            position_ids = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
        else:
            raise ValueError(
                f"unknown position_style {c.position_style!r}; "
                "known: 'absolute', 'roberta'")
        words = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                         dtype=self.dtype)(input_ids)
        if c.pad_token_id is not None:
            # torch nn.Embedding(padding_idx=pad) ZEROES d loss/d table[pad]
            # — the reference's PAD embedding row never trains
            # (ref: models/modeling_unimo.py:277), even though pad
            # activations still reach the loss through the Router's
            # pad-pooling quirk. The lookup at an id==pad position depends
            # only on that table row, so stopping the gradient at exactly
            # those positions makes the same cut: table-row-pad grads die,
            # downstream grads are untouched. (Position/token-type tables
            # have no padding_idx in the reference.)
            is_pad = (input_ids == c.pad_token_id)[..., None]
            words = jnp.where(is_pad, jax.lax.stop_gradient(words), words)
        positions = nn.Embed(c.max_position_embeddings, c.hidden_size,
                             name="position_embeddings", dtype=self.dtype)(
            position_ids)
        token_types = nn.Embed(c.type_vocab_size, c.hidden_size,
                               name="token_type_embeddings", dtype=self.dtype)(token_type_ids)
        x = words + token_types + positions
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)
        x = nn.Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class BertSelfAttention(nn.Module):
    """(ref: models/modeling_unimo.py:334-401)."""

    cfg: TextEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, key_bias, deterministic: bool = True):
        c = self.cfg
        # fused QKV: one (h, 3, h) matmul instead of three (h, h) — fewer,
        # larger MXU ops, head-aligned under tensor parallelism (layers.py
        # QKVDense). Converters stack the reference's separate q/k/v weights.
        q, k, v = QKVDense(c.hidden_size, dtype=self.dtype, name="qkv")(x)
        rng = None
        if not deterministic and c.attention_probs_dropout_prob > 0:
            rng = self.make_rng("dropout")
        ctx = dot_product_attention(
            split_heads(q, c.num_attention_heads),
            split_heads(k, c.num_attention_heads),
            split_heads(v, c.num_attention_heads),
            key_bias=key_bias,
            scale=c.head_dim ** -0.5,
            dropout_rate=c.attention_probs_dropout_prob,
            dropout_rng=rng,
            deterministic=deterministic,
            use_pallas=self.use_pallas,
        )
        return merge_heads(ctx)


class BertSelfOutput(nn.Module):
    """dense -> dropout -> LayerNorm(x + input) (ref: models/modeling_unimo.py:404-415)."""

    cfg: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, input_tensor, deterministic: bool = True):
        c = self.cfg
        hidden = TorchLinear(c.hidden_size, dtype=self.dtype, name="dense")(hidden)
        hidden = nn.Dropout(c.hidden_dropout_prob)(hidden, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(hidden + input_tensor)


class BertLayer(nn.Module):
    """Post-LN BERT block (ref: models/modeling_unimo.py:473-512)."""

    cfg: TextEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, key_bias=None, deterministic: bool = True):
        c = self.cfg
        attn_out = BertSelfAttention(c, self.dtype, self.use_pallas, name="attention_self")(
            x, key_bias, deterministic)
        x = BertSelfOutput(c, self.dtype, name="attention_output")(
            attn_out, x, deterministic)

        # FFN. The reference wraps this in apply_chunking_to_forward with
        # chunk_size 0 == no chunking (ref: models/modeling_unimo.py:502-504).
        # The activation output is tagged so the step-level remat policy
        # (train/state.py, cfg.remat_ffn_act) can drop the 4x-wide post-GELU
        # tensor from the saved residuals and recompute it in backward.
        from jax.ad_checkpoint import checkpoint_name
        h = TorchLinear(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        h = checkpoint_name(ACT2FN[c.hidden_act](h), "ffn_act")
        h = TorchLinear(c.hidden_size, dtype=self.dtype, name="output_dense")(h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="output_LayerNorm")(h + x)


class _ScanBertBody(nn.Module):
    """nn.scan body: one BertLayer as a (carry, out) step. The inner child is
    named 'layer' so scanned params live at
    ``encoder/layers_scanned/layer/...`` with a leading (num_layers,) axis
    (see utils/weights.py stack_tower_layers and parallel/mesh.py)."""

    cfg: TextEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True
    seq_shard: bool = False

    @nn.compact
    def __call__(self, x, key_bias, deterministic: bool = True):
        y = BertLayer(self.cfg, self.dtype, self.use_pallas, name="layer")(
            x, key_bias, deterministic)
        if self.seq_shard:
            from d2r_tpu.parallel.mesh import seq_sharding_constraint
            y = seq_sharding_constraint(y)
        return y, None


class BertEncoder(nn.Module):
    """Stack of num_hidden_layers post-LN blocks (the text half of
    UnimoEncoder, ref: models/modeling_unimo.py:697-712).

    ``scan_layers=True`` runs the stack as ONE ``nn.scan`` over stacked
    (num_layers, ...) params instead of 12 inlined copies: identical math
    (tests/test_scan_layers.py pins bit-equality), ~12x smaller HLO — the
    lever against the multi-minute XLA compiles on tunnelled TPU runtimes.
    Dropout rngs are split per layer, as the unrolled loop's per-layer
    fold_in does.
    """

    cfg: TextEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True
    remat: bool = False
    scan_layers: bool = False
    seq_shard: bool = False
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0

    @nn.compact
    def __call__(self, x, key_bias=None, deterministic: bool = True):
        if self.seq_shard:
            from d2r_tpu.parallel.mesh import seq_sharding_constraint
            x = seq_sharding_constraint(x)
        if self.pipeline_stages > 1:
            # pipeline parallelism (models/pipeline.py): same per-layer body
            # as scan_layers, staged over the 'stage' mesh axis. seq_shard
            # stays outside the pipeline (the tick applies stage+data
            # constraints; a per-slot seq constraint inside nn.vmap would
            # see the wrong rank).
            from d2r_tpu.models.pipeline import PipelinedStack
            body = _ScanBertBody
            if self.remat:
                body = nn.remat(_ScanBertBody, static_argnums=(3,))
            return PipelinedStack(
                body, (self.cfg, self.dtype, self.use_pallas, False),
                self.cfg.num_hidden_layers, self.pipeline_stages,
                self.pipeline_microbatches or self.pipeline_stages,
                has_bias=True, name="layers_pipelined")(
                x, key_bias, deterministic)
        if self.scan_layers:
            # remat composes with scan: rematerialise each scan-body step
            # (previously remat was silently ignored under scan_layers).
            body = _ScanBertBody
            if self.remat:
                body = nn.remat(_ScanBertBody, static_argnums=(3,))
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.cfg.num_hidden_layers,
            )
            x, _ = scan(self.cfg, self.dtype, self.use_pallas, self.seq_shard,
                        name="layers_scanned")(x, key_bias, deterministic)
            return x
        block = BertLayer
        if self.remat:
            block = nn.remat(BertLayer, static_argnums=(3,))
        for i in range(self.cfg.num_hidden_layers):
            x = block(self.cfg, self.dtype, self.use_pallas, name=f"layer_{i}")(
                x, key_bias, deterministic)
            if self.seq_shard:
                from d2r_tpu.parallel.mesh import seq_sharding_constraint
                x = seq_sharding_constraint(x)
        return x
