"""Flax CLIP-ViT vision tower.

Matches the reference's vendored CLIP semantics
(ref: models/modeling_unimo.py:87-268): conv patch embedding (patch 32, no
bias) + learned class token + learned position embeddings -> 50 vision
tokens; pre-LN blocks with quick-gelu MLPs. The reference pre-scales Q by
head_dim^-0.5 before the score matmul (ref: models/modeling_unimo.py:170) —
mathematically identical to scaling the scores, which is what the shared
fused attention does. No attention mask (all 50 tokens attend).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from d2r_tpu.config import VisionEncoderConfig
from d2r_tpu.models.layers import ACT2FN, QKVDense, TorchLinear
from d2r_tpu.ops.attention import (
    dot_product_attention,
    merge_heads,
    split_heads,
)


class CLIPVisionEmbeddings(nn.Module):
    """(ref: models/modeling_unimo.py:87-118)."""

    cfg: VisionEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: (B, C, H, W) — channel-first like the reference.

        Accepts either host-normalised float pixels or RAW uint8 pixels
        (pixel_transfer='uint8' data-pipeline mode): uint8 ships 4x fewer
        host->device bytes and the CLIP normalisation ((x/255 - mean)/std,
        same fp32 op order as data/image.py::preprocess_pil) runs on-device,
        fused into the patch conv's input by XLA.
        """
        c = self.cfg
        batch = pixel_values.shape[0]
        if pixel_values.dtype == jnp.uint8:
            from d2r_tpu.data.image import CLIP_MEAN, CLIP_STD
            mean = jnp.asarray(CLIP_MEAN, jnp.float32)[:, None, None]
            std = jnp.asarray(CLIP_STD, jnp.float32)[:, None, None]
            pixel_values = (pixel_values.astype(jnp.float32) / 255.0
                            - mean) / std
        # NCHW -> NHWC for XLA-native conv layout on TPU.
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        patches = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(x)  # (B, H/p, W/p, hidden)
        patches = patches.reshape(batch, -1, c.hidden_size)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(1.0), (c.hidden_size,))
        cls = jnp.broadcast_to(class_embedding.astype(self.dtype),
                               (batch, 1, c.hidden_size))
        embeddings = jnp.concatenate([cls, patches], axis=1)
        positions = nn.Embed(c.num_tokens, c.hidden_size, dtype=self.dtype,
                             name="position_embedding")(
            jnp.arange(c.num_tokens, dtype=jnp.int32)[None, :])
        return embeddings + positions


class CLIPAttention(nn.Module):
    """(ref: models/modeling_unimo.py:136-219)."""

    cfg: VisionEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        # fused head-aligned QKV (see layers.py QKVDense)
        q, k, v = QKVDense(c.hidden_size, dtype=self.dtype, name="qkv")(x)
        rng = None
        if not deterministic and c.attention_dropout > 0:
            rng = self.make_rng("dropout")
        ctx = dot_product_attention(
            split_heads(q, c.num_attention_heads),
            split_heads(k, c.num_attention_heads),
            split_heads(v, c.num_attention_heads),
            scale=c.head_dim ** -0.5,
            dropout_rate=c.attention_dropout,
            dropout_rng=rng,
            deterministic=deterministic,
            use_pallas=self.use_pallas,
        )
        return TorchLinear(c.hidden_size, dtype=self.dtype, name="out_proj")(
            merge_heads(ctx))


class CLIPEncoderLayer(nn.Module):
    """Pre-LN ViT block (ref: models/modeling_unimo.py:222-268)."""

    cfg: VisionEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        residual = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        h = CLIPAttention(c, self.dtype, self.use_pallas, name="self_attn")(h, deterministic)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = TorchLinear(c.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        # tagged for the step-level remat policy (see models/bert.py FFN note)
        from jax.ad_checkpoint import checkpoint_name
        h = checkpoint_name(ACT2FN[c.hidden_act](h), "ffn_act")
        h = TorchLinear(c.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return residual + h


class _ScanCLIPBody(nn.Module):
    """nn.scan body: one CLIPEncoderLayer as a (carry, out) step (see
    models/bert.py _ScanBertBody for the layout contract)."""

    cfg: VisionEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True
    seq_shard: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = CLIPEncoderLayer(self.cfg, self.dtype, self.use_pallas,
                             name="layer")(x, deterministic)
        if self.seq_shard:
            from d2r_tpu.parallel.mesh import seq_sharding_constraint
            y = seq_sharding_constraint(y)
        return y, None


class CLIPVisionEncoder(nn.Module):
    """Stack of pre-LN blocks (the vision half of UnimoEncoder,
    ref: models/modeling_unimo.py:681-695). ``scan_layers`` as in
    models/bert.py BertEncoder."""

    cfg: VisionEncoderConfig
    dtype: Any = jnp.float32
    use_pallas: bool = True
    remat: bool = False
    scan_layers: bool = False
    seq_shard: bool = False
    pipeline_stages: int = 1
    pipeline_microbatches: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.seq_shard:
            from d2r_tpu.parallel.mesh import seq_sharding_constraint
            x = seq_sharding_constraint(x)
        if self.pipeline_stages > 1:
            # pipeline parallelism over the 'stage' mesh axis (see
            # models/bert.py BertEncoder and models/pipeline.py)
            from d2r_tpu.models.pipeline import PipelinedStack
            body = _ScanCLIPBody
            if self.remat:
                body = nn.remat(_ScanCLIPBody, static_argnums=(2,))
            return PipelinedStack(
                body, (self.cfg, self.dtype, self.use_pallas, False),
                self.cfg.num_hidden_layers, self.pipeline_stages,
                self.pipeline_microbatches or self.pipeline_stages,
                has_bias=False, name="layers_pipelined")(
                x, None, deterministic)
        if self.scan_layers:
            body = _ScanCLIPBody
            if self.remat:
                body = nn.remat(_ScanCLIPBody, static_argnums=(2,))
            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,),
                length=self.cfg.num_hidden_layers,
            )
            x, _ = scan(self.cfg, self.dtype, self.use_pallas, self.seq_shard,
                        name="layers_scanned")(x, deterministic)
            return x
        block = CLIPEncoderLayer
        if self.remat:
            block = nn.remat(CLIPEncoderLayer, static_argnums=(2,))
        for i in range(self.cfg.num_hidden_layers):
            x = block(self.cfg, self.dtype, self.use_pallas, name=f"layer_{i}")(
                x, deterministic)
            if self.seq_shard:
                from d2r_tpu.parallel.mesh import seq_sharding_constraint
                x = seq_sharding_constraint(x)
        return x
