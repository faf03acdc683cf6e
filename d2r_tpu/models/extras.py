"""Checked-in-but-dead reference modules (SURVEY.md section 2.7).

None of these are reachable from the reference's live training path; they
are provided as tested library pieces so the module surface is complete:

  * SELayer — squeeze-excitation over modality channels
    (ref: models/XModules.py:258-273), used only by the commented-out
    SE-fusion variant (ref: modeling_unimo.py:874-881). Note the reference's
    ``channel // channel`` reduction is always 1 — reproduced as written.
  * GraphReasoning — SGRAF full-graph similarity reasoning
    (ref: models/XModules.py:331-363).
  * GatedQueryAttLayer / AGSA / SelfEncoder — adaptive gated self-attention
    stack (ref: models/XModules.py:48-143), referenced only by the
    commented-out IMRC variant (ref: models/Cells.py:62-73).
  * VariationalEncoder / AmbiguityLearning — VAE-style modality-ambiguity
    weighting (ref: models/XModules.py:396-450).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from d2r_tpu.models.layers import TorchBatchNorm, TorchLinear
from d2r_tpu.ops.losses import js_div


def _xavier_kernel(in_f: int, out_f: int):
    r = math.sqrt(6.0) / math.sqrt(in_f + out_f)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -r, r)

    return init


class SELayer(nn.Module):
    """(ref: models/XModules.py:258-273). x: (B, C, D) -> (scaled x, gates)."""

    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        y = jnp.mean(x, axis=-1)                       # (B, C) avg-pool
        hidden = self.channel // self.channel          # reference quirk: == 1
        h = TorchLinear(hidden, use_bias=False, dtype=self.dtype, name="fc_0")(y)
        h = jax.nn.relu(h)
        h = TorchLinear(self.channel, use_bias=False, dtype=self.dtype, name="fc_2")(h)
        gate = jax.nn.sigmoid(h)                       # (B, C)
        return x * gate[..., None], gate


class GraphReasoning(nn.Module):
    """(ref: models/XModules.py:331-363)."""

    sim_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sim_emb: jnp.ndarray) -> jnp.ndarray:
        d = self.sim_dim

        def lin(name):
            k = self.param(f"{name}_kernel", _xavier_kernel(d, d), (d, d))
            b = self.param(f"{name}_bias", nn.initializers.zeros, (d,))
            return lambda x: x @ k.astype(self.dtype) + b.astype(self.dtype)

        q = lin("graph_query_w")(sim_emb)
        k = lin("graph_key_w")(sim_emb)
        edge = jax.nn.softmax(
            jnp.einsum("bld,bmd->blm", q, k, preferred_element_type=jnp.float32),
            axis=-1).astype(self.dtype)
        sgr = jnp.einsum("blm,bmd->bld", edge, sim_emb,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return jax.nn.relu(lin("sim_graph_w")(sgr))


class GatedQueryAttLayer(nn.Module):
    """(ref: models/XModules.py:48-88)."""

    embed_size: int
    h: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        b, l, _ = x.shape
        d_k = self.embed_size // self.h
        q = TorchLinear(self.embed_size, dtype=self.dtype, name="linear_q")(x)
        k = TorchLinear(self.embed_size, dtype=self.dtype, name="linear_k")(x)
        v = TorchLinear(self.embed_size, dtype=self.dtype, name="linear_v")(x)
        q = q.reshape(b, l, self.h, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.h, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.h, d_k).transpose(0, 2, 1, 3)

        g = (TorchLinear(d_k, dtype=self.dtype, name="fc_q")(q)
             * TorchLinear(d_k, dtype=self.dtype, name="fc_k")(k))
        m = jax.nn.sigmoid(TorchLinear(2 * d_k, dtype=self.dtype, name="fc_g")(g))
        q = q * m[..., :d_k]
        k = k * m[..., d_k:]

        scores = jnp.einsum("bhld,bhmd->bhlm", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(d_k)
        if mask is not None:
            scores = jnp.where(mask == 0, -1e9, scores)
        p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", p, v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, l, self.embed_size)


class AGSA(nn.Module):
    """Adaptive Gating Self-Attention (ref: models/XModules.py:90-121).
    BatchNorm1d over flattened (B*L, D) rows, torch semantics."""

    num_layers: int
    embed_size: int
    h: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgn_emb: jnp.ndarray, use_running_average: bool = False
                 ) -> jnp.ndarray:
        x = GatedQueryAttLayer(self.embed_size, self.h, dtype=self.dtype,
                               name="att_0")(rgn_emb)
        x = TorchBatchNorm(self.embed_size, dtype=self.dtype, name="bn_0")(
            x, use_running_average=use_running_average)
        agsa = rgn_emb + x
        for i in range(self.num_layers - 1):
            x = GatedQueryAttLayer(self.embed_size, self.h, dtype=self.dtype,
                                   name=f"att_{i+1}")(agsa)
            x = TorchBatchNorm(self.embed_size, dtype=self.dtype, name=f"bn_{i+1}")(
                x, use_running_average=use_running_average)
            agsa = agsa + x
        return agsa


class SelfEncoder(nn.Module):
    """(ref: models/XModules.py:124-143)."""

    hidden_size: int
    embed_size: int
    head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = False
                 ) -> jnp.ndarray:
        h = TorchLinear(self.embed_size, dtype=self.dtype, name="mapping")(x)
        agsa = AGSA(1, self.embed_size, h=self.head, dtype=self.dtype,
                    name="agsa")(h, use_running_average)
        y = TorchLinear(self.hidden_size, dtype=self.dtype, name="fc1")(agsa)
        y = TorchLinear(self.embed_size, dtype=self.dtype, name="fc2")(jax.nn.relu(y))
        y = TorchBatchNorm(self.embed_size, dtype=self.dtype, name="bn")(
            y, use_running_average=use_running_average)
        return agsa + y


class VariationalEncoder(nn.Module):
    """(ref: models/XModules.py:396-412): MLP -> (mu, softplus(sigma)+1e-7)."""

    z_dim: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = TorchLinear(768, dtype=self.dtype, name="net_0")(x)
        params = TorchLinear(2 * self.z_dim, dtype=self.dtype,
                             name="net_2")(jax.nn.relu(h))
        mu = params[..., : self.z_dim]
        sigma = jax.nn.softplus(params[..., self.z_dim:]) + 1e-7
        return mu, sigma


def _normal_log_prob(z, mu, sigma):
    """Independent(Normal(mu, sigma), 1).log_prob(z)."""
    var = jnp.square(sigma)
    lp = -0.5 * (jnp.square(z - mu) / var + jnp.log(2 * jnp.pi * var))
    return jnp.sum(lp, axis=-1)


class AmbiguityLearning(nn.Module):
    """(ref: models/XModules.py:414-450): symmetric-KL ambiguity weighting,
    returning weight_js * (-js_div(weight_input, weight_target))."""

    weight_js: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_encoding, image_encoding, weight_input,
                 rng: Optional[jax.Array] = None):
        mu1, s1 = VariationalEncoder(name="encoder_text")(text_encoding)
        mu2, s2 = VariationalEncoder(name="encoder_image")(image_encoding)
        if rng is None:
            rng = self.make_rng("sample")
        r1, r2 = jax.random.split(rng)
        z1 = mu1 + s1 * jax.random.normal(r1, mu1.shape)
        z2 = mu2 + s2 * jax.random.normal(r2, mu2.shape)
        kl_1_2 = _normal_log_prob(z1, mu1, s1) - _normal_log_prob(z1, mu2, s2)
        kl_2_1 = _normal_log_prob(z2, mu2, s2) - _normal_log_prob(z2, mu1, s1)
        skl = jax.nn.sigmoid((kl_1_2 + kl_2_1) / 2.0)
        weight_uni = (1 - skl)[:, None]
        weight_target = jnp.concatenate(
            [weight_uni, skl[:, None], weight_uni], axis=1)  # (B, 3)
        return self.weight_js * (-js_div(weight_input, weight_target))
