"""Cross-modal infrastructure shared by the routing cells.

TPU-native re-expressions of the reference's XModules
(ref: models/XModules.py): the near-hard 100x-temperature cross-modal
attention, the SGRAF attention filtration gate-pool, and the MUTAN/BLOCK
bilinear fusion. The BLOCK fusion's 20 per-chunk Linears become one stacked
(chunks, size, size*rank) einsum so the MXU sees a single batched matmul
instead of 20 tiny ones.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from d2r_tpu.models.layers import TorchBatchNorm, TorchLinear
from d2r_tpu.ops.losses import ccr_contrastive_loss
from d2r_tpu.ops.norms import l1norm, l2norm, torch_style_normalize


class CrossModalAlignment(nn.Module):
    """Near-hard cross-modal attention (ref: models/XModules.py:277-328).

    Q from text, K/V from image; softmax(100 * scores/sqrt(d)) — temperature
    100 makes the attention nearly one-hot (ref: models/XModules.py:309).
    A reverse-attention stream plus a CCR contrastive loss are part of the
    reference forward, but every caller discards the loss and alpha defaults
    to 0 (ref: models/Cells.py:147,238; run.py:62). We only compute the
    reverse stream + loss when ``alpha != 0`` — with alpha=0 the reference
    value is exactly 0.0 and skipping the computation is semantics-preserving
    (the primary output never depends on it).
    """

    hidden_size: int
    temperature: float = 100.0
    alpha: float = 0.0
    margin: float = 0.1
    with_projections: bool = True  # fc_1/fc_2 view projections for the loss
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_emb: jnp.ndarray, image_emb: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = self.hidden_size
        q = TorchLinear(d, dtype=self.dtype, name="query")(text_emb)     # (B, L, D)
        k = TorchLinear(d, dtype=self.dtype, name="key")(image_emb)      # (B, S, D)
        v = TorchLinear(d, dtype=self.dtype, name="value")(image_emb)    # (B, S, D)

        scores = jnp.einsum("bld,bsd->bls", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(d)
        attn = jax.nn.softmax(self.temperature * scores, axis=-1)
        rep = jnp.einsum("bls,bsd->bld", attn.astype(q.dtype), v,
                         preferred_element_type=jnp.float32).astype(q.dtype)

        if self.alpha != 0.0 and self.with_projections:
            # reverse-attention stream (ref: models/XModules.py:313-326)
            reverse_attn = jax.nn.softmax(self.temperature * (1.0 - attn), axis=-1)
            reverse_rep = jnp.einsum("bls,bsd->bld", reverse_attn.astype(q.dtype), v,
                                     preferred_element_type=jnp.float32).astype(q.dtype)
            fwd_view = TorchLinear(d, dtype=self.dtype, name="fc_1")(rep)
            rev_view = TorchLinear(d, dtype=self.dtype, name="fc_2")(reverse_rep)
            views = jnp.stack([fwd_view, rev_view], axis=-2)  # (B, L, 2, D)
            loss = ccr_contrastive_loss(
                torch_style_normalize(views),
                torch_style_normalize(text_emb[:, :, None, :]),
                alpha=self.alpha, beta=0.0, margin=self.margin)
        else:
            loss = jnp.zeros((), jnp.float32)
        return rep, loss


def _xavier_uniform_with_zero_bias(in_f: int, out_f: int):
    """AttentionFiltration init (ref: models/XModules.py:386-394):
    uniform(+-sqrt(6/(in+out))), bias zero."""
    r = math.sqrt(6.0) / math.sqrt(in_f + out_f)

    def kernel_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -r, r)

    return kernel_init


class AttentionFiltration(nn.Module):
    """SGRAF SAF gate-pool (ref: models/XModules.py:366-394).

    sigmoid(BatchNorm1d(Linear(sim_emb) -> (B,1,L+1))) -> L1-normalised
    weights -> weighted sum -> L2 norm. The BatchNorm carries batch-statistic
    state: under jit over globally-sharded arrays the statistics reduce over
    the full global batch, matching single-device reference math.
    """

    sim_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sim_emb: jnp.ndarray, use_running_average: bool = False,
                 row_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, L+1, D) -> (B, D). ``row_valid`` keeps wrap-padded rows out of
        the train-mode BatchNorm statistics (exact ragged-batch math)."""
        in_f = sim_emb.shape[-1]
        kernel = self.param("attn_sim_w_kernel",
                            _xavier_uniform_with_zero_bias(in_f, 1), (in_f, 1))
        bias = self.param("attn_sim_w_bias", nn.initializers.zeros, (1,))
        scores = jnp.einsum("bld,do->blo", sim_emb.astype(self.dtype),
                            kernel.astype(self.dtype)) + bias.astype(self.dtype)
        # torch: BatchNorm1d(1) over (B, C=1, L) — stats over batch*length.
        scores = TorchBatchNorm(1, dtype=self.dtype, name="bn")(
            scores, use_running_average=use_running_average,
            row_valid=row_valid)  # (B, L, 1)
        weights = l1norm(jax.nn.sigmoid(scores[..., 0]), axis=-1)  # (B, L)
        pooled = jnp.einsum("bl,bld->bd", weights, sim_emb,
                            preferred_element_type=jnp.float32).astype(self.dtype)
        return l2norm(pooled, axis=-1)


class BlockFusion(nn.Module):
    """MUTAN/BLOCK bilinear pooling (ref: models/XModules.py:478-555).

    Two d->mm_dim projections, ``chunks`` slices each passed through a
    rank-``rank`` low-rank hadamard product, signed-sqrt + L2 per chunk,
    concat -> output projection. The reference loops over 20 tiny Linears
    (ref: models/XModules.py:533-544); here the chunk weights are one stacked
    (chunks, size, size*rank) tensor contracted with a single einsum.
    """

    output_dim: int
    mm_dim: int = 1600
    chunks: int = 20
    rank: int = 15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        assert self.mm_dim % self.chunks == 0, (
            "mm_dim must divide evenly into chunks (1600/20 in the reference)")
        size = self.mm_dim // self.chunks
        b = x0.shape[0]

        h0 = TorchLinear(self.mm_dim, dtype=self.dtype, name="linear0")(x0)
        h1 = TorchLinear(self.mm_dim, dtype=self.dtype, name="linear1")(x1)
        h0 = h0.reshape(b, self.chunks, size)
        h1 = h1.reshape(b, self.chunks, size)

        bound = 1.0 / math.sqrt(size)

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w0 = self.param("merge_kernel0", uinit, (self.chunks, size, size * self.rank))
        b0 = self.param("merge_bias0", uinit, (self.chunks, size * self.rank))
        w1 = self.param("merge_kernel1", uinit, (self.chunks, size, size * self.rank))
        b1 = self.param("merge_bias1", uinit, (self.chunks, size * self.rank))

        m0 = jnp.einsum("bcs,csr->bcr", h0, w0.astype(self.dtype),
                        preferred_element_type=self.dtype) + b0.astype(self.dtype)
        m1 = jnp.einsum("bcs,csr->bcr", h1, w1.astype(self.dtype),
                        preferred_element_type=self.dtype) + b1.astype(self.dtype)
        m = (m0 * m1).reshape(b, self.chunks, self.rank, size)
        z = jnp.sum(m, axis=2)  # (B, chunks, size)

        # signed sqrt + per-chunk L2 (pos_norm='before_cat',
        # ref: models/XModules.py:541-543)
        z = jnp.sqrt(jax.nn.relu(z)) - jnp.sqrt(jax.nn.relu(-z))
        z = torch_style_normalize(z, axis=-1)
        z = z.reshape(b, self.mm_dim)
        return TorchLinear(self.output_dim, dtype=self.dtype, name="linear_out")(z)
