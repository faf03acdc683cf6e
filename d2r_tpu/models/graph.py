"""Optional SenticNet GCN refinement.

The reference checks in a GraphConvolution layer
(ref: models/modeling_unimo.py:530-553) and the sentic graph builder but
never connects them to the live path (SURVEY.md section 2.8). BASELINE
config 2 runs "with SenticNet graph refinement enabled", so this module makes
the affective-graph path actually usable: a degree-normalised GCN applied to
the text tower output before routing, gated by ``use_sentic_graph`` (off by
default = exact reference behaviour).

Reference GraphConvolution math preserved: ``out = adj @ (x W) /
(rowsum(adj) + 1) + b`` (ref: models/modeling_unimo.py:545-553) — the bias is
added AFTER the degree-normalised adjacency product, so it is not scaled by
rowsum(adj)/(rowsum(adj)+1). The reference leaves the weight uninitialised
(torch.FloatTensor without init) — dead code; here it gets torch-Linear-style
init.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d2r_tpu.models.layers import TorchLinear


class GraphConvolution(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        """x: (B, L, D); adj: (B, L, L) affective adjacency."""
        hidden = TorchLinear(self.features, use_bias=False, dtype=self.dtype,
                             name="weight")(x)
        bound = 1.0 / math.sqrt(x.shape[-1])
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.features,),
        )
        denom = jnp.sum(adj, axis=2, keepdims=True) + 1.0
        out = jnp.einsum("blm,bmd->bld", adj.astype(self.dtype), hidden,
                         preferred_element_type=jnp.float32).astype(self.dtype) / denom
        return out + bias.astype(self.dtype)
