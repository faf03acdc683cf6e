"""Soft path router (ref: models/Router.py:10-26).

Mean-pool over tokens -> MLP(embed -> hid_router -> num_out_path) ->
relu(tanh(x)) soft gate in [0, 1). Two parity-critical quirks preserved:

  * the mean pools over ALL tokens including padding (ref: models/Router.py:23
    — no mask is ever passed), so padding changes the gate; we replicate
    rather than "fix" this because it changes F1.
  * the final layer's bias is initialised to 1.5 so all paths start open
    (ref: models/Router.py:20).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from d2r_tpu.models.layers import TorchLinear


def activate_func(x: jnp.ndarray) -> jnp.ndarray:
    """relu(tanh(x)) (ref: models/Router.py:6-8)."""
    return jax.nn.relu(jnp.tanh(x))


class Router(nn.Module):
    num_out_path: int
    hid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L, D) -> (B, num_out_path) soft gates."""
        pooled = jnp.mean(x, axis=-2)
        h = TorchLinear(self.hid, dtype=self.dtype, name="mlp_0")(pooled)
        h = jax.nn.relu(h)
        h = TorchLinear(self.num_out_path, dtype=self.dtype,
                        bias_init_value=1.5, name="mlp_2")(h)
        return activate_func(h)
