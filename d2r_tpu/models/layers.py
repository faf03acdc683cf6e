"""Shared building-block layers.

``TorchLinear`` reproduces torch.nn.Linear's default init
(kaiming_uniform(a=sqrt(5)) for the kernel, uniform(+-1/sqrt(fan_in)) for the
bias) so that randomly-initialised routing-fabric parameters start from the
same distribution family as the reference. Pretrained tower weights are
converted, so their init never matters.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from d2r_tpu.ops import qdot


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN: dict = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}


def _uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear default initialisation.

    Kernel stored as (in, out) — converters from torch transpose.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    bias_init_value: Optional[float] = None  # e.g. Router's 1.5 final bias

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param("kernel", _uniform_init(bound), (in_features, self.features))
        # NOTE: keep the N-D dot. XLA lowers 3D dots into conv-form HLOs,
        # which profile FINE here — an experiment flattening to 2D dots
        # measured 869 vs 922 samples/s (extra reshape materialisation).
        # dispatch_dot routes to the plain dot (byte-identical) unless the
        # opt-in int8 quantized-training mode is active (ops/qdot.py).
        y = qdot.dispatch_dot(x.astype(self.dtype), kernel.astype(self.dtype),
                              self.dtype)
        if self.use_bias:
            if self.bias_init_value is not None:
                bias = self.param(
                    "bias",
                    lambda key, shape, dtype=jnp.float32: jnp.full(
                        shape, self.bias_init_value, dtype),
                    (self.features,),
                )
            else:
                bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class QKVDense(nn.Module):
    """Fused q/k/v projection with a head-aligned parameter layout.

    Kernel is (in, 3, hidden) / bias (3, hidden) — one MXU matmul like a flat
    (in, 3*hidden) kernel (XLA folds the trailing dims), but the q/k/v
    projections stay separate axes so tensor parallelism can shard `hidden`
    per-projection (parallel/mesh.py P(None, None, 'model')): every shard owns
    whole attention heads instead of a contiguous slice of the concatenated
    3h axis that crosses q/k/v boundaries. Init matches torch.nn.Linear
    (fan_in = in_features, identical distribution to three separate Linears).
    Converters stack the reference's separate q/k/v weights on axis 1
    (d2r_tpu/utils/weights.py::_fused_qkv).

    A/B'd on v5e (docs/BENCHMARKS.md): splitting into three dots against
    param slices to avoid the (B, L, 3, h) output slices measured 782 vs 824
    samples/s — one big fused dot wins; keep the einsum + output slicing.
    """

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param("kernel", _uniform_init(bound),
                            (in_features, 3, self.hidden))
        bias = self.param("bias", _uniform_init(bound), (3, self.hidden))
        if qdot.MODE != "none":
            # quantized path: same math as the einsum through a 2-D-kernel
            # dot (XLA folds the trailing kernel dims either way); the
            # per-column int8 scales then cover each of the 3*hidden outputs
            y = qdot.dispatch_dot(
                x.astype(self.dtype),
                kernel.reshape(in_features, 3 * self.hidden).astype(self.dtype),
                self.dtype)
            y = y.reshape(y.shape[:-1] + (3, self.hidden))
        else:
            y = jnp.einsum("...i,ikh->...kh", x.astype(self.dtype),
                           kernel.astype(self.dtype),
                           preferred_element_type=self.dtype)
        y = y + bias.astype(self.dtype)
        return y[..., 0, :], y[..., 1, :], y[..., 2, :]


class BertPooler(nn.Module):
    """Take token 0 -> Linear -> Tanh (ref: models/modeling_unimo.py:515-527).

    Used 7x across the reference model (also redefined verbatim at
    models/Cells.py:90-102); here it is one shared class.
    """

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        first = hidden_states[:, 0]
        return jnp.tanh(TorchLinear(self.hidden_size, dtype=self.dtype, name="dense")(first))


class TorchBatchNorm(nn.Module):
    """torch.nn.BatchNorm1d semantics over a flattened batch axis.

    Train mode: normalise with biased batch statistics, update running stats
    with momentum 0.1 using the UNBIASED variance (torch behaviour). Eval
    mode: use running stats. Needed by AttentionFiltration
    (ref: models/XModules.py:376,381) — under data parallelism the batch
    statistics are computed over the *global* batch because the whole step is
    jitted over sharded arrays and XLA turns these reductions into cross-chip
    psums, matching single-device math exactly.
    """

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5
    use_running_average: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None,
                 row_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (..., num_features); statistics are over all leading axes.

        ``row_valid`` (B,) restricts train-mode statistics to valid rows:
        wrap-padded final batches then update running stats with EXACTLY the
        reference's ragged-batch statistics (docs/PARITY.md item 3 closed).
        Padded rows are still normalised (with the valid-row stats) — their
        downstream values are discarded by the valid-masked losses/metrics.
        """
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.num_features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.num_features,), jnp.float32))

        x32 = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            if row_valid is not None:
                w = row_valid.astype(jnp.float32).reshape(
                    (x.shape[0],) + (1,) * (x.ndim - 1))
                per_row = 1
                for a in reduce_axes[1:]:
                    per_row *= x.shape[a]
                count = jnp.sum(w) * per_row  # valid rows x positions
                mean = jnp.sum(x32 * w, axis=reduce_axes) / count
                var = jnp.sum(w * jnp.square(x32 - mean), axis=reduce_axes) / count
                unbiased_n = count / jnp.maximum(count - 1.0, 1.0)
            else:
                mean = jnp.mean(x32, axis=reduce_axes)
                var = jnp.mean(jnp.square(x32 - mean), axis=reduce_axes)
                n = 1
                for a in reduce_axes:
                    n *= x.shape[a]
                unbiased_n = n / max(n - 1, 1)
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                unbiased = var * unbiased_n
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)
