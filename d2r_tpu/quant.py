"""Weight-only int8 quantization for serving.

TPU-native design: serving latency at small batch is weight-HBM-bound — every
request reads the full parameter set from HBM while the MXU sits idle. Storing
matmul/conv kernels as symmetric per-output-channel int8 cuts those bytes 4x
vs fp32 (2x vs bf16); the dequantize (``q.astype(compute) * scale``) is an
elementwise op XLA fuses into the consuming dot's operand read, so no fp32
copy of the weights is ever materialised. Quality: per-channel symmetric
round-to-nearest on 2-D/4-D ``kernel`` leaves only — biases, LayerNorm/BN
scales and embedding tables stay fp32 (embeddings gather few rows per token,
so quantizing them risks outlier damage for ~no bandwidth win).

No reference equivalent (the torch reference has no serving or quantization
story); this is a TPU-serving addition measured by tools/serve_bench.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class QuantLeaf(struct.PyTreeNode):
    """A quantized parameter: int8 codes + per-output-channel fp32 scale.

    ``scale`` broadcasts against ``q`` (shape ``(1, ..., 1, out)``), so
    ``dequant`` is one fused multiply in the consumer's dtype.
    """

    q: jnp.ndarray      # int8, same shape as the original weight
    scale: jnp.ndarray  # float32, (1, ..., 1, out_channels)

    def dequant(self, dtype) -> jnp.ndarray:
        return self.q.astype(dtype) * self.scale.astype(dtype)


# jax.export serializes the in/out pytree structure of an exported program;
# custom nodes need an explicit registration or export of a quantized
# predictor raises (QuantLeaf has no static auxdata, hence the empty bytes).
jax.export.register_pytree_node_serialization(
    QuantLeaf,
    serialized_name="d2r_tpu.quant.QuantLeaf",
    serialize_auxdata=lambda aux: b"",
    deserialize_auxdata=lambda b: (),
)


def _is_quant_leaf(x) -> bool:
    return isinstance(x, QuantLeaf)


def quantize_array(w: np.ndarray) -> QuantLeaf:
    """Symmetric per-output-channel int8: scale = amax(|w|)/127 over every
    axis but the last (flax puts output channels last for Dense (in, out)
    and Conv (H, W, in, out) kernels)."""
    w = np.asarray(w, np.float32)
    axes = tuple(range(w.ndim - 1))
    amax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return QuantLeaf(q=jnp.asarray(q), scale=jnp.asarray(scale))


def quantize_params(params: Any, mode: str = "int8") -> Any:
    """Quantize every >=2-D ``kernel`` leaf of a flax param tree to int8.

    Returns a tree of the same structure where quantized leaves are
    ``QuantLeaf`` pytree nodes; everything else (biases, norms, embeddings)
    is untouched. ``dequantize_params`` is the exact inverse structure-wise.
    """
    if mode != "int8":
        raise ValueError(f"unknown quantization mode {mode!r}; only 'int8'")
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        if path[-1] == "kernel" and arr.ndim >= 2 and \
                arr.dtype == np.float32:
            out[path] = quantize_array(arr)
        else:
            out[path] = leaf
    return unflatten_dict(out)


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Expand QuantLeaf nodes back to dense arrays in ``dtype``; identity on
    trees with no quantized leaves. Safe to call inside jit — XLA fuses the
    int8 load + scale multiply into the consuming dot."""
    return jax.tree_util.tree_map(
        lambda x: x.dequant(dtype) if _is_quant_leaf(x) else x,
        params, is_leaf=_is_quant_leaf)


def quantized_bytes(params: Any) -> int:
    """Total parameter bytes as stored (int8 codes + scales + fp32 rest)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += np.asarray(leaf).nbytes
    return total
