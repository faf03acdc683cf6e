"""Unified multi-head attention dispatch.

All attention in d2r_tpu flows through :func:`dot_product_attention`:
BERT self-attention (post-LN, additive padding bias,
ref: models/modeling_unimo.py:334-401), CLIP-ViT self-attention (pre-LN,
pre-scaled Q — mathematically the same scaled dot-product,
ref: models/modeling_unimo.py:159-219), and the IMRC cell's one-layer
transformer (ref: models/SelfAttention.py:27-42).

Dispatch rules:
  * TPU + no attention-prob dropout  -> pallas flash kernel (fused VMEM pass)
  * otherwise (CPU tests, dropout>0) -> XLA einsum path (fp32 softmax)
Both paths compute identical math; tests assert their agreement.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from d2r_tpu.ops.kernels.flash_attention import flash_attention
from d2r_tpu.ops.kernels.fused_attention import (
    fused_attention_small,
    supports_fused_small,
)


# At / above this key/value length the long-context online-softmax kernel
# (kernels/flash_attention.py, grid over q/k blocks) takes over. Below it
# XLA's batched-matmul attention is the default: the short-sequence fused
# kernel (kernels/fused_attention.py) was MEASURED SLOWER on the full
# flagship step (706.5 vs 821.8 samples/s on v5e, docs/BENCHMARKS.md) —
# Mosaic can neither batch the per-head (64,64,64) dots in one op nor merge
# heads in-register ("unsupported shape cast"), so the per-head loop's
# fixed costs exceed XLA's inefficiency at these shapes. The kernel stays
# available (opt-in below) for its fused backward + in-kernel dropout.
PALLAS_MIN_KV_LEN = 256

# Opt-in switch for the short-sequence fused kernel (tools/perf A/Bs, and
# any future toolchain where Mosaic lowers it better).
SMALL_KERNEL_OPT_IN = False

# Pad sublane-ragged attention sequence dims (the 50 vision tokens) up to a
# multiple of _SEQ_PAD_MULTIPLE inside the XLA einsum path: padded KEYS get a
# -1e9 additive bias (exp underflows to exactly 0.0 in fp32, so real rows'
# softmax is bit-identical), padded QUERY rows are sliced off the output.
# Exact math either way (tests/test_ops.py); a perf A/B knob for whether
# XLA tiles (B,H,64,*) dots onto the MXU better than (B,H,50,*).
PAD_RAGGED_SEQ = False
_SEQ_PAD_MULTIPLE = 64


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _supports_pallas(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    if jax.default_backend() != "tpu":
        return False
    d = q.shape[-1]
    return d % 8 == 0 and k.shape[2] >= PALLAS_MIN_KV_LEN


def _supports_pallas_small(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    return (SMALL_KERNEL_OPT_IN and jax.default_backend() == "tpu"
            and supports_fused_small(q, k))


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, L, H, D) tensors.

    Layout note: inputs stay in the natural projection layout (B, L, H, D) —
    the einsums carry the head axis as a batch dimension so XLA folds the
    head split into the dots instead of materialising (B, H, L, D)
    transposes (measured ~5 ms/step of pure reshuffles at D2R shapes).

    Args:
      q: queries (B, L, H, D).
      k, v: keys/values (B, S, H, D).
      key_bias: optional additive per-key bias (B, S); the reference's
        (1-mask)*-10000 padding bias collapses to this shape
        (ref: models/modeling_unimo.py:53-59).
      scale: score scale; default 1/sqrt(D).
      dropout_rate: attention-probability dropout
        (ref: models/modeling_unimo.py:388, torch semantics: applied to the
        post-softmax probabilities, scaled by 1/(1-p)).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    apply_dropout = dropout_rate > 0.0 and not deterministic
    if use_pallas and _supports_pallas_small(q, k):
        # short-sequence fused kernel: fp32 softmax + (optional) probability
        # dropout + PV in one VMEM pass, fused Pallas backward that
        # regenerates the dropout mask from the seed (no (B,H,L,S) residual)
        seed = None
        if apply_dropout:
            if dropout_rng is None:
                raise ValueError("dropout_rng required when dropout is active")
            seed = jax.random.bits(dropout_rng, (), jnp.uint32)
        return fused_attention_small(
            q, k, v, key_bias, scale,
            dropout_rate=dropout_rate if apply_dropout else 0.0,
            dropout_seed=seed)
    if use_pallas and not apply_dropout and _supports_pallas(q, k):
        # long-context path: the kernel wants (B, H, L, D); the transpose is
        # amortised over a large S
        out = flash_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                              v.transpose(0, 2, 1, 3), key_bias, scale)
        return out.transpose(0, 2, 1, 3)

    lq = q.shape[1]
    if PAD_RAGGED_SEQ:
        m = _SEQ_PAD_MULTIPLE
        lq_p, s_p = _round_up(lq, m), _round_up(k.shape[1], m)
        if lq_p != lq:
            q = jnp.pad(q, ((0, 0), (0, lq_p - lq), (0, 0), (0, 0)))
        if s_p != k.shape[1]:
            pad_s = s_p - k.shape[1]
            if key_bias is None:
                key_bias = jnp.zeros(k.shape[:2], jnp.float32)
            key_bias = jnp.pad(key_bias, ((0, 0), (0, pad_s)),
                               constant_values=-1e9)
            k = jnp.pad(k, ((0, 0), (0, pad_s), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad_s), (0, 0), (0, 0)))

    s = jnp.einsum("blhd,bshd->bhls", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if key_bias is not None:
        s = s + key_bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if apply_dropout:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout is active")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhls,bshd->blhd", p.astype(q.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out[:, :lq] if out.shape[1] != lq else out


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, H*D) -> (B, L, H, D) — a pure reshape, no transpose."""
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, H, D) -> (B, L, H*D) — a pure reshape, no transpose."""
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


def padding_key_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """1/0 padding mask (B, S) -> additive bias (B, S).

    Mirrors get_extended_attention_mask: cast to int then (1-m)*-10000
    (ref: models/modeling_unimo.py:58-59).
    """
    m = attention_mask.astype(jnp.int32).astype(jnp.float32)
    return (1.0 - m) * -10000.0
