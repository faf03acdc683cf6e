"""Pallas TPU fused (flash) attention.

One kernel serves every attention site in D2R: the 12 BERT layers, the 12
CLIP-ViT layers, the two extra self-attention layers, and the IMRC routing
cells (ref: models/modeling_unimo.py:136-219,334-401; models/SelfAttention.py:11-42).
The reference materialises (B, H, L, S) score tensors in HBM for each of
them; this kernel keeps scores in VMEM and fuses mask + online softmax + PV
into a single pass, which is the main HBM-bandwidth win for short sequences.

Design notes (TPU-first, not a port):
  * grid = (B, H, num_q_blocks, num_k_blocks) — the k axis is innermost and
    TPU grids run sequentially, so the online-softmax state (m, l, acc) lives
    in VMEM scratch that persists across k steps.
  * the padding mask is passed as an additive per-key bias of shape (B, S)
    ((1-mask)*-10000, ref: models/modeling_unimo.py:53-59) rather than a
    broadcast (B, 1, 1, S) tensor, so no (B,H,L,S) buffer ever exists.
  * backward uses recomputation: the custom VJP re-runs the mathematically
    identical XLA attention under ``jax.vjp``. Forward stays fused; backward
    matches autodiff exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _attention_kernel(q_ref, k_ref, v_ref, kbias_ref, o_ref, m_scr, l_scr, acc_scr, *, scale):
    """One (batch, head, q-block, k-block) grid step of online-softmax attention."""
    ki = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, d)
    k = k_ref[0, 0].astype(jnp.float32)                  # (bk, d)
    v = v_ref[0, 0].astype(jnp.float32)                  # (bk, d)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (bq, bk)
    s = s + kbias_ref[0]                                 # additive key bias (1, bk)

    m_prev = m_scr[:]                                    # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                               # (bq, bk)
    correction = jnp.exp(m_prev - m_new)                 # (bq, 1)

    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def flash_attention_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_bias: Optional[jnp.ndarray],
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention forward. q: (B,H,L,D); k,v: (B,H,S,D); key_bias: (B,S).

    ``interpret`` defaults to automatic: off on TPU (real Mosaic kernel), ON
    elsewhere — so the kernel's logic is unit-testable on the CPU test mesh
    (pallas interpret mode executes the same grid/block program in pure XLA).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, l, d = q.shape
    s = k.shape[2]
    # TPU tiling: block sublane dims must be multiples of 8 (or the full dim)
    block_q = min(block_q, ((l + 7) // 8) * 8)
    block_k = min(block_k, ((s + 7) // 8) * 8)

    if key_bias is None:
        key_bias = jnp.zeros((b, s), dtype=jnp.float32)
    key_bias = key_bias.astype(jnp.float32)

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    # padded keys must never win the softmax
    biasp = _pad_to(key_bias, 1, block_k, value=NEG_INF)[:, None, :]  # (B,1,Sp)

    lp, sp = qp.shape[2], kp.shape[2]
    grid = (b, h, lp // block_q, sp // block_k)

    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lp * sp * d,
            bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lp * sp,
        ),
        interpret=interpret,
    )(qp, kp, vp, biasp)

    return out[:, :, :l, :]


def _xla_attention(q, k, v, key_bias, scale):
    """Reference XLA attention — identical math, used for backward/fallback."""
    s = jnp.einsum("bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if key_bias is not None:
        s = s + key_bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhls,bhsd->bhld", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, key_bias, scale):
    return flash_attention_forward(q, k, v, key_bias, scale)


def _fwd(q, k, v, key_bias, scale):
    return flash_attention_forward(q, k, v, key_bias, scale), (q, k, v, key_bias)


def _bwd(scale, res, g):
    q, k, v, key_bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, key_bias, scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
