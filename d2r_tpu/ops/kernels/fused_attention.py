"""Pallas TPU fused attention for SHORT sequences (L, S <= 128) — D2R's shapes.

Why this kernel exists: at D2R's production shapes (B=64, H=12, L=64/50,
D=64) XLA lowers the (B,H)-batched attention einsums to strided batched
matmuls that measure ~5-8 TFLOP/s on v5e (~12 ms/step for ~70 GFLOP — the
single worst dot class in the step trace, see docs/BENCHMARKS.md), and it
materialises the fp32 (B,H,L,S) scores + probabilities in HBM on an
HBM-bandwidth-bound step. This kernel keeps one batch-block of heads
entirely in VMEM: QK^T, bias, fp32 softmax, (optional) probability dropout
and PV run back-to-back per head with zero HBM round-trips.

Contrast with kernels/flash_attention.py (the long-context path): no online
softmax is needed — a full (L, S) score tile fits VMEM trivially — so both
forward AND backward are single-pass Pallas kernels. Backward recomputes the
probabilities from (q, k, bias) flash-style instead of saving them, which
removes the (B,H,L,S) softmax residual from HBM entirely.

Dropout: torch semantics — applied to post-softmax probabilities, scaled by
1/(1-p) (ref: models/modeling_unimo.py:388). Mask bits come from the TPU
PRNG (pltpu.prng_*), seeded per (kernel, batch-block) from a seed derived
from the flax dropout rng; the backward kernel reseeds identically and
regenerates bit-identical masks, so no mask tensor is ever written to HBM.

Layout: (B, L, H, D) — the natural projection layout used everywhere in
d2r_tpu (ops/attention.py). Heads are processed by an in-kernel loop, so no
(B,H,L,D) transpose is ever materialised.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block over batch: heads stay whole (the head loop is in-kernel). 8 keeps
# the unrolled kernel body compilable — 16 blew up the Mosaic compile
# (remote tpu_compile_helper OOM-killed on the 4.7 MB MLIR of the 26-site
# flagship program) — while staying well under the VMEM ceiling.
DEFAULT_BLOCK_B = 8

# Knuth multiplicative hash (0x9E3779B1) as a signed int32, to spread the
# per-block seeds; int32 because SMEM scalars and program ids are int32.
_SEED_MIX = 2654435761 - 2 ** 32


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask from the in-kernel TPU PRNG.

    Comparison runs in signed int32 space (bits and threshold both biased by
    XOR 0x80000000) because uint32 compares are not portable across the
    Mosaic and interpret backends.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    biased = jnp.bitwise_xor(bits, jnp.int32(-(2 ** 31)))
    t = min(int(rate * (2 ** 32)), 2 ** 32 - 1) ^ (2 ** 31)
    if t >= 2 ** 31:
        t -= 2 ** 32
    return biased >= jnp.int32(t)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                scale: float, rate: float, block_b: int, num_heads: int):
    """Inputs are (bb, L/S, H, D) blocks; the output block is (bb, L, H*D) —
    Mosaic cannot store a 2-D tile into a middle-dim head slice (unsupported
    shape cast), so per-head tiles are concatenated along lanes and each
    batch row is written once. The caller reshapes (free in XLA)."""
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _SEED_MIX)

    for b in range(block_b):
        bias = bias_ref[b][None, :]                       # (1, S) fp32
        # ONE sublane relayout to head-major per tensor, instead of 12
        # strided middle-dim gathers (lanes = D stay put).
        Q = jnp.swapaxes(q_ref[b], 0, 1)                  # (H, L, D)
        K = jnp.swapaxes(k_ref[b], 0, 1)
        V = jnp.swapaxes(v_ref[b], 0, 1)
        outs = []
        for h in range(num_heads):
            s = jax.lax.dot_general(
                Q[h], K[h], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (L, S)
            s = s * scale + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)    # fp32 softmax
            if rate > 0.0:
                keep = _keep_mask(p.shape, rate)
                p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), V[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (L, D)
            outs.append(o.astype(o_ref.dtype))
        o_ref[b] = jnp.concatenate(outs, axis=-1)         # (L, H*D)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                scale: float, rate: float, block_b: int, num_heads: int):
    """Recompute p from (q, k, bias) and produce all four input grads.

    PRNG discipline: identical seeding and an identical sequence of
    prng_random_bits calls as the forward kernel, so the dropout masks are
    bit-identical without ever touching HBM.
    """
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _SEED_MIX)

    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for b in range(block_b):
        bias = bias_ref[b][None, :]
        db_acc = jnp.zeros_like(bias)                     # (1, S) fp32
        Qb = jnp.swapaxes(q_ref[b], 0, 1)                 # (H, L, D)
        Kb = jnp.swapaxes(k_ref[b], 0, 1)
        Vb = jnp.swapaxes(v_ref[b], 0, 1)
        Gb = jnp.swapaxes(g_ref[b], 0, 1)
        dqs, dks, dvs = [], [], []
        for h in range(num_heads):
            q, k, v, g = Qb[h], Kb[h], Vb[h], Gb[h]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)    # pre-dropout probs
            if rate > 0.0:
                keep = _keep_mask(p.shape, rate)          # same bits as fwd
                pd = jnp.where(keep, p * inv_keep, 0.0)
            else:
                pd = p
            pd_c = pd.astype(g.dtype)
            # dv = pd^T @ g : contract over L
            dv = jax.lax.dot_general(
                pd_c, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (S, D)
            # dpd = g @ v^T : contract over D
            dpd = jax.lax.dot_general(
                g, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (L, S)
            if rate > 0.0:
                dp = jnp.where(keep, dpd * inv_keep, 0.0)
            else:
                dp = dpd
            # softmax vjp wrt logits (s*scale + bias)
            dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dlog_c = dlog.astype(q.dtype)
            dq = jax.lax.dot_general(
                dlog_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                dlog_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dqs.append(dq.astype(dq_ref.dtype))
            dks.append(dk.astype(dk_ref.dtype))
            dvs.append(dv.astype(dv_ref.dtype))
            db_acc = db_acc + jnp.sum(dlog, axis=0, keepdims=True)
        dq_ref[b] = jnp.concatenate(dqs, axis=-1)         # (L, H*D)
        dk_ref[b] = jnp.concatenate(dks, axis=-1)         # (S, H*D)
        dv_ref[b] = jnp.concatenate(dvs, axis=-1)
        dbias_ref[b, :] = db_acc[0]


# Scoped-VMEM ceiling for these kernels. The default 16 MB limit OOMs the
# backward kernel for head layouts whose D pads badly to the 128-lane tile
# (IMRC: H=16, D=48 -> measured 17.15 MB at block_b=8); v5e has 128 MB VMEM
# per core, so raising the scoped limit is safe at these block sizes.
VMEM_LIMIT_BYTES = 96 * 1024 * 1024


def _pick_block_b(batch: int, l: int, s: int, h: int, d: int) -> int:
    """Largest divisor of batch <= DEFAULT_BLOCK_B whose estimated footprint
    (q,k,v,g in + dq,dk,dv out, double-buffered, lane-padded D) stays well
    under the scoped-VMEM ceiling."""
    d_pad = -(-d // 128) * 128 if d < 128 else d
    per_elem = (4 * l + 3 * s) * h * d_pad * 2          # bytes, bf16
    bb = min(DEFAULT_BLOCK_B, batch)
    while bb > 1 and (batch % bb or 4 * per_elem * bb > VMEM_LIMIT_BYTES):
        bb -= 1
    return bb


def _seed_arg(dropout_seed) -> jnp.ndarray:
    if dropout_seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(dropout_seed, jnp.uint32).reshape((1,)).astype(jnp.int32)


def _common_specs(b, l, s, h, d, bb):
    grid = (b // bb,)
    # index maps take (grid idx, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the *_ tail.
    qspec = pl.BlockSpec((bb, l, h, d), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((bb, s, h, d), lambda i, *_: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((bb, s), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    return grid, qspec, kvspec, bspec


def _fwd_call(q, k, v, bias, seed, scale, rate, interpret=False):
    b, l, h, d = q.shape
    s = k.shape[1]
    bb = _pick_block_b(b, l, s, h, d)
    grid, qspec, kvspec, bspec = _common_specs(b, l, s, h, d, bb)
    kern = functools.partial(_fwd_kernel, scale=scale, rate=rate,
                             block_b=bb, num_heads=h)
    flops = 4 * b * h * l * s * d
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, kvspec, kvspec, bspec],
            out_specs=pl.BlockSpec((bb, l, h * d), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, h * d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * l * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(seed, q, k, v, bias)
    return out.reshape(q.shape)


def _bwd_call(q, k, v, bias, seed, g, scale, rate, interpret=False):
    b, l, h, d = q.shape
    s = k.shape[1]
    bb = _pick_block_b(b, l, s, h, d)
    grid, qspec, kvspec, bspec = _common_specs(b, l, s, h, d, bb)
    kern = functools.partial(_bwd_kernel, scale=scale, rate=rate,
                             block_b=bb, num_heads=h)
    flops = 10 * b * h * l * s * d
    dq, dk, dv, dbias = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[qspec, kvspec, kvspec, bspec, qspec],
            out_specs=(
                pl.BlockSpec((bb, l, h * d), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, s, h * d), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, s, h * d), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, s), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, s, h * d), k.dtype),
            jax.ShapeDtypeStruct((b, s, h * d), v.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * l * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(seed, q, k, v, bias, g)
    return dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape), dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attention(q, k, v, bias, seed, scale, rate, interpret):
    return _fwd_call(q, k, v, bias, seed, scale, rate, interpret)


def _fused_fwd(q, k, v, bias, seed, scale, rate, interpret):
    out = _fwd_call(q, k, v, bias, seed, scale, rate, interpret)
    return out, (q, k, v, bias, seed)


def _fused_bwd(scale, rate, interpret, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv, dbias = _bwd_call(q, k, v, bias, seed, g, scale, rate,
                                  interpret)
    return dq, dk, dv, dbias, jnp.zeros_like(seed)


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_small(
    q: jnp.ndarray,                       # (B, L, H, D)
    k: jnp.ndarray,                       # (B, S, H, D)
    v: jnp.ndarray,                       # (B, S, H, D)
    key_bias: Optional[jnp.ndarray],      # (B, S) additive, or None
    scale: float,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # uint32 scalar when rate>0
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused attention over (B, L, H, D), short-sequence path."""
    b, _, _, _ = q.shape
    s = k.shape[1]
    if key_bias is None:
        bias = jnp.zeros((b, s), jnp.float32)
    else:
        bias = key_bias.astype(jnp.float32)
    seed = _seed_arg(dropout_seed)
    return _fused_attention(q, k, v, bias, seed, float(scale),
                            float(dropout_rate), interpret)


def supports_fused_small(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Shape gate: full (L, S) tiles must fit a single VMEM block."""
    b, l, h, d = q.shape
    s = k.shape[1]
    return l <= 128 and s <= 128 and d % 8 == 0 and b % 2 == 0
