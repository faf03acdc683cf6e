"""Opt-in int8 quantized-training matmuls (``--quant_train int8|int8_all``).

Why this exists: the v5e MXU executes int8 x int8 -> int32 dots at ~2x the
bf16 rate (~394 vs ~197 T(FL)OP/s), and docs/ROOFLINE.md certifies the bf16
flagship step as DOT-BOUND (54 ms of dots in a 78 ms step, every scheduling
lever measured-and-rejected). Running the projection dots on the int8 path
is therefore the one throughput lever the bf16 toolchain cannot reach.

This is AQT-style dynamic quantization — no calibration pass, symmetric
scales computed per dot from the live tensors, straight-through-estimator
(STE) backward:

- activations quantize per-row over the contraction axis (one scale per
  output row), kernels per-column (one scale per output feature);
- the int8 dot accumulates in int32; dequantization is a rank-1 rescale
  that XLA fuses into the consumer;
- ``int8`` mode runs only the forward dot in int8 and keeps the backward
  exact (STE: gradients flow as if quantization were identity, computed
  from the saved full-precision operands);
- ``int8_all`` additionally quantizes both backward dots (dx and dW) with
  fresh per-contraction-axis scales, so every projection FLOP in the step
  hits the int8 MXU path.

NOT recipe-parity numerics (the torch reference trains fp32); shipped
opt-in exactly like gradient accumulation. Quantization error and STE
exactness are pinned by tests/test_qdot.py; the TPU throughput A/B lives in
tools/perf_sweep.py (``int8_train`` / ``int8_all_train`` variants) with the
result recorded in docs/BENCHMARKS.md.

No reference equivalent (ref trains eager fp32 torch, modules/train.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MODES = ("none", "int8", "int8_all")

# Trace-time dispatch flag. D2RModel/D2RClassifier set this from
# cfg.quant_train as the FIRST statement of __call__, i.e. before any
# TorchLinear/QKVDense body is traced, so every trace of a model sees its
# own config's mode and retracing another model resets it. Standalone
# module tests (which build layers directly, no D2RModel root) get the
# default "none" = the byte-identical plain-dot path.
MODE = "none"


def set_mode(mode: str) -> None:
    global MODE
    if mode not in MODES:
        raise ValueError(f"quant_train must be one of {MODES}, got {mode!r}")
    MODE = mode


def _quantize(x: jnp.ndarray, axis) -> tuple:
    """Symmetric int8 quantization along ``axis`` (the contraction axes).

    Returns (q_int8, scale_f32_keepdims). Scale math runs in fp32 so bf16
    inputs don't lose scale precision; all-zero slices get scale 1/127
    (quantize to 0, dequantize to 0 — no div-by-zero)."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True).astype(jnp.float32)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.rint(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) @ w (K, N) on the int8 MXU path -> fp32 (..., N)."""
    qx, sx = _quantize(x, -1)                      # sx: (..., 1)
    qw, sw = _quantize(w, 0)                       # sw: (1, N)
    y = jax.lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sx * sw[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def quant_dot(x: jnp.ndarray, w: jnp.ndarray, mode: str = "int8"):
    """Quantized ``x @ w`` with STE backward. Output dtype == x.dtype."""
    return _int8_matmul(x, w).astype(x.dtype)


def _quant_dot_fwd(x, w, mode):
    return _int8_matmul(x, w).astype(x.dtype), (x, w)


def _quant_dot_bwd(mode, res, g):
    x, w = res
    if mode == "int8_all":
        # dx[..., k] = sum_n g[..., n] w[k, n]   (contract N)
        dx = _int8_matmul(g, w.T)
        # dW[k, n] = sum_m x2d[m, k] g2d[m, n]   (contract the batch dims)
        x2d = x.reshape(-1, x.shape[-1])
        g2d = g.reshape(-1, g.shape[-1])
        qx, sx = _quantize(x2d, 0)                 # sx: (1, K)
        qg, sg = _quantize(g2d, 0)                 # sg: (1, N)
        dw = jax.lax.dot_general(
            qx, qg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        dw = dw.astype(jnp.float32) * sx.T * sg[0]
    else:
        # exact STE: the backward of the UNquantized dot on the saved
        # full-precision operands
        dx = jnp.matmul(g, w.T)
        x2d = x.reshape(-1, x.shape[-1])
        g2d = g.reshape(-1, g.shape[-1])
        dw = jax.lax.dot_general(
            x2d, g2d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return dx.astype(x.dtype), dw.astype(w.dtype)


quant_dot.defvjp(_quant_dot_fwd, _quant_dot_bwd)


def dispatch_dot(x: jnp.ndarray, kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """The single dot entry point for TorchLinear/QKVDense.

    MODE == "none" is byte-identical to the pre-quantization code path
    (plain N-D ``jnp.dot`` — see the TorchLinear note on why the N-D dot is
    kept). Quantized modes route through ``quant_dot``.
    """
    if MODE == "none":
        return jnp.dot(x, kernel, preferred_element_type=dtype)
    return quant_dot(x, kernel, MODE).astype(dtype)
