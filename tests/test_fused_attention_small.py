"""Unit tests for the short-sequence fused attention kernel
(d2r_tpu/ops/kernels/fused_attention.py) in interpret mode on CPU.

The no-dropout forward/backward must match the XLA einsum path exactly
(same fp32 softmax math). The dropout path needs the in-kernel TPU PRNG,
which has no CPU interpreter lowering — it is covered by the TPU-marked
test at the bottom (and exercised by every training bench run, since the
dispatcher routes BERT's 0.1 attention-prob dropout through the kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.ops.kernels.fused_attention import (
    fused_attention_small,
    supports_fused_small,
)

ON_TPU = jax.default_backend() == "tpu"


def _xla_attention(q, k, v, bias, scale):
    s = jnp.einsum("blhd,bshd->bhls", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhls,bshd->blhd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _inputs(B=4, L=10, S=12, H=3, D=8, dtype=jnp.float32):
    kq = jax.random.key(0)
    q = jax.random.normal(jax.random.fold_in(kq, 1), (B, L, H, D), dtype)
    k = jax.random.normal(jax.random.fold_in(kq, 2), (B, S, H, D), dtype)
    v = jax.random.normal(jax.random.fold_in(kq, 3), (B, S, H, D), dtype)
    lengths = np.random.RandomState(0).randint(S // 2, S + 1, size=(B, 1))
    mask = (np.arange(S)[None, :] < lengths).astype(np.float32)
    bias = jnp.asarray((1.0 - mask) * -10000.0)
    return q, k, v, bias


@pytest.mark.parametrize("with_bias", [True, False])
def test_forward_matches_xla(with_bias):
    q, k, v, bias = _inputs()
    scale = q.shape[-1] ** -0.5
    b = bias if with_bias else None
    out = fused_attention_small(q, k, v, b, scale, interpret=True)
    ref = _xla_attention(q, k, v, b, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_backward_matches_xla():
    q, k, v, bias = _inputs()
    scale = q.shape[-1] ** -0.5

    def loss_pl(q, k, v, b):
        return (fused_attention_small(q, k, v, b, scale,
                                      interpret=True) ** 2).sum()

    def loss_x(q, k, v, b):
        return (_xla_attention(q, k, v, b, scale) ** 2).sum()

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_x = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_, name in zip(g_pl, g_x, "qkvb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"d{name} mismatch")


def test_odd_block_sizes():
    """Batch not divisible by the default block must still run (block=1)."""
    q, k, v, bias = _inputs(B=3, L=7, S=9, H=2, D=8)
    scale = q.shape[-1] ** -0.5
    out = fused_attention_small(q, k, v, bias, scale, interpret=True)
    ref = _xla_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_supports_gate():
    q, k, _, _ = _inputs(B=4, L=64, S=50, H=12, D=64)
    assert supports_fused_small(q, k)
    q2, k2, _, _ = _inputs(B=4, L=200, S=200, H=2, D=8)
    assert not supports_fused_small(q2, k2)   # too long for one VMEM tile


@pytest.mark.skipif(not ON_TPU, reason="in-kernel PRNG needs real TPU")
def test_dropout_on_tpu():
    """Dropout: deterministic per seed, mean-preserving, and the backward
    kernel regenerates the SAME mask (sum(dv) == sum(out) when v = ones)."""
    q, k, v, bias = _inputs(B=8, L=16, S=16, H=2, D=8)
    v = jnp.ones_like(v)
    scale = q.shape[-1] ** -0.5
    seed = jnp.uint32(1234)
    rate = 0.5

    def run(s):
        return fused_attention_small(q, k, v, bias, scale, dropout_rate=rate,
                                     dropout_seed=s)

    o1, o2, o3 = run(seed), run(seed), run(jnp.uint32(999))
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.any(o1 != o3))
    assert abs(float(o1.mean()) - 1.0) < 0.1   # E[p/(1-rate)] preserved

    dv = jax.grad(lambda v_: fused_attention_small(
        q, k, v_, bias, scale, dropout_rate=rate,
        dropout_seed=seed).astype(jnp.float32).sum())(v)
    np.testing.assert_allclose(float(dv.astype(jnp.float32).sum()),
                               float(o1.astype(jnp.float32).sum()),
                               rtol=1e-3)
