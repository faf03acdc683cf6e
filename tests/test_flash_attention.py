"""Pallas flash-attention kernel tests.

Round-1 gap: the kernel (ops/kernels/flash_attention.py) had zero automated
tests and was unreachable on CPU. It now runs in pallas interpret mode off-TPU
(same grid/block program, executed by XLA), so the online-softmax logic, the
block padding, and the key-bias masking are unit-tested on every CI run; a
TPU-marked test additionally checks the real Mosaic kernel when hardware is
present (run via plain ``python -m pytest`` on the TPU host).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.ops.kernels.flash_attention import (
    _xla_attention,
    flash_attention,
    flash_attention_forward,
)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), dtype)


# (B, H, L, S, D): includes non-multiples of the 128 block (padding path),
# the production shapes (50 vision tokens, 64/128 text tokens), and L != S.
SHAPES = [
    (2, 4, 64, 64, 16),
    (1, 2, 50, 50, 32),
    (2, 2, 128, 128, 64),
    (1, 3, 50, 77, 16),   # cross-shape q vs kv
    (1, 1, 200, 333, 8),  # multi-block grid in both q and k
]


class TestInterpretMode:
    @pytest.mark.parametrize("b,h,l,s,d", SHAPES)
    def test_forward_matches_xla(self, b, h, l, s, d):
        q = _rand((b, h, l, d), 0)
        k = _rand((b, h, s, d), 1)
        v = _rand((b, h, s, d), 2)
        scale = d ** -0.5
        out = flash_attention_forward(q, k, v, None, scale, interpret=True)
        ref = _xla_attention(q, k, v, None, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_key_bias_masks_padding(self):
        b, h, l, s, d = 2, 2, 16, 24, 16
        q, k, v = _rand((b, h, l, d), 3), _rand((b, h, s, d), 4), _rand((b, h, s, d), 5)
        # reference-style additive (1-mask)*-10000 bias
        # (ref: models/modeling_unimo.py:53-59)
        mask = np.ones((b, s), np.float32)
        mask[:, 20:] = 0.0
        key_bias = jnp.asarray((1.0 - mask) * -10000.0)
        out = flash_attention_forward(q, k, v, key_bias, d ** -0.5,
                                      interpret=True)
        ref = _xla_attention(q, k, v, key_bias, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        # masked keys must not influence the output at all
        v_alt = v.at[:, :, 20:, :].set(99.0)
        out_alt = flash_attention_forward(q, k, v_alt, key_bias, d ** -0.5,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_alt),
                                   atol=1e-6)

    def test_bfloat16_inputs(self):
        b, h, l, s, d = 1, 2, 64, 64, 32
        q = _rand((b, h, l, d), 6, jnp.bfloat16)
        k = _rand((b, h, s, d), 7, jnp.bfloat16)
        v = _rand((b, h, s, d), 8, jnp.bfloat16)
        out = flash_attention_forward(q, k, v, None, d ** -0.5, interpret=True)
        ref = _xla_attention(q, k, v, None, d ** -0.5)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_backward_matches_xla_autodiff(self):
        """The custom VJP recomputes through XLA (flash_attention.py _bwd);
        gradients must equal plain autodiff through the XLA attention."""
        b, h, l, s, d = 1, 2, 32, 40, 16
        q, k, v = _rand((b, h, l, d), 9), _rand((b, h, s, d), 10), _rand((b, h, s, d), 11)
        mask = np.ones((b, s), np.float32)
        mask[:, 33:] = 0.0
        key_bias = jnp.asarray((1.0 - mask) * -10000.0)
        scale = d ** -0.5

        def f_kernel(q, k, v):
            return jnp.sum(flash_attention(q, k, v, key_bias, scale) ** 2)

        def f_xla(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, key_bias, scale) ** 2)

        g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_kernel, g_xla):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-5, rtol=2e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real Mosaic kernel needs TPU")
class TestOnTPU:
    def test_mosaic_kernel_matches_xla(self):
        b, h, l, s, d = 2, 12, 128, 256, 64
        q, k, v = _rand((b, h, l, d), 0), _rand((b, h, s, d), 1), _rand((b, h, s, d), 2)
        out = flash_attention_forward(q, k, v, None, d ** -0.5,
                                      interpret=False)
        ref = _xla_attention(q, k, v, None, d ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)
