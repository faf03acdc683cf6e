"""Int8 quantized-training dots (ops/qdot.py, --quant_train).

Pins (1) exactness on exactly-representable operands, (2) the quantization
error bound on random operands, (3) the STE backward of mode 'int8' being
bit-equal math to the unquantized dot's backward, (4) mode 'int8_all'
gradients staying close to exact, and (5) the full tiny model training
under both modes with logits near the unquantized forward.

No reference equivalent (the torch reference trains eager fp32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.ops import qdot
from d2r_tpu.train.state import create_train_state, make_eval_step, make_train_step


@pytest.fixture(autouse=True)
def _reset_mode():
    prev = qdot.MODE
    yield
    qdot.MODE = prev


def _representable(key, shape, axis):
    """Values exactly representable in symmetric int8 along ``axis``: integer
    grids k * s with max |k| == 127 in every slice, so scale == s exactly."""
    k = jax.random.randint(key, shape, -127, 128).astype(jnp.float32)
    # force a +-127 entry into every slice so amax/127 == 1 exactly
    idx = [slice(None)] * len(shape)
    idx[axis] = 0
    k = k.at[tuple(idx)].set(127.0)
    return k * 0.03125  # power-of-two step: k * s / s == k exactly in fp32


class TestQuantDot:
    def test_exact_on_representable_operands(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = _representable(kx, (3, 5, 32), axis=-1)
        w = _representable(kw, (32, 24), axis=0)
        got = qdot.quant_dot(x, w, "int8")
        want = jnp.dot(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_error_bound_random(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(kx, (8, 16, 64))
        w = jax.random.normal(kw, (64, 48))
        got = np.asarray(qdot.quant_dot(x, w, "int8"), np.float64)
        want = np.asarray(jnp.dot(x, w), np.float64)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.03, rel  # two int8 roundings on normal data

    def test_zero_slices_do_not_nan(self):
        x = jnp.zeros((4, 16))
        w = jnp.zeros((16, 8))
        out = qdot.quant_dot(x, w, "int8")
        np.testing.assert_array_equal(np.asarray(out), 0.0)
        g = jax.grad(lambda a: qdot.quant_dot(a, w, "int8_all").sum())(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_ste_backward_matches_exact_dot(self):
        kx, kw, kg = jax.random.split(jax.random.PRNGKey(2), 3)
        x = jax.random.normal(kx, (4, 7, 32))
        w = jax.random.normal(kw, (32, 16))
        ct = jax.random.normal(kg, (4, 7, 16))

        def pull(f):
            _, vjp = jax.vjp(lambda a, b: f(a, b), x, w)
            return vjp(ct)

        dx_q, dw_q = pull(lambda a, b: qdot.quant_dot(a, b, "int8"))
        dx_e, dw_e = pull(jnp.dot)
        np.testing.assert_allclose(np.asarray(dx_q), np.asarray(dx_e),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dw_q), np.asarray(dw_e),
                                   rtol=1e-5, atol=1e-6)

    def test_int8_all_backward_close_to_exact(self):
        kx, kw, kg = jax.random.split(jax.random.PRNGKey(3), 3)
        x = jax.random.normal(kx, (16, 64))
        w = jax.random.normal(kw, (64, 32))
        ct = jax.random.normal(kg, (16, 32))
        _, vjp_q = jax.vjp(lambda a, b: qdot.quant_dot(a, b, "int8_all"), x, w)
        _, vjp_e = jax.vjp(jnp.dot, x, w)
        for got, want in zip(vjp_q(ct), vjp_e(ct)):
            got = np.asarray(got, np.float64)
            want = np.asarray(want, np.float64)
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            assert rel < 0.03, rel

    def test_dispatch_none_is_plain_dot(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(4))
        x = jax.random.normal(kx, (2, 5, 16), jnp.float32)
        w = jax.random.normal(kw, (16, 8), jnp.float32)
        qdot.MODE = "none"
        got = qdot.dispatch_dot(x, w, jnp.float32)
        want = jnp.dot(x, w, preferred_element_type=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_set_mode_rejects_unknown(self):
        with pytest.raises(ValueError, match="quant_train"):
            qdot.set_mode("int4")


@pytest.mark.slow
class TestQuantModel:
    def _setup(self, quant):
        cfg = tiny_test_config(batch_size=4, quant_train=quant)
        model = D2RClassifier(cfg)
        batch = synthetic_batch(4, cfg.max_seq, cfg.vision_config().image_size,
                                vocab_size=cfg.text_config().vocab_size, seed=0)
        state = create_train_state(model, cfg, None, jax.random.PRNGKey(0),
                                   batch, total_steps=10)
        return cfg, model, batch, state

    def test_int8_forward_close_and_trains(self):
        cfg, model, batch, state = self._setup("int8")
        out_q = make_eval_step(model)(state, batch)
        assert np.isfinite(float(out_q["loss"]))

        # same params through the unquantized forward: logits must be close
        # (the model is 2 layers deep; per-dot error is <3%)
        cfg_n = tiny_test_config(batch_size=4)
        model_n = D2RClassifier(cfg_n)
        state_n = state.replace(apply_fn=model_n.apply)
        out_n = make_eval_step(model_n)(state_n, batch)
        lq = np.asarray(out_q["logits"], np.float64)
        ln = np.asarray(out_n["logits"], np.float64)
        rel = np.linalg.norm(lq - ln) / np.linalg.norm(ln)
        assert rel < 0.25, rel
        # and the quantized path must actually differ (the int8 dots ran)
        assert rel > 0.0, "quantized forward identical to fp32: not dispatched"

        # two train steps under STE: finite losses, params move.
        # snapshot first — the jitted step DONATES the state buffers.
        params0 = jax.tree_util.tree_map(np.asarray, state.params)
        step = make_train_step(model)
        state1, m1 = step(state, batch, jax.random.PRNGKey(1))
        state2, m2 = step(state1, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
        moved = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state2.params, params0)
        assert max(jax.tree_util.tree_leaves(moved)) > 0

    def test_int8_all_trains(self):
        cfg, model, batch, state = self._setup("int8_all")
        step = make_train_step(model)
        state1, m1 = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m1["loss"]))
