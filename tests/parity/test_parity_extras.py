"""Parity/smoke tests for the dead-module library (SURVEY.md section 2.7)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.parity import convert  # noqa: E402
from tests.parity.ref_loader import import_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def test_se_layer(ref):
    torch.manual_seed(0)
    rmod = ref["xm"].SELayer(channel=2).eval()
    x = np.random.default_rng(0).normal(size=(4, 2, 768)).astype(np.float32)
    expect_x, expect_y = rmod(torch.tensor(x))

    from d2r_tpu.models.extras import SELayer
    ours = SELayer(2)
    vs = {"params": {
        "fc_0": {"kernel": convert.t2n(rmod.fc[0].weight).T},
        "fc_2": {"kernel": convert.t2n(rmod.fc[2].weight).T},
    }}
    got_x, got_y = ours.apply(vs, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_x), expect_x.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_y), expect_y.detach().numpy(), atol=1e-5)


def test_graph_reasoning(ref):
    torch.manual_seed(1)
    rmod = ref["xm"].GraphReasoning(64).eval()
    x = np.random.default_rng(1).normal(size=(2, 5, 64)).astype(np.float32)
    expect = rmod(torch.tensor(x))

    from d2r_tpu.models.extras import GraphReasoning
    ours = GraphReasoning(64)
    vs = {"params": {
        "graph_query_w_kernel": convert.t2n(rmod.graph_query_w.weight).T,
        "graph_query_w_bias": convert.t2n(rmod.graph_query_w.bias),
        "graph_key_w_kernel": convert.t2n(rmod.graph_key_w.weight).T,
        "graph_key_w_bias": convert.t2n(rmod.graph_key_w.bias),
        "sim_graph_w_kernel": convert.t2n(rmod.sim_graph_w.weight).T,
        "sim_graph_w_bias": convert.t2n(rmod.sim_graph_w.bias),
    }}
    got = ours.apply(vs, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect.detach().numpy(), atol=1e-5)


def test_gated_query_att_layer(ref):
    torch.manual_seed(2)
    rmod = ref["xm"].GatedQueryAttLayer(64, 4, is_share=False, drop=0.0).eval()
    x = np.random.default_rng(2).normal(size=(2, 6, 64)).astype(np.float32)
    expect = rmod(torch.tensor(x))

    from d2r_tpu.models.extras import GatedQueryAttLayer
    ours = GatedQueryAttLayer(64, 4)
    lin = rmod.linears
    vs = {"params": {
        "linear_q": convert.linear(lin[0]),
        "linear_k": convert.linear(lin[1]),
        "linear_v": convert.linear(lin[2]),
        "fc_q": convert.linear(rmod.fc_q),
        "fc_k": convert.linear(rmod.fc_k),
        "fc_g": convert.linear(rmod.fc_g),
    }}
    got = ours.apply(vs, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect.detach().numpy(), atol=1e-5)


def test_ambiguity_learning_smoke():
    """Sampling-based; assert shape/finiteness and the deterministic
    log-prob path against torch.distributions."""
    from d2r_tpu.models.extras import AmbiguityLearning, _normal_log_prob

    mu = np.random.default_rng(3).normal(size=(4, 2)).astype(np.float32)
    sigma = np.abs(np.random.default_rng(4).normal(size=(4, 2))).astype(np.float32) + 0.1
    z = np.random.default_rng(5).normal(size=(4, 2)).astype(np.float32)
    from torch.distributions import Independent, Normal
    expect = Independent(Normal(torch.tensor(mu), torch.tensor(sigma)), 1
                         ).log_prob(torch.tensor(z))
    got = _normal_log_prob(jnp.asarray(z), jnp.asarray(mu), jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(), rtol=1e-5)

    mod = AmbiguityLearning(weight_js=0.5)
    text = jnp.asarray(np.random.default_rng(6).normal(size=(4, 768)), jnp.float32)
    image = jnp.asarray(np.random.default_rng(7).normal(size=(4, 768)), jnp.float32)
    weight_input = jnp.asarray(np.random.default_rng(8).normal(size=(4, 3)), jnp.float32)
    vs = mod.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                  text, image, weight_input)
    out = mod.apply(vs, text, image, weight_input,
                    rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(out))


def test_self_encoder_smoke(ref):
    """BatchNorm-bearing stack: eval-mode parity vs reference."""
    torch.manual_seed(5)
    import types
    cfgobj = types.SimpleNamespace(hidden_size=64)
    rmod = ref["xm"].SelfEncoder(cfgobj, 32, head=4, drop=0.0).eval()
    x = np.random.default_rng(9).normal(size=(2, 6, 64)).astype(np.float32)
    expect = rmod(torch.tensor(x))

    from d2r_tpu.models.extras import SelfEncoder
    ours = SelfEncoder(hidden_size=64, embed_size=32, head=4)
    agsa = rmod.agsa
    att = agsa.att_layers[0]
    vs = {
        "params": {
            "mapping": convert.linear(rmod.mapping),
            "agsa": {
                "att_0": {
                    "linear_q": convert.linear(att.linears[0]),
                    "linear_k": convert.linear(att.linears[1]),
                    "linear_v": convert.linear(att.linears[2]),
                    "fc_q": convert.linear(att.fc_q),
                    "fc_k": convert.linear(att.fc_k),
                    "fc_g": convert.linear(att.fc_g),
                },
                "bn_0": {"scale": convert.t2n(agsa.bns[0].weight),
                         "bias": convert.t2n(agsa.bns[0].bias)},
            },
            "fc1": convert.linear(rmod.fc1),
            "fc2": convert.linear(rmod.fc2),
            "bn": {"scale": convert.t2n(rmod.bn.weight),
                   "bias": convert.t2n(rmod.bn.bias)},
        },
        "batch_stats": {
            "agsa": {"bn_0": {"mean": convert.t2n(agsa.bns[0].running_mean),
                              "var": convert.t2n(agsa.bns[0].running_var)}},
            "bn": {"mean": convert.t2n(rmod.bn.running_mean),
                   "var": convert.t2n(rmod.bn.running_var)},
        },
    }
    got = ours.apply(vs, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(np.asarray(got), expect.detach().numpy(), atol=2e-5)
