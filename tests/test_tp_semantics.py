"""Tensor-parallel (model-axis) exactness.

Round-1 proved the data axis only (tests/test_dp_semantics.py); here the
model-axis partition rules (parallel/mesh.py _PARAM_RULES — head-aligned qkv,
MLP up/down, vocab rows) are validated end-to-end: a dp x tp mesh must
reproduce single-device loss/logits/JS and the full jitted train-step update.
The reference has no distributed machinery at all (SURVEY.md section 2.9);
this is the TPU-native scaled-config story (SURVEY.md section 7 "Hard parts").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.parallel.mesh import (
    make_mesh,
    make_param_shardings,
    shard_batch,
)
from d2r_tpu.train.state import (
    _model_inputs,
    create_train_state,
    make_train_step,
)


def _setup(bs=8, seed=0):
    cfg = tiny_test_config(batch_size=bs)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(bs, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=seed)
    inputs = {k: jnp.asarray(v) for k, v in _model_inputs(batch).items()}
    variables = jax.jit(model.init)(jax.random.key(0), **inputs)
    return cfg, model, batch, inputs, variables


def test_partition_rules_fire_on_model_tree(eight_devices):
    """The rules must actually shard the big matmuls (not silently replicate:
    the tiny dims are all divisible by the model-axis size)."""
    _, _, _, _, variables = _setup()
    mesh = make_mesh((4, 2), ("data", "model"))
    sh = make_param_shardings(variables["params"], mesh)
    layer = sh["model"]["encoder_text_layers"]["layer_0"]
    assert layer["attention_self"]["qkv"]["kernel"].spec == P(None, None, "model")
    assert layer["attention_self"]["qkv"]["bias"].spec == P(None, "model")
    assert layer["intermediate_dense"]["kernel"].spec == P(None, "model")
    assert layer["output_dense"]["kernel"].spec == P("model", None)
    vlayer = sh["model"]["encoder_vision_layers"]["layer_0"]
    assert vlayer["self_attn"]["qkv"]["kernel"].spec == P(None, None, "model")
    assert vlayer["mlp_fc1"]["kernel"].spec == P(None, "model")
    emb = sh["model"]["text_embeddings"]["word_embeddings"]["embedding"]
    assert emb.spec == P("model", None)
    # routers/cells stay replicated (small, batch-bound)
    ric = sh["model"]["itr_module"]["dynamic_itr_l0"]["ric"]["router"]
    assert ric["mlp_0"]["kernel"].spec == P()


def test_qkv_sharding_is_head_aligned(eight_devices):
    """Each model shard of the (in, 3, h) qkv kernel owns whole heads of each
    of q/k/v — not a contiguous slice of a concatenated 3h axis."""
    cfg, _, _, _, variables = _setup()
    mesh = make_mesh((4, 2), ("data", "model"))
    sh = make_param_shardings(variables["params"], mesh)
    kernel = variables["params"]["model"]["encoder_text_layers"]["layer_0"][
        "attention_self"]["qkv"]["kernel"]
    tc = cfg.text_config()
    assert kernel.shape == (tc.hidden_size, 3, tc.hidden_size)
    spec = sh["model"]["encoder_text_layers"]["layer_0"]["attention_self"][
        "qkv"]["kernel"].spec
    # sharded axis = per-projection hidden; shard width is a whole number of heads
    assert spec == P(None, None, "model")
    shard_width = tc.hidden_size // mesh.shape["model"]
    assert shard_width % tc.head_dim == 0


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4)])
def test_tp_loss_logits_match_replicated(eight_devices, mesh_shape):
    _, model, _, inputs, variables = _setup()

    @jax.jit
    def train_mode_forward(variables, inputs):
        (loss, logits, aux), mutated = model.apply(
            variables, **inputs, deterministic=True,
            use_running_average=False, mutable=["batch_stats"])
        return loss, logits, aux["js_loss"], mutated["batch_stats"]

    l1, g1, js1, bs1 = train_mode_forward(variables, inputs)

    mesh = make_mesh(mesh_shape, ("data", "model"))
    shardings = make_param_shardings(variables["params"], mesh)
    params = jax.tree_util.tree_map(jax.device_put, variables["params"],
                                    shardings)
    sharded_vars = dict(variables, params=params)
    with mesh:
        l2, g2, js2, bs2 = train_mode_forward(
            sharded_vars, shard_batch(inputs, mesh))

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    np.testing.assert_allclose(float(js1), float(js2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs1),
                    jax.tree_util.tree_leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5)


@pytest.mark.slow
def test_tp_train_step_update_matches_replicated(eight_devices):
    """The FULL jitted train step (grads + AdamW + BatchNorm update) under a
    (2,2) dp x tp mesh lands on the same parameters as the replicated run."""
    cfg, model, batch, _, _ = _setup()
    rng = jax.random.key(7)

    def run(mesh_shape=None):
        state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                                   total_steps=20)
        step = make_train_step(model)
        if mesh_shape is None:
            state, m = step(state, batch, rng)
            return state, float(m["loss"])
        mesh = make_mesh(mesh_shape, ("data", "model"))
        shardings = make_param_shardings(state.params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, state.params,
                                        shardings)
        state = state.replace(params=params)
        with mesh:
            state, m = step(state, shard_batch(batch, mesh), rng)
            return state, float(m["loss"])

    s_rep, l_rep = run(None)
    s_tp, l_tp = run((2, 2))
    np.testing.assert_allclose(l_rep, l_tp, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_rep.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_seq_sharding_constraint_applies_and_noops(eight_devices):
    """Under a dp x tp mesh the helper pins (batch, seq) to P('data','model');
    outside a mesh (or with an indivisible seq dim) it is the identity."""
    from d2r_tpu.parallel.mesh import seq_sharding_constraint

    x = jnp.ones((8, 16, 32))
    # no mesh context: identity
    assert seq_sharding_constraint(x) is x

    mesh = make_mesh((2, 4), ("data", "model"))
    with mesh:
        y = jax.jit(seq_sharding_constraint)(x)
        assert y.sharding.spec == P("data", "model")
        # ragged seq (17 % 4 != 0): no-op rather than an uneven-shard error
        ragged = jnp.ones((8, 17, 32))
        assert seq_sharding_constraint(ragged) is ragged


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4)])
def test_seq_shard_loss_logits_match_replicated(eight_devices, mesh_shape):
    """cfg.seq_shard is a pure layout hint: the sp-annotated towers under
    dp x tp must reproduce the unannotated single-device math (train mode,
    so BatchNorm batch statistics are covered too)."""
    cfg = tiny_test_config(batch_size=8, seq_shard=True)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(8, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=3)
    inputs = {k: jnp.asarray(v) for k, v in _model_inputs(batch).items()}
    variables = jax.jit(model.init)(jax.random.key(0), **inputs)

    @jax.jit
    def train_mode_forward(variables, inputs):
        (loss, logits, aux), mutated = model.apply(
            variables, **inputs, deterministic=True,
            use_running_average=False, mutable=["batch_stats"])
        return loss, logits, aux["js_loss"]

    # no mesh: seq_sharding_constraint no-ops -> plain single-device math
    l1, g1, js1 = train_mode_forward(variables, inputs)

    mesh = make_mesh(mesh_shape, ("data", "model"))
    shardings = make_param_shardings(variables["params"], mesh)
    params = jax.tree_util.tree_map(jax.device_put, variables["params"],
                                    shardings)
    with mesh:
        l2, g2, js2 = train_mode_forward(
            dict(variables, params=params), shard_batch(inputs, mesh))

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    np.testing.assert_allclose(float(js1), float(js2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


@pytest.mark.slow
def test_scan_layers_tp_matches_replicated(eight_devices):
    """cfg.scan_layers under dp x tp: the scanned (N, ...) tower params get a
    leading-axis-shifted PartitionSpec (parallel/mesh.py) and must reproduce
    the replicated forward exactly."""
    from d2r_tpu.utils.weights import stack_tower_layers

    cfg = tiny_test_config(batch_size=8, scan_layers=True)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(8, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    inputs = {k: jnp.asarray(v) for k, v in _model_inputs(batch).items()}
    variables = jax.jit(model.init)(jax.random.key(0), **inputs)

    mesh = make_mesh((2, 2), ("data", "model"))
    sh = make_param_shardings(variables["params"], mesh)
    scanned = sh["model"]["encoder_text_layers"]["layers_scanned"]["layer"]
    # shifted rule: leading (num_layers,) axis unsharded
    assert scanned["attention_self"]["qkv"]["kernel"].spec == \
        P(None, None, None, "model")
    assert scanned["intermediate_dense"]["kernel"].spec == P(None, None, "model")

    @jax.jit
    def fwd(variables, inputs):
        loss, logits, aux = model.apply(
            variables, **inputs, deterministic=True, use_running_average=True)
        return loss, logits

    l1, g1 = fwd(variables, inputs)
    params = jax.tree_util.tree_map(jax.device_put, variables["params"], sh)
    with mesh:
        l2, g2 = fwd(dict(variables, params=params), shard_batch(inputs, mesh))
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


@pytest.mark.parametrize("mesh_shape", [(2, 4)])
def test_fabric_shard_loss_logits_match_replicated(eight_devices, mesh_shape):
    """cfg.fabric_shard is a pure layout hint: respreading the routing
    fabric's batch over (data x model) must reproduce the unannotated
    single-device math exactly (train mode, so GLAC's batch statistics —
    computed from the resharded batch — are covered too)."""
    cfg = tiny_test_config(batch_size=8, fabric_shard=True)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(8, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=5)
    inputs = {k: jnp.asarray(v) for k, v in _model_inputs(batch).items()}
    variables = jax.jit(model.init)(jax.random.key(0), **inputs)

    @jax.jit
    def train_mode_forward(variables, inputs):
        (loss, logits, aux), mutated = model.apply(
            variables, **inputs, deterministic=True,
            use_running_average=False, mutable=["batch_stats"])
        return loss, logits, aux["js_loss"], mutated["batch_stats"]

    # no mesh: fabric_batch_constraint no-ops -> plain single-device math
    l1, g1, js1, bs1 = train_mode_forward(variables, inputs)

    mesh = make_mesh(mesh_shape, ("data", "model"))
    shardings = make_param_shardings(variables["params"], mesh)
    params = jax.tree_util.tree_map(jax.device_put, variables["params"],
                                    shardings)
    with mesh:
        l2, g2, js2, bs2 = train_mode_forward(
            dict(variables, params=params), shard_batch(inputs, mesh))

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    np.testing.assert_allclose(float(js1), float(js2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs1),
                    jax.tree_util.tree_leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5)


def test_fabric_batch_constraint_applies_and_noops(eight_devices):
    """Under dp x tp the helper pins the leading batch dim to
    P(('data','model')); outside a mesh (or with an indivisible batch) it
    is the identity."""
    from d2r_tpu.parallel.mesh import fabric_batch_constraint

    x = jnp.ones((8, 16, 32))
    assert fabric_batch_constraint(x) is x  # no mesh context

    mesh = make_mesh((2, 4), ("data", "model"))
    with mesh:
        y = jax.jit(fabric_batch_constraint)(x)
        assert y.sharding.spec == P(("data", "model"))
        z = jax.jit(lambda a: fabric_batch_constraint(a, undo=True))(x)
        assert z.sharding.spec == P("data")
        # batch 6 % (2*4) != 0: no-op rather than an uneven-shard error
        ragged = jnp.ones((6, 16, 32))
        assert fabric_batch_constraint(ragged) is ragged
