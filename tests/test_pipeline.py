"""Pipeline-parallel (stage-axis) exactness.

models/pipeline.py runs each tower's layer stack as a GPipe pipeline
expressed in pure array programs (nn.scan ticks x nn.vmap stages + a
jnp.roll GSPMD lowers to a collective-permute on the 'stage'-sharded
buffer). These tests pin:

  * deterministic pipelined forward == the sequential (scan_layers) stack,
    BIT-identical, with weights mapped by pure reshape;
  * the partition rules shard the (stages, layers_per_stage, ...) weights
    on 'stage' and still compose with the tp rules on the trailing axes;
  * the full jitted train step under a dp x stage x model mesh reproduces
    the same pipelined program's single-device update (layout invariance);
  * utils/weights.py pipeline_tower_layers relayouts converted/scanned
    checkpoints into the pipelined tree.

The reference has no pipeline machinery at all (single GPU, SURVEY.md
section 2.9) — this is TPU-native scale-out surface, like tests/
test_tp_semantics.py for the model axis.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.parallel.mesh import make_mesh, make_param_shardings, shard_batch
from d2r_tpu.train.state import (
    _model_inputs,
    create_train_state,
    make_train_step,
)

PIPE_PREFIX = "layers_pipelined/pipeline/stages_pipelined/layers/"


def _inputs(cfg, bs, seed=0):
    vc = cfg.vision_config()
    batch = synthetic_batch(bs, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size,
                            seed=seed)
    return batch, {k: jnp.asarray(v) for k, v in _model_inputs(batch).items()}


def _pipelined_to_scanned(params):
    """(S, L/S, ...) pipelined tower weights -> (L, ...) scanned layout via
    pure reshape (the documented weight-layout contract)."""
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        if PIPE_PREFIX in k:
            k = k.replace(PIPE_PREFIX, "layers_scanned/")
            v = v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])
        out[k] = v
    return flax.traverse_util.unflatten_dict(out, sep="/")


def test_pipelined_forward_bit_matches_scanned(eight_devices):
    """Deterministic full-model forward: 2-stage/2-microbatch pipeline ==
    the nn.scan stack, logits bit-identical under reshaped weights."""
    cfg_pp = tiny_test_config(pipeline_stages=2, pipeline_microbatches=2,
                              batch_size=4)
    cfg_scan = tiny_test_config(scan_layers=True, batch_size=4)
    mp, ms = D2RClassifier(cfg_pp), D2RClassifier(cfg_scan)
    _, inputs = _inputs(cfg_pp, 4)

    vp = jax.jit(mp.init)(jax.random.key(0), **inputs)
    vs = {"params": _pipelined_to_scanned(vp["params"]),
          "batch_stats": vp["batch_stats"]}

    loss_p, logits_p, aux_p = mp.apply(vp, **inputs, deterministic=True,
                                       use_running_average=True)
    loss_s, logits_s, aux_s = ms.apply(vs, **inputs, deterministic=True,
                                       use_running_average=True)
    np.testing.assert_array_equal(np.asarray(logits_p), np.asarray(logits_s))
    np.testing.assert_array_equal(float(loss_p), float(loss_s))


def test_microbatch_count_does_not_change_math(eight_devices):
    """M=2 vs M=4 microbatches: identical deterministic logits (the batch
    split is pure scheduling, never math)."""
    cfg2 = tiny_test_config(pipeline_stages=2, pipeline_microbatches=2,
                            batch_size=8)
    cfg4 = tiny_test_config(pipeline_stages=2, pipeline_microbatches=4,
                            batch_size=8)
    m2, m4 = D2RClassifier(cfg2), D2RClassifier(cfg4)
    _, inputs = _inputs(cfg2, 8)
    v = jax.jit(m2.init)(jax.random.key(0), **inputs)
    _, logits2, _ = m2.apply(v, **inputs, deterministic=True,
                             use_running_average=True)
    _, logits4, _ = m4.apply(v, **inputs, deterministic=True,
                             use_running_average=True)
    np.testing.assert_array_equal(np.asarray(logits2), np.asarray(logits4))


def test_pipeline_partition_rules(eight_devices):
    """Stage weights shard their leading (stages,) axis over 'stage'; the
    tp rules still fire on the trailing axes; non-tower params replicate."""
    cfg = tiny_test_config(pipeline_stages=2, pipeline_microbatches=2,
                           batch_size=4)
    model = D2RClassifier(cfg)
    _, inputs = _inputs(cfg, 4)
    variables = jax.jit(model.init)(jax.random.key(0), **inputs)

    mesh = make_mesh((2, 2, 2), ("data", "stage", "model"))
    sh = make_param_shardings(variables["params"], mesh)
    flat = flax.traverse_util.flatten_dict(sh, sep="/")
    qkv = flat["model/encoder_text_layers/" + PIPE_PREFIX
               + "layer/attention_self/qkv/kernel"]
    assert qkv.spec == P("stage", None, None, None, "model")
    ln = flat["model/encoder_text_layers/" + PIPE_PREFIX
              + "layer/output_LayerNorm/bias"]
    assert ln.spec == P("stage", None)  # every stage param stage-shards
    # stage-only mesh: stage sharding without tp
    mesh2 = make_mesh((4, 2), ("data", "stage"))
    sh2 = make_param_shardings(variables["params"], mesh2)
    flat2 = flax.traverse_util.flatten_dict(sh2, sep="/")
    assert flat2["model/encoder_text_layers/" + PIPE_PREFIX
                 + "layer/attention_self/qkv/kernel"].spec == P("stage", None)
    # fabric stays replicated
    assert flat2["model/itr_module/dynamic_itr_l0/ric/router/mlp_0/kernel"
                 ].spec == P()


@pytest.mark.slow
def test_pipelined_train_step_layout_invariant(eight_devices):
    """The FULL jitted train step of the pipelined model under a
    (2,2,2) dp x stage x tp mesh lands on the same parameters as the same
    program replicated on one device — sharding is layout, never math."""
    cfg = tiny_test_config(pipeline_stages=2, pipeline_microbatches=2,
                           batch_size=8, prng_impl="threefry2x32")
    model = D2RClassifier(cfg)
    batch, _ = _inputs(cfg, 8)
    rng = jax.random.key(7)

    def run(mesh=None):
        state = create_train_state(model, cfg, None, jax.random.key(0),
                                   batch, total_steps=20)
        step = make_train_step(model)
        if mesh is None:
            state, m = step(state, batch, rng)
            return state, float(m["loss"])
        shardings = make_param_shardings(state.params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, state.params,
                                        shardings)
        state = state.replace(params=params)
        with mesh:
            state, m = step(state, shard_batch(batch, mesh), rng)
            return state, float(m["loss"])

    s_rep, l_rep = run(None)
    s_pp, l_pp = run(make_mesh((2, 2, 2), ("data", "stage", "model")))
    np.testing.assert_allclose(l_rep, l_pp, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_rep.params),
                    jax.tree_util.tree_leaves(s_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_pipeline_tower_layers_relayout(eight_devices):
    """utils/weights.py pipeline_tower_layers: unscanned checkpoint ->
    pipelined tree that reproduces the unscanned model's logits exactly."""
    from d2r_tpu.utils.weights import pipeline_tower_layers

    cfg_seq = tiny_test_config(batch_size=4)
    cfg_pp = tiny_test_config(pipeline_stages=2, pipeline_microbatches=2,
                              batch_size=4)
    m_seq, m_pp = D2RClassifier(cfg_seq), D2RClassifier(cfg_pp)
    _, inputs = _inputs(cfg_seq, 4)
    v_seq = jax.jit(m_seq.init)(jax.random.key(3), **inputs)

    piped = pipeline_tower_layers(v_seq["params"], stages=2)
    v_pp = {"params": piped, "batch_stats": v_seq["batch_stats"]}
    _, logits_seq, _ = m_seq.apply(v_seq, **inputs, deterministic=True,
                                   use_running_average=True)
    _, logits_pp, _ = m_pp.apply(v_pp, **inputs, deterministic=True,
                                 use_running_average=True)
    np.testing.assert_array_equal(np.asarray(logits_seq),
                                  np.asarray(logits_pp))


def test_pipeline_validation_errors(eight_devices):
    """Indivisible stage/microbatch counts fail fast with clear messages."""
    _, inputs = _inputs(tiny_test_config(), 4)
    # 3 stages cannot divide the 2-layer tiny towers
    bad_stages = D2RClassifier(tiny_test_config(pipeline_stages=3,
                                                pipeline_microbatches=3))
    with pytest.raises(ValueError, match="divide"):
        jax.eval_shape(lambda: bad_stages.init(jax.random.key(0), **inputs))
    # 3 microbatches cannot divide batch 4
    bad_mb = D2RClassifier(tiny_test_config(pipeline_stages=2,
                                            pipeline_microbatches=3))
    with pytest.raises(ValueError, match="divide"):
        jax.eval_shape(lambda: bad_mb.init(jax.random.key(0), **inputs))


def test_pipeline_relayout_round_trip(eight_devices):
    """unpipeline_tower_layers inverts pipeline_tower_layers leaf-for-leaf
    (the converter path relies on this to load pretrained weights into
    pipelined geometry, utils/weights.py load_pretrained_params)."""
    from d2r_tpu.utils.weights import (pipeline_tower_layers,
                                       stack_tower_layers,
                                       unpipeline_tower_layers)

    cfg = tiny_test_config(batch_size=4)
    model = D2RClassifier(cfg)
    _, inputs = _inputs(cfg, 4)
    v = jax.jit(model.init)(jax.random.key(1), **inputs)

    piped = pipeline_tower_layers(v["params"], stages=2)
    back = unpipeline_tower_layers(piped)
    want = stack_tower_layers(
        jax.tree_util.tree_map(np.asarray, v["params"]))
    jax.tree_util.tree_map(np.testing.assert_array_equal, back, want)


def test_pipelined_partition_spec_without_stage_axis():
    """Serving a pipelined checkpoint on a stage-LESS mesh (e.g. d2r-serve
    --tp 2 builds ('data','model') only): the tp rule must shift past the
    TWO leading stack axes, never land on them."""
    from jax.sharding import PartitionSpec as P

    from d2r_tpu.parallel.mesh import param_partition_spec

    spec = param_partition_spec(
        "model/encoder_text_layers/layers_pipelined/pipeline/"
        "stages_pipelined/layers/layer/attention_self/qkv/kernel",
        has_model_axis=True, has_stage_axis=False)
    assert spec == P(None, None, None, None, "model")
    # and un-ruled stage params stay fully replicated
    spec = param_partition_spec(
        "model/encoder_text_layers/layers_pipelined/pipeline/"
        "stages_pipelined/layers/layer/output_LayerNorm/scale",
        has_model_axis=True, has_stage_axis=False)
    assert spec == P(None, None)
