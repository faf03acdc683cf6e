"""Weight-only int8 serving quantization (d2r_tpu/quant.py).

No reference equivalent (the torch reference has no serving/quantization
story). Pins: the quant/dequant roundtrip error bound, the 4x byte shrink on
kernel leaves, structural selectivity (biases/embeddings untouched), and that
a quantized Predictor agrees with the fp32 one on the tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier
from d2r_tpu.quant import (
    QuantLeaf,
    dequantize_params,
    quantize_array,
    quantize_params,
    quantized_bytes,
)


class TestQuantArray:
    def test_roundtrip_error_bounded_by_half_step(self):
        rng = np.random.RandomState(0)
        w = rng.randn(64, 48).astype(np.float32)
        ql = quantize_array(w)
        back = np.asarray(ql.dequant(jnp.float32))
        # round-to-nearest: |err| <= scale/2 per element, per output channel
        step = np.asarray(ql.scale)
        assert np.all(np.abs(back - w) <= step / 2 + 1e-9)

    def test_per_channel_scales(self):
        w = np.zeros((4, 3), np.float32)
        w[:, 0] = [1, -2, 0.5, 0.25]   # amax 2
        w[:, 1] = [127, 0, 0, 0]       # amax 127 -> scale 1
        w[:, 2] = 1e-20                # degenerate column: no div-by-zero
        ql = quantize_array(w)
        np.testing.assert_allclose(np.asarray(ql.scale)[0, :2],
                                   [2 / 127, 1.0], rtol=1e-6)
        assert np.asarray(ql.q).dtype == np.int8
        assert np.isfinite(np.asarray(ql.dequant(jnp.float32))).all()


class TestQuantTree:
    def _params(self):
        cfg = tiny_test_config(batch_size=2)
        model = D2RClassifier(cfg)
        vc = cfg.vision_config()
        b = synthetic_batch(2, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
        variables = model.init(
            jax.random.key(0), jnp.asarray(b["input_ids"]),
            jnp.asarray(b["attention_mask"]), jnp.asarray(b["token_type_ids"]),
            jnp.asarray(b["labels"]), jnp.asarray(b["pixel_values"]))
        return cfg, model, variables, b

    def test_only_kernels_quantized_and_bytes_shrink(self):
        from flax.traverse_util import flatten_dict
        _, _, variables, _ = self._params()
        params = variables["params"]
        qparams = quantize_params(params)
        flat, qflat = flatten_dict(params), flatten_dict(
            qparams, is_leaf=lambda _, v: isinstance(v, QuantLeaf))
        n_kernels = 0
        for path, leaf in flat.items():
            if path[-1] == "kernel" and np.ndim(leaf) >= 2:
                assert isinstance(qflat[path], QuantLeaf), path
                n_kernels += 1
            else:
                assert not isinstance(qflat[path], QuantLeaf), path
                np.testing.assert_array_equal(np.asarray(qflat[path]),
                                              np.asarray(leaf))
        assert n_kernels > 10
        # each quantized kernel stores ~1/4 the bytes of its fp32 original
        # (int8 codes + one fp32 scale per output channel); on the tiny test
        # model the vocab embedding table dominates total bytes, so the
        # guarantee is per-leaf, not whole-tree
        for path, leaf in flat.items():
            if isinstance(qflat[path], QuantLeaf):
                ql = qflat[path]
                stored = np.asarray(ql.q).nbytes + np.asarray(ql.scale).nbytes
                assert stored <= np.asarray(leaf).nbytes / 4 + \
                    np.asarray(ql.scale).nbytes, path
        assert quantized_bytes(qparams) < quantized_bytes(params)

    def test_dequantize_is_identity_on_dense_trees(self):
        _, _, variables, _ = self._params()
        out = dequantize_params(variables["params"], jnp.float32)
        for a, b in zip(jax.tree_util.tree_leaves(out),
                        jax.tree_util.tree_leaves(variables["params"])):
            assert a is b

    @pytest.mark.slow
    def test_quantized_predictor_agrees_with_fp32(self):
        from d2r_tpu.serve import Predictor
        cfg, model, variables, batch = self._params()
        kwargs = dict(batch_buckets=(2,), seq_buckets=(cfg.max_seq,))
        base = Predictor(cfg, variables, **kwargs)
        quant = Predictor(cfg, variables, quantize="int8", **kwargs)
        args = (batch["input_ids"], batch["attention_mask"],
                batch["token_type_ids"], batch["pixel_values"])
        p0 = base.predict(*args)
        p1 = quant.predict(*args)
        np.testing.assert_allclose(p1["probs"], p0["probs"], atol=0.05)
        # argmax must agree wherever the fp32 decision isn't a near-tie
        top2 = np.sort(p0["probs"], axis=-1)
        decisive = (top2[:, -1] - top2[:, -2]) > 0.1
        np.testing.assert_array_equal(p1["label"][decisive],
                                      p0["label"][decisive])

    @pytest.mark.slow
    def test_quantized_mesh_serving_matches_single_device(self):
        """int8 serving composes with dp x tp: the int8 codes inherit the
        dense kernel's partition rule (parallel/mesh.py strips the QuantLeaf
        '/q' / '/scale' suffix), and the sharded quantized predictor
        reproduces the single-device quantized probabilities exactly."""
        from jax.sharding import PartitionSpec as P

        from d2r_tpu.parallel.mesh import make_mesh
        from d2r_tpu.serve import Predictor

        cfg, model, variables, batch = self._params()
        args = (batch["input_ids"], batch["attention_mask"],
                batch["token_type_ids"], batch["pixel_values"])
        kwargs = dict(batch_buckets=(2,), quantize="int8")
        want = Predictor(cfg, variables, **kwargs).predict(*args)

        tp = Predictor(cfg, variables,
                       mesh=make_mesh((1, 2), ("data", "model")), **kwargs)
        np.testing.assert_allclose(tp.predict(*args)["probs"], want["probs"],
                                   atol=1e-5)
        # a TP rule must actually fire on at least one int8 code tensor
        from flax.traverse_util import flatten_dict
        qspecs = {
            path[-2:]: leaf.q.sharding.spec
            for path, leaf in flatten_dict(
                tp.variables["params"],
                is_leaf=lambda _, v: isinstance(v, QuantLeaf)).items()
            if isinstance(leaf, QuantLeaf)}
        assert any(s != P() for s in qspecs.values()), \
            f"no TP rule fired on any int8 code tensor: {qspecs}"
