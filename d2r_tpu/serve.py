"""Inference / serving path (BASELINE config 5: padded-routing inference).

The reference has no serving story beyond the test loop
(ref: modules/train.py:220-278). TPU-native design:

  * a ``Predictor`` wrapping one jitted deterministic forward per
    (batch, seq) bucket — requests are padded up to the nearest bucket so
    XLA compiles a handful of programs once and every request after that is
    a single device launch;
  * batched predict returns labels + probabilities; padding rows are
    stripped before returning;
  * ``latency_stats`` measures steady-state p50/p95 for the benchmark.
"""

from __future__ import annotations

import bisect
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import D2RConfig
from d2r_tpu.models.unimo import D2RClassifier


class Predictor:
    """Bucketed, jitted batch predictor over a trained parameter tree."""

    def __init__(
        self,
        cfg: D2RConfig,
        variables: Dict,
        batch_buckets: Sequence[int] = (1, 8, 32),
        seq_buckets: Optional[Sequence[int]] = None,
        mesh=None,
        quantize: Optional[str] = None,
    ):
        if getattr(cfg, "pipeline_stages", 1) > 1:
            # Pipeline parallelism is a TRAINING layout: the stage-sharded
            # (S, N/S, ...) tower stacks want a 'stage' mesh axis and
            # microbatch-divisible batches — the bucketed serving path has
            # neither (batch bucket 1 can never divide microbatches>1).
            # Relayout to the scanned (N, ...) stack — a pure reshape,
            # bit-identical math (tests/test_pipeline.py) — and serve that.
            import dataclasses

            from d2r_tpu.utils.weights import unpipeline_tower_layers
            variables = dict(variables, params=unpipeline_tower_layers(
                variables["params"]))
            cfg = dataclasses.replace(cfg, pipeline_stages=1,
                                      pipeline_microbatches=0,
                                      scan_layers=True)
        self.cfg = cfg
        self.mesh = mesh
        self.quantize = quantize
        if quantize:
            # weight-only int8 (d2r_tpu/quant.py): 4x fewer weight bytes per
            # request on the weight-HBM-bound small-batch path; dequant fuses
            # into the consuming dots inside the jitted forward. Composes
            # with mesh serving: the int8 codes inherit the dense kernel's
            # partition rule (parallel/mesh.py), scales replicate/follow.
            from d2r_tpu.quant import quantize_params
            variables = dict(variables,
                             params=quantize_params(variables["params"],
                                                    mode=quantize))
        if mesh is not None:
            # Multi-chip serving (BASELINE config 5: v5e-8 + serving path):
            # params take their training-time placements — TP rules fire on
            # a 'model' axis, everything else replicates — and request rows
            # shard over 'data'. The jitted forward is unchanged: GSPMD
            # partitions it from the input/param shardings alone.
            from d2r_tpu.parallel.mesh import make_param_shardings
            shardings = make_param_shardings(variables, mesh)
            variables = jax.tree_util.tree_map(jax.device_put, variables,
                                               shardings)
        self.variables = variables
        self.model = D2RClassifier(cfg)
        self.batch_buckets = sorted(batch_buckets)
        seq_buckets = sorted(seq_buckets or [cfg.max_seq])
        if len(seq_buckets) != 1:
            # The Router mean-pools over PADDED tokens (reference quirk,
            # docs/PARITY.md / models/router.py), so the same request padded
            # to different seq lengths yields different logits. Multiple seq
            # buckets would silently serve bucket-dependent predictions;
            # batch bucketing is the safe axis (rows are independent).
            raise ValueError(
                f"multiple seq_buckets {seq_buckets} are unsafe: the "
                "router's pad-pooling makes logits depend on the padded "
                "sequence length, so bucket choice would change predictions. "
                "Use exactly one seq bucket (default: cfg.max_seq).")
        # Single scalar, not a list: the one-seq-length invariant is
        # structural — re-enabling multi-seq bucketing requires revisiting
        # the pad-pooling quirk, not just relaxing the guard above.
        self.seq_len = seq_buckets[0]
        self._fns: Dict[Tuple[int, int], callable] = {}

    def _fn(self, b: int, l: int):
        key = (b, l)
        if key not in self._fns:
            model = self.model

            from d2r_tpu.quant import dequantize_params
            from d2r_tpu.train.state import _compute_cast
            compute_dtype = self.cfg.dtype

            @jax.jit
            def fwd(variables, input_ids, attention_mask, token_type_ids,
                    pixel_values):
                labels = jnp.zeros((input_ids.shape[0],), jnp.int32)
                params = dequantize_params(variables["params"], compute_dtype)
                variables = dict(
                    variables, params=_compute_cast(params, compute_dtype))
                _, logits, _ = model.apply(
                    variables, input_ids, attention_mask, token_type_ids,
                    labels, pixel_values,
                    deterministic=True, use_running_average=True)
                return jax.nn.softmax(logits, axis=-1)

            self._fns[key] = fwd
        return self._fns[key]

    def _bucket(self, buckets: List[int], n: int) -> int:
        i = bisect.bisect_left(buckets, n)
        return buckets[min(i, len(buckets) - 1)]

    def _place(self, x):
        """Stage one padded input array: sharded over the mesh's data axis
        when serving multi-chip (replicated if the bucket doesn't divide it),
        plain device transfer otherwise."""
        if self.mesh is None:
            return jnp.asarray(x)
        from d2r_tpu.parallel.mesh import batch_sharding, replicated
        n = self.mesh.shape.get("data", 1)
        ok = np.ndim(x) >= 1 and np.shape(x)[0] % n == 0
        return jax.device_put(
            x, batch_sharding(self.mesh) if ok else replicated(self.mesh))

    def predict(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        token_type_ids: np.ndarray,
        pixel_values: np.ndarray,
    ) -> Dict[str, np.ndarray]:
        """Pad to the nearest (batch, seq) bucket, run, strip padding.

        Requests larger than the biggest batch bucket are chunked across
        multiple bucket-sized calls; sequences longer than the biggest seq
        bucket are rejected (truncation would silently change predictions).
        """
        n, l = input_ids.shape
        if l > self.seq_len:
            raise ValueError(
                f"sequence length {l} exceeds the configured seq bucket "
                f"{self.seq_len}; tokenize/truncate to max_seq before "
                f"calling predict")
        max_b = self.batch_buckets[-1]
        if n > max_b:
            outs = [
                self.predict(input_ids[i:i + max_b],
                             attention_mask[i:i + max_b],
                             token_type_ids[i:i + max_b],
                             pixel_values[i:i + max_b])
                for i in range(0, n, max_b)
            ]
            return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        b = self._bucket(self.batch_buckets, n)
        lb = self.seq_len

        def pad(x, rows, cols=None):
            widths = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            if cols is not None:
                widths[1] = (0, cols - x.shape[1])
            return np.pad(x, widths)

        probs = self._fn(b, lb)(
            self.variables,
            self._place(pad(input_ids, b, lb)),
            self._place(pad(attention_mask, b, lb)),
            self._place(pad(token_type_ids, b, lb)),
            self._place(pad(pixel_values, b)),
        )
        probs = np.asarray(probs)[:n]
        return {"label": probs.argmax(-1), "probs": probs}

    def warmup(self, pixel_dtype=jnp.float32) -> None:
        """Compile every bucket ahead of serving.

        ``pixel_dtype`` must match the dtype requests will carry
        (jnp.uint8 for pixel_transfer='uint8' clients) — jit retraces per
        input dtype, so a mismatched warmup compiles the wrong program.
        """
        vc = self.cfg.vision_config()
        l = self.seq_len
        for b in self.batch_buckets:
            # _place, not jnp.asarray: jit specializes on input SHARDINGS
            # too, so a mesh-serving warmup must stage inputs exactly as
            # predict() will or it compiles the wrong programs.
            self._fn(b, l)(
                self.variables,
                self._place(np.zeros((b, l), np.int32)),
                self._place(np.ones((b, l), np.int32)),
                self._place(np.zeros((b, l), np.int32)),
                self._place(np.zeros((b, vc.num_channels, vc.image_size,
                                      vc.image_size), pixel_dtype)),
            )


def latency_stats(predictor: Predictor, batch: Dict[str, np.ndarray],
                  iters: int = 20, warmup: int = 3,
                  device_resident: bool = False) -> Dict[str, float]:
    """Steady-state request latency (seconds): mean / p50 / p95.

    ``device_resident=True`` pre-stages the (padded) inputs on device and
    times only the compiled forward + tiny probs download — the model-side
    latency. The default times the full request path including host->device
    input transfer (which on a tunnelled runtime is dominated by the link,
    not the chip).
    """
    times = []
    if device_resident:
        import jax
        import jax.numpy as jnp
        n, l = batch["input_ids"].shape
        b = predictor._bucket(predictor.batch_buckets, n)
        lb = predictor.seq_len
        fn = predictor._fn(b, lb)

        def pad(x, rows, cols=None):
            widths = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            if cols is not None:
                widths[1] = (0, cols - x.shape[1])
            return np.pad(x, widths)

        # _place, not a bare device_put: mesh serving stages inputs sharded
        # over the data axis, and the compiled fn specializes on shardings
        args = (predictor.variables,
                predictor._place(pad(batch["input_ids"], b, lb)),
                predictor._place(pad(batch["attention_mask"], b, lb)),
                predictor._place(pad(batch["token_type_ids"], b, lb)),
                predictor._place(pad(batch["pixel_values"], b)))
        for i in range(warmup + iters):
            t0 = time.perf_counter()
            probs = np.asarray(fn(*args))  # tiny (b, classes) download = sync
            dt = time.perf_counter() - t0
            if i >= warmup:
                times.append(dt)
    else:
        for i in range(warmup + iters):
            t0 = time.perf_counter()
            out = predictor.predict(
                batch["input_ids"], batch["attention_mask"],
                batch["token_type_ids"], batch["pixel_values"])
            _ = out["label"]  # forces host sync via np.asarray in predict
            dt = time.perf_counter() - t0
            if i >= warmup:
                times.append(dt)
    xs = sorted(times)
    return {
        "mean": sum(xs) / len(xs),
        "p50": xs[len(xs) // 2],
        "p95": xs[min(int(len(xs) * 0.95), len(xs) - 1)],
    }
