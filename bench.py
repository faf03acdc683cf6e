#!/usr/bin/env python
"""Benchmark: fine-tune throughput of the flagship D2R-base recipe on one chip.

Measures the full jitted training step (forward + backward + AdamW + BatchNorm
stats) for D2R-base — BERT-base + CLIP-ViT-B/32 towers, 6-cell routing,
DR_step=4, batch 64, max_seq 64: the reference's MVSA-Single reproduction
recipe (ref: run.sh:1-21) — in bfloat16 with Pallas fused attention.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md
section 6). Baseline is therefore an engineering estimate of the reference's
PyTorch-1.7.1 fp32 (no AMP, ref: modules/train.py:119-128) fine-tune
throughput on its published hardware (1x RTX 3090, ref: README.md:9):
~135 GFLOP/sample train cost at these shapes against ~13 effective TFLOP/s
for eager fp32 torch on GA102 -> ~100 samples/sec. BASELINE.json's target is
>=10x this per chip.
"""

import json
import time

REF_3090_SAMPLES_PER_SEC = 100.0  # documented estimate, see module docstring

BATCH_SIZE = 64
MAX_SEQ = 64
WARMUP_STEPS = 3
MEASURE_STEPS = 30


def main() -> None:
    import jax
    import numpy as np

    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.state import (
        create_train_state, make_multi_step, make_train_step)

    import jax.numpy as jnp

    def jnp_stack(x, k):
        return jnp.broadcast_to(jnp.asarray(x)[None], (k,) + tuple(np.shape(x)))

    n_chips = max(len(jax.devices()), 1)

    cfg = D2RConfig(DR_step=4, max_seq=MAX_SEQ, batch_size=BATCH_SIZE,
                    compute_dtype="bfloat16", use_pallas=True)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()

    batch_np = synthetic_batch(BATCH_SIZE, MAX_SEQ, vc.image_size,
                               vocab_size=cfg.text_config().vocab_size, seed=0)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}

    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=1000)
    rng = jax.random.key(1)

    # MEASURE_STEPS chained steps inside ONE jitted lax.scan program: this is
    # the production input-prefetched training loop shape, and it amortises
    # host dispatch (which is expensive through the tunnelled runtime).
    multi_step = make_multi_step(model, MEASURE_STEPS)
    stacked = {k: jnp_stack(v, MEASURE_STEPS) for k, v in batch.items()}

    # NOTE on timing: block_until_ready can return before device execution
    # finishes on this stack, so the sync point is a real device->host
    # transfer (float(loss)); the measured empty roundtrip is subtracted.
    state, metrics = multi_step(state, stacked, rng)  # compile + warm
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    state, metrics = multi_step(state, stacked, rng)
    last_loss = float(metrics["loss"])
    elapsed = time.perf_counter() - t0

    t0 = time.perf_counter()
    _ = float(metrics["losses"][0])
    roundtrip = time.perf_counter() - t0
    elapsed = max(elapsed - roundtrip, 1e-9)

    samples_per_sec_per_chip = BATCH_SIZE * MEASURE_STEPS / elapsed / n_chips
    assert np.isfinite(last_loss)

    print(json.dumps({
        "metric": "finetune_samples_per_sec_per_chip",
        "value": round(samples_per_sec_per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec_per_chip / REF_3090_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
