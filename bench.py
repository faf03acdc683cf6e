#!/usr/bin/env python
"""Benchmark: fine-tune throughput of the flagship D2R-base recipe on one chip.

Measures the full jitted training step (forward + backward + AdamW + BatchNorm
stats) for D2R-base — BERT-base + CLIP-ViT-B/32 towers, 6-cell routing,
DR_step=4, batch 64, max_seq 64: the reference's MVSA-Single reproduction
recipe (ref: run.sh:1-21) — in bfloat16.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Raw per-window timings go to stderr.

Measurement discipline (round-2 hardening; BENCH_r01.json was produced by a
silent clamp and is invalid):
  * >=3 measured windows of MEASURE_STEPS chained steps each; median reported.
  * the sync point is a real device->host transfer (float(loss)) because
    jax.block_until_ready returns early on this tunnelled runtime; the empty
    host roundtrip is measured separately (median of several) and subtracted.
  * a window that does not exceed the roundtrip RAISES — a measurement that
    fails its own sanity check must never be converted into a number.
  * a physical ceiling asserts the result is plausible: >20,000 samples/s/chip
    would require >2.7 PFLOP/s at ~135 GFLOP/sample — impossible on one v5e.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md
section 6). Baseline is an engineering estimate of the reference's
PyTorch-1.7.1 fp32 (no AMP, ref: modules/train.py:119-128) fine-tune
throughput on its published hardware (1x RTX 3090, ref: README.md:9):
~100 samples/sec. The full derivation (analytic FLOP count cross-checked
against XLA's cost analysis, GA102 roofline, eager-overhead discount, and
a BERT-fine-tune sanity anchor) lives in BASELINE.md "Baseline derivation".
BASELINE.json's target is >=10x this per chip.
"""

import json
import os
import statistics
import sys
import time

REF_3090_SAMPLES_PER_SEC = 100.0  # documented estimate, see module docstring

BATCH_SIZE = 64
MAX_SEQ = 64
MEASURE_STEPS = 30
NUM_WINDOWS = 5
ROUNDTRIP_PROBES = 5
# One v5e chip peaks at ~197 bf16 TFLOP/s (394 is the int8 number); the step
# costs ~106 GFLOP/sample (XLA cost analysis: 6.8 TFLOP / 64 samples), so
# even perfect MXU utilisation cannot exceed ~1,860 samples/s. 20,000 is a
# >10x margin over physics — anything above it is a broken measurement.
# Derivation: BASELINE.md "Baseline derivation" + docs/ROOFLINE.md.
CEILING_SAMPLES_PER_SEC = 20_000.0


def main() -> None:
    import threading

    import jax
    import numpy as np

    # Fail FAST if the TPU tunnel is unreachable: backend init then blocks
    # ~35 min inside the plugin before raising UNAVAILABLE, which under a
    # piped `timeout` looks like a silent empty run. Healthy device
    # discovery takes seconds; 300 s is a >10x margin.
    watchdog = threading.Timer(300.0, lambda: (
        print(json.dumps({"metric": "finetune_samples_per_sec_per_chip",
                          "error": "backend init exceeded 300s — TPU "
                                   "tunnel unreachable"}), flush=True),
        os._exit(3)))
    watchdog.daemon = True
    watchdog.start()

    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.state import create_train_state, make_multi_step

    import jax.numpy as jnp

    def jnp_stack(x, k):
        return jnp.broadcast_to(jnp.asarray(x)[None], (k,) + tuple(np.shape(x)))

    n_chips = max(len(jax.devices()), 1)
    watchdog.cancel()  # devices acquired; compiles may legitimately be slow

    cfg = D2RConfig(DR_step=4, max_seq=MAX_SEQ, batch_size=BATCH_SIZE,
                    compute_dtype="bfloat16", use_pallas=True)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()

    batch_np = synthetic_batch(BATCH_SIZE, MAX_SEQ, vc.image_size,
                               vocab_size=cfg.text_config().vocab_size, seed=0)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}

    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=1000)
    # dropout stream uses the config's PRNG impl (rbg on TPU — see
    # D2RConfig.prng_impl; the trainer does the same)
    rng = jax.random.key(1, impl=cfg.prng_impl)

    # MEASURE_STEPS chained steps inside ONE jitted lax.scan program: this is
    # the production input-prefetched training loop shape (train/state.py
    # make_multi_step, used by Trainer), and it amortises host dispatch
    # (which is expensive through the tunnelled runtime).
    multi_step = make_multi_step(model, MEASURE_STEPS)
    stacked = {k: jnp_stack(v, MEASURE_STEPS) for k, v in batch.items()}

    state, metrics = multi_step(state, stacked, rng)  # compile + warm
    _ = float(metrics["loss"])

    # Empty device->host roundtrip: fetching one scalar that is already
    # computed. Median of several probes.
    roundtrips = []
    for _ in range(ROUNDTRIP_PROBES):
        t0 = time.perf_counter()
        _ = float(metrics["losses"][0])
        roundtrips.append(time.perf_counter() - t0)
    roundtrip = statistics.median(roundtrips)

    windows = []
    last_loss = None
    for w in range(NUM_WINDOWS):
        t0 = time.perf_counter()
        state, metrics = multi_step(state, stacked, rng)
        last_loss = float(metrics["loss"])  # the sync point
        elapsed = time.perf_counter() - t0
        if elapsed <= roundtrip:
            raise RuntimeError(
                f"bench window {w}: elapsed {elapsed*1e3:.2f}ms <= measured "
                f"roundtrip {roundtrip*1e3:.2f}ms — the timed region did not "
                f"observably execute; refusing to report a fabricated number")
        windows.append(elapsed - roundtrip)
        print(f"window {w}: elapsed={elapsed*1e3:.2f}ms "
              f"roundtrip={roundtrip*1e3:.2f}ms net={windows[-1]*1e3:.2f}ms "
              f"loss={last_loss:.5f}", file=sys.stderr)
    if not np.isfinite(last_loss):
        raise RuntimeError(f"non-finite loss after measurement: {last_loss}")

    net = statistics.median(windows)
    samples_per_sec_per_chip = BATCH_SIZE * MEASURE_STEPS / net / n_chips
    if samples_per_sec_per_chip > CEILING_SAMPLES_PER_SEC:
        raise RuntimeError(
            f"implausible throughput {samples_per_sec_per_chip:.0f} samples/s/"
            f"chip (> physical ceiling {CEILING_SAMPLES_PER_SEC:.0f}) — "
            f"refusing to report")

    print(json.dumps({
        "metric": "finetune_samples_per_sec_per_chip",
        "value": round(samples_per_sec_per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec_per_chip / REF_3090_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
