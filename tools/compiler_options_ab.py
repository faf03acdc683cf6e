#!/usr/bin/env python
"""A/B XLA compiler options on the flagship multi-step program (real TPU).

The env-var route (XLA_FLAGS) can't carry TPU-backend flags through the
tunnelled PJRT plugin, but AOT compile options can:
``jit(f).lower(...).compile(compiler_options={...})`` serializes the
overrides into the compile request, so they reach the remote compiler.
Same timing discipline as bench.py (device->host sync, roundtrip
subtracted, median window).

Usage:
    python tools/compiler_options_ab.py                      # default set
    python tools/compiler_options_ab.py --options k=v,k2=v2  # one custom set
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_SIZE = 64
MAX_SEQ = 64
MEASURE_STEPS = 30
NUM_WINDOWS = 3

# Candidate sets. Values must be strings; unknown options raise at compile
# time (recorded as an error line, not a crash of the whole A/B).
OPTION_SETS = {
    "none": {},
    # give the fusion scheduler more scoped VMEM to work with (v5e has
    # 128 MiB VMEM; the conservative default limits fusion depth)
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # latency-hiding scheduler aggressiveness
    "lhs_enable": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    # allow larger fusions / looser memory-bound estimates
    "slop": {"xla_tpu_memory_limit_slop_factor": "98"},
}


def measure(opts):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.state import create_train_state, make_multi_step

    cfg = D2RConfig(DR_step=4, max_seq=MAX_SEQ, batch_size=BATCH_SIZE,
                    compute_dtype="bfloat16", use_pallas=True)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch_np = synthetic_batch(BATCH_SIZE, MAX_SEQ, vc.image_size,
                               vocab_size=cfg.text_config().vocab_size, seed=0)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=1000)
    rng = jax.random.key(1, impl=cfg.prng_impl)
    stacked = {k: jnp.broadcast_to(jnp.asarray(v)[None],
                                   (MEASURE_STEPS,) + np.shape(v))
               for k, v in batch.items()}

    t0 = time.perf_counter()
    lowered = make_multi_step(model, MEASURE_STEPS).lower(state, stacked, rng)
    compiled = lowered.compile(compiler_options=opts or None)
    compile_s = time.perf_counter() - t0

    state, metrics = compiled(state, stacked, rng)
    _ = float(metrics["loss"])  # warm + sync

    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(metrics["losses"][0])
        rts.append(time.perf_counter() - t0)
    roundtrip = statistics.median(rts)

    nets = []
    loss = None
    for _ in range(NUM_WINDOWS):
        t0 = time.perf_counter()
        state, metrics = compiled(state, stacked, rng)
        loss = float(metrics["loss"])
        el = time.perf_counter() - t0
        if el <= roundtrip:
            raise RuntimeError("window <= roundtrip")
        nets.append(el - roundtrip)
    net = statistics.median(nets)
    assert np.isfinite(loss), loss
    return {
        "samples_per_sec": round(BATCH_SIZE * MEASURE_STEPS / net, 1),
        "step_ms": round(net / MEASURE_STEPS * 1e3, 2),
        "roundtrip_ms": round(roundtrip * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "loss": round(loss, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", default=",".join(OPTION_SETS))
    ap.add_argument("--options", default=None,
                    help="one custom k=v,k2=v2 set instead of --sets")
    ap.add_argument("--out", default="/tmp/compiler_options_ab.jsonl")
    args = ap.parse_args()

    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.options:
        sets = {"custom": dict(kv.split("=", 1)
                               for kv in args.options.split(","))}
    else:
        names = [n for n in args.sets.split(",") if n]
        unknown = [n for n in names if n not in OPTION_SETS]
        if unknown:  # fail before any multi-minute compile, with the menu
            ap.error(f"unknown option set(s) {unknown}; "
                     f"known: {sorted(OPTION_SETS)}")
        sets = {name: OPTION_SETS[name] for name in names}

    for name, opts in sets.items():
        print(f"=== {name}: {opts}", file=sys.stderr, flush=True)
        try:
            result = {"set": name, "options": opts, **measure(opts)}
        except Exception as e:
            result = {"set": name, "options": opts, "error": repr(e)[:500]}
        line = json.dumps(result)
        print(line, flush=True)
        with open(args.out, "a", encoding="utf-8") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
