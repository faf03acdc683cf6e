#!/usr/bin/env python
"""Capture a device trace of the flagship train step and print the top ops.

Writes an xplane trace via jax.profiler and post-processes it with the
tensorboard profile plugin into a framework-op table, printed as text.
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(trace_dir: str, steps: int = 3):
    import jax

    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.state import create_train_state, make_train_step

    B, L = 64, 64
    cfg = D2RConfig(DR_step=4, max_seq=L, batch_size=B,
                    compute_dtype="bfloat16", use_pallas=True)
    vc = cfg.vision_config()
    model = D2RClassifier(cfg)
    batch = {k: jax.device_put(v) for k, v in synthetic_batch(
        B, L, vc.image_size, vocab_size=cfg.text_config().vocab_size,
        seed=0).items()}
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=1000)
    train_step = make_train_step(model)
    rng = jax.random.key(1)

    # warmup/compile
    for _ in range(2):
        state, m = train_step(state, batch, rng)
    float(m["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, m = train_step(state, batch, rng)
        float(m["loss"])
    print("trace captured:", trace_dir)


def summarize(trace_dir: str, top: int = 30):
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb"))
    if not xplanes:
        print("no xplane found under", trace_dir)
        return
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    try:
        rows = json.loads(data)
    except Exception:
        out = os.path.join(trace_dir, "op_stats.raw")
        with open(out, "w") as f:
            f.write(data)
        print("wrote raw tool data to", out)
        print(data[:4000])
        return
    print(json.dumps(rows, indent=1)[:8000])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/d2r_trace")
    ap.add_argument("--summarize_only", action="store_true")
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.dir)
    summarize(args.dir)
