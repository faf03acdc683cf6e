#!/usr/bin/env python
"""Serving latency benchmark: p50/p95 end-to-end request latency on TPU.

BASELINE.json names "p50 inference latency" as a headline metric; this tool
measures it for the flagship model across batch buckets. (bench.py remains
the single-line training-throughput benchmark the driver consumes.)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--max_seq", default=64, type=int)
    ap.add_argument("--iters", default=20, type=int)
    ap.add_argument("--out", default="SERVE_BENCH.json",
                    help="driver-capturable JSON artifact path ('' disables)")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="weight-only int8 serving (d2r_tpu/quant.py)")
    ap.add_argument("--pixel", default="uint8",
                    choices=["uint8", "float32"],
                    help="client pixel format; uint8 = 4x fewer request "
                         "bytes, normalised on device (pixel_transfer mode)")
    ap.add_argument("--device", default=None, choices=["cpu"],
                    help="force the CPU backend (virtual-mesh records); "
                         "default: the environment's backend (axon TPU "
                         "under the tunnel)")
    ap.add_argument("--mesh_data", default=0, type=int,
                    help="serve over an N-device data mesh (0 = no mesh)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-test geometry (fp32, no pallas) — for "
                         "virtual-mesh latency records on CPU, not perf")
    args = ap.parse_args()

    if args.device == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if args.mesh_data > 1 and "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{args.mesh_data}").strip()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from d2r_tpu.config import D2RConfig, tiny_test_config
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.serve import Predictor, latency_stats
    from d2r_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    buckets = tuple(int(b) for b in args.batches.split(","))

    if args.tiny:
        cfg = tiny_test_config(max_seq=args.max_seq)
    else:
        cfg = D2RConfig(DR_step=4, max_seq=args.max_seq,
                        compute_dtype="bfloat16", use_pallas=True)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    init_batch = synthetic_batch(buckets[0], args.max_seq, vc.image_size,
                                 vocab_size=cfg.text_config().vocab_size, seed=0)
    import jax.numpy as jnp
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.asarray(init_batch["input_ids"]),
        jnp.asarray(init_batch["attention_mask"]),
        jnp.asarray(init_batch["token_type_ids"]),
        jnp.asarray(init_batch["labels"]),
        jnp.asarray(init_batch["pixel_values"]))

    mesh = None
    if args.mesh_data > 1:
        from d2r_tpu.parallel.mesh import make_mesh
        mesh = make_mesh((args.mesh_data,), ("data",))
    pred = Predictor(cfg, variables, batch_buckets=buckets,
                     seq_buckets=(args.max_seq,), quantize=args.quantize,
                     mesh=mesh)
    # warmup must stage the dtype the measured requests will carry — a
    # float32 warmup before uint8 requests compiles every bucket twice
    pred.warmup(pixel_dtype=jnp.uint8 if args.pixel == "uint8"
                else jnp.float32)

    results = {}
    for b in buckets:
        batch = synthetic_batch(b, args.max_seq, vc.image_size,
                                vocab_size=cfg.text_config().vocab_size, seed=b)
        if args.pixel == "uint8":
            rng = np.random.RandomState(b)
            batch["pixel_values"] = rng.randint(
                0, 256, size=batch["pixel_values"].shape).astype(np.uint8)
        full = latency_stats(pred, batch, iters=args.iters)
        model = latency_stats(pred, batch, iters=args.iters,
                              device_resident=True)
        results[f"batch_{b}"] = {
            "e2e_ms": {k: round(v * 1e3, 2) for k, v in full.items()},
            "model_ms": {k: round(v * 1e3, 2) for k, v in model.items()},
        }
        print(f"batch {b:>3}: e2e p50 {full['p50']*1e3:8.2f} ms | "
              f"model p50 {model['p50']*1e3:8.2f} ms  p95 {model['p95']*1e3:8.2f} ms "
              f"({b/model['p50']:8.1f} samples/s model-side)")
    payload = {
        "metric": "inference_latency_ms",
        "value": results,
        "p50_batch1_model_ms": results.get("batch_1", {}).get(
            "model_ms", {}).get("p50"),
        "iters": args.iters,
        "max_seq": args.max_seq,
        "pixel": args.pixel,
        "quantize": args.quantize,
        "mesh_data": args.mesh_data or None,
        "tiny": args.tiny,
        "backend": jax.default_backend(),
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
