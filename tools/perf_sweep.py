#!/usr/bin/env python
"""Sequential perf sweep over step-level knobs on the real TPU.

Measures the flagship multi-step program (same methodology as bench.py:
median of >=3 windows, device->host sync, roundtrip subtracted) for a list
of config variants, appending one JSON line per variant to --out. Used to
pick the shipping defaults; bench.py stays the single-config official
artifact.
"""

import argparse
import json
import statistics
import sys
import time

BATCH_SIZE = 64
MAX_SEQ = 64
MEASURE_STEPS = 30
NUM_WINDOWS = 3

VARIANTS = {
    "baseline": {},
    "remat": {"remat": True},
    "mu_bf16": {"adam_mu_dtype": "bfloat16"},
    "fused_opt": {"optimizer_impl": "fused"},
    "remat+mu_bf16": {"remat": True, "adam_mu_dtype": "bfloat16"},
    # the shipped default is prng_impl='rbg' (measured 818 vs 705 on v5e);
    # 'threefry' measures the sharding-stable alternative.
    "threefry": {"prng_impl": "threefry2x32"},
    "fused_leaf": {"optimizer_impl": "fused_leaf"},
    "no_pallas": {"use_pallas": False},
    "remat_ffn_act": {"remat_ffn_act": True},
    # measured 706.5 vs 821.8 baseline on v5e — the small-L fused kernel
    # loses at D2R shapes (see ops/attention.py); kept for re-evaluation on
    # newer Mosaic toolchains.
    "small_kernel": {"_small_kernel": True},
    # compile-time feature: towers as one nn.scan over stacked params
    # (~12x smaller HLO); compile_or_warm_s is the headline number here
    "scan_layers": {"scan_layers": True},
    # max-throughput configs (informational): the recipe pins bsz 64, but
    # larger batches amortise the fixed per-step weight/optimizer HBM
    # traffic; samples_per_sec is still per chip
    "bsz128": {"_batch_size": 128, "_uint8_pixels": True},
    "bsz256": {"_batch_size": 256, "_uint8_pixels": True},
    "no_dropout_probe": {"_deterministic_probe": True},
    # round-3 levers (VERDICT next-round item 2)
    # (a) pad the ragged 50-token vision attention dims to 64 inside the
    # einsum path — exact math (tests/test_ops.py), pure tiling question
    "pad_ragged": {"_pad_ragged": True},
    # (b) the 64->128 batch sweep bracketed but never probed the interior
    "bsz96": {"_batch_size": 96, "_uint8_pixels": True},
    # (d) BASELINE config 3: the padded-seqlen-128 recipe point
    "seq128": {"_max_seq": 128, "_uint8_pixels": True},
    # gradient accumulation (train/state.py make_accum_step): one optimizer
    # step per K microbatches — measures the throughput cost of the scan'd
    # grad-sum vs K independent optimizer steps (the 'baseline' program)
    "grad_accum4": {"_grad_accum": 4, "_uint8_pixels": True},
    # int8 quantized training (ops/qdot.py): projection dots on the int8
    # MXU path (~2x bf16 peak on v5e) — the one dot-time lever the bf16
    # toolchain can't reach (docs/ROOFLINE.md). Measured 651.3 (int8) /
    # 678.3 (int8_all) vs 825.8 baseline: the dynamic-quantization overhead
    # exceeds the MXU savings at D2R shapes — REJECTED for the recipe, kept
    # opt-in for larger geometries (docs/BENCHMARKS.md). NOT recipe-parity
    # numerics; error bounds in tests/test_qdot.py.
    "int8_train": {"quant_train": "int8"},
    "int8_all_train": {"quant_train": "int8_all"},
    # BASELINE config 2: SenticNet graph refinement enabled — the optional
    # GCN over the affective adjacency (models/graph.py, --use_sentic_graph)
    # adds a (B,L,L) host-built input + one batched matmul-sized layer; this
    # measures its step cost vs the flagship recipe (adjacency values are
    # synthetic; the graph math is what costs, not the lexicon lookups,
    # which live host-side in the loader).
    "sentic": {"use_sentic_graph": True, "_sentic_adj": True,
               "_uint8_pixels": True},
    # BASELINE config 4 measured: RoBERTa-large + ViT-L/14 geometry through
    # the same fabric (random init — a THROUGHPUT artifact; accuracy parity
    # for scaled towers is the converter's job). 925.7M params -> 3.45 GB
    # fp32 + 6.9 GB AdamW moments, so bsz 16 + remat on the 16 GB v5e
    # (48 tower layers x 321 tokens of unremat'd bf16 activations would
    # flirt with the HBM limit); ViT-L/14 = 257 vision tokens, so the
    # Pallas flash kernel fires on the vision branch (kv >= 256).
    # scan_layers keeps the 24-layer HLO small enough to compile through
    # the tunnel; uint8 pixels keep the stacked input buffers sane.
    # adam_mu_dtype=bfloat16 is part of the scaled recipe: fp32 moments OOM
    # the chip by 633 MB (measured: 16.37 G of 15.75 G — arguments 11.28 G
    # dominated by the two fp32 moment trees).
    "scaled_large": {
        "bert_name": "roberta-large", "vit_name": "clip-vit-large-patch14",
        "embed_size": 1024, "num_head_IMRC": 16, "hid_IMRC": 1024,
        "scan_layers": True, "remat": True, "adam_mu_dtype": "bfloat16",
        "_batch_size": 16, "_uint8_pixels": True},
}


def measure(overrides):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.state import (_model_inputs, create_train_state,
                                     make_multi_step)

    # Module-global knobs: force a known state for EVERY variant so a
    # 'small_kernel'/'pad_ragged' run earlier in the sweep can't leak into
    # later A/Bs (main() runs variants sequentially in one process).
    from d2r_tpu.ops import attention
    attention.SMALL_KERNEL_OPT_IN = False
    attention.PAD_RAGGED_SEQ = False

    overrides = dict(overrides)
    det_probe = overrides.pop("_deterministic_probe", False)
    accum_k = overrides.pop("_grad_accum", 0)
    batch_size = overrides.pop("_batch_size", BATCH_SIZE)
    max_seq = overrides.pop("_max_seq", MAX_SEQ)
    uint8_pixels = overrides.pop("_uint8_pixels", False)
    sentic_adj = overrides.pop("_sentic_adj", False)
    if overrides.pop("_small_kernel", False):
        attention.SMALL_KERNEL_OPT_IN = True
    if overrides.pop("_pad_ragged", False):
        attention.PAD_RAGGED_SEQ = True

    kwargs = dict(DR_step=4, max_seq=max_seq, batch_size=BATCH_SIZE,
                  compute_dtype="bfloat16", use_pallas=True)
    kwargs.update(overrides)
    kwargs["batch_size"] = batch_size
    cfg = D2RConfig(**kwargs)
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch_np = synthetic_batch(batch_size, max_seq, vc.image_size,
                               vocab_size=cfg.text_config().vocab_size, seed=0)
    if uint8_pixels:
        # production pixel_transfer='uint8' shape: raw pixels, device-side
        # normalisation — 4x smaller stacked input buffers for big batches
        batch_np["pixel_values"] = np.random.RandomState(0).randint(
            0, 256, size=batch_np["pixel_values"].shape).astype(np.uint8)
    if sentic_adj:
        # what the loader ships when --use_sentic_graph is on: a dense
        # (B, L, L) affective adjacency (values are irrelevant to step cost)
        batch_np["sentic_adj"] = np.random.RandomState(1).uniform(
            0.0, 2.0, size=(batch_size, max_seq, max_seq)).astype(np.float32)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    state = create_train_state(model, cfg, None, jax.random.key(0), batch,
                               total_steps=1000)

    rng = jax.random.key(1, impl=cfg.prng_impl)

    if det_probe:
        # Diagnostic ONLY: the same K-step scan with dropout disabled
        # (deterministic=True) — bounds the total cost of dropout masks+RNG.
        def det_step(state, batch, rng):
            def loss_fn(params):
                (loss, logits, aux), mutated = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    **_model_inputs(batch), deterministic=True,
                    use_running_average=False, mutable=["batch_stats"])
                return loss, (logits, aux, mutated)
            (loss, (_, _, mutated)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(
                grads=grads, batch_stats=mutated["batch_stats"])
            return state, loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi_step(state, stacked, rng):
            def body(carry, b):
                return det_step(carry, b, rng)
            state, losses = jax.lax.scan(body, state, stacked,
                                         length=MEASURE_STEPS)
            return state, {"loss": losses[-1], "losses": losses}
    elif accum_k:
        # K-microbatch accumulation program, called CALLS times per window
        # (async dispatch chains the donated state on device; one sync at
        # the window end) — per-sample cost comparable to the multi-step
        # scan at CALLS*K ~= MEASURE_STEPS microbatches/window.
        from d2r_tpu.train.state import make_accum_step
        accum = make_accum_step(model, accum_k)
        calls = max(1, MEASURE_STEPS // accum_k)

        def multi_step(state, stacked, rng, _accum=accum, _calls=calls):
            for _ in range(_calls):
                state, m = _accum(state, stacked, rng)
            return state, {"loss": m["loss"],
                           "losses": jnp.reshape(m["loss"], (1,))}
    else:
        multi_step = make_multi_step(model, MEASURE_STEPS)
    scan_len = accum_k if accum_k else MEASURE_STEPS
    micro_per_window = (calls * accum_k) if accum_k else MEASURE_STEPS
    stacked = {k: jnp.broadcast_to(jnp.asarray(v)[None],
                                   (scan_len,) + np.shape(v))
               for k, v in batch.items()}
    t0 = time.perf_counter()
    state, metrics = multi_step(state, stacked, rng)
    _ = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(metrics["losses"][0])
        rts.append(time.perf_counter() - t0)
    roundtrip = statistics.median(rts)

    del batch_np
    nets = []
    loss = None
    for _ in range(NUM_WINDOWS):
        t0 = time.perf_counter()
        state, metrics = multi_step(state, stacked, rng)
        loss = float(metrics["loss"])
        el = time.perf_counter() - t0
        if el <= roundtrip:
            raise RuntimeError("window <= roundtrip")
        nets.append(el - roundtrip)
    net = statistics.median(nets)
    assert np.isfinite(loss), loss
    return {
        "samples_per_sec": round(batch_size * micro_per_window / net, 1),
        "step_ms": round(net / micro_per_window * 1e3, 2),
        "roundtrip_ms": round(roundtrip * 1e3, 2),
        "compile_or_warm_s": round(compile_s, 1),
        "loss": round(loss, 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default="/tmp/perf_sweep.jsonl")
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    for name in args.variants.split(","):
        overrides = VARIANTS[name]
        print(f"=== {name}: {overrides}", file=sys.stderr, flush=True)
        try:
            result = {"variant": name, **measure(overrides)}
        except Exception as e:  # keep sweeping; record the failure
            result = {"variant": name, "error": repr(e)}
        line = json.dumps(result)
        print(line, flush=True)
        with open(args.out, "a", encoding="utf-8") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
