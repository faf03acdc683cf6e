#!/usr/bin/env python
"""E2E trainer-path throughput on the real TPU (VERDICT round-1 item 2).

bench.py measures the bare multi-step device program with batches already on
device; this tool drives the PRODUCTION ``Trainer.train`` loop — host-side
batch stacking, host->device transfer through the tunnel, K-step dispatch,
windowed loss fetch — over an in-memory synthetic dataset, so the number
includes everything a real run pays except disk/JPEG decode.

Also the A/B harness for the pixel_transfer lever: uint8 ships 9.5 MB/batch
where float32 ships 38 MB/batch, and on this tunnelled runtime the
host->device link is the dominant e2e cost.

Usage: python tools/trainer_bench.py [--pixel uint8|float32|both]
"""

import argparse
import json
import logging
import sys
import time

BATCH = 64
SEQ = 64
NUM_BATCHES = 48          # 3 dispatches of 16
EPOCHS = 1


class SyntheticLoader:
    """Iterable of pre-built numpy batch dicts (len() = batches/epoch)."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def run(pixel_transfer: str) -> dict:
    import numpy as np

    import jax

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.trainer import Trainer

    cfg = D2RConfig(DR_step=4, max_seq=SEQ, batch_size=BATCH,
                    compute_dtype="bfloat16", use_pallas=True,
                    num_epochs=EPOCHS, eval_begin_epoch=10 ** 9,
                    pixel_transfer=pixel_transfer)
    vc = cfg.vision_config()
    base = synthetic_batch(BATCH, SEQ, vc.image_size,
                           vocab_size=cfg.text_config().vocab_size, seed=0)
    if pixel_transfer == "uint8":
        rng = np.random.RandomState(0)
        base["pixel_values"] = rng.randint(
            0, 256, size=base["pixel_values"].shape).astype(np.uint8)
    # distinct objects per batch so np.stack does real work like a real epoch
    batches = [dict(base) for _ in range(NUM_BATCHES)]

    model = D2RClassifier(cfg)
    logger = logging.getLogger("trainer_bench")
    trainer = Trainer(train_data=SyntheticLoader(batches), model=model,
                      cfg=cfg, logger=logger)

    # warm/compile pass (first dispatch compiles; excluded from timing by
    # running a full epoch first)
    t0 = time.time()
    trainer.train()
    warm_s = time.time() - t0

    t0 = time.time()
    trainer.train()
    elapsed = time.time() - t0
    samples = NUM_BATCHES * BATCH
    return {
        "pixel_transfer": pixel_transfer,
        "trainer_samples_per_sec": round(samples / elapsed, 1),
        "elapsed_s": round(elapsed, 2),
        "warm_epoch_s": round(warm_s, 1),
        "batches": NUM_BATCHES,
        "bytes_per_batch_mb": round(
            batches[0]["pixel_values"].nbytes / 1e6, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixel", default="both",
                    choices=["uint8", "float32", "both"])
    ap.add_argument("--out", default="/tmp/trainer_bench.jsonl")
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    modes = ["uint8", "float32"] if args.pixel == "both" else [args.pixel]
    for mode in modes:
        try:
            result = run(mode)
        except Exception as e:
            result = {"pixel_transfer": mode, "error": repr(e)[:500]}
        line = json.dumps(result)
        print(line, flush=True)
        with open(args.out, "a", encoding="utf-8") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
