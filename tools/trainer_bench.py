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
       python tools/trainer_bench.py --pipeline disk [--cache_items]

``--pipeline disk`` swaps the in-memory loader for the REAL pipeline —
fake JPEGs on disk, MSDDataset tokenise/decode/resize, threaded DataLoader —
so the number includes every host cost a real run pays; with
``--cache_items`` the second timed epoch serves entirely from the item
cache, measuring exactly what the cache buys on a host-bound pipeline.
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


DISK_BATCHES = 8  # disk mode writes real JPEGs: keep the dataset small


def _disk_loader(cfg, vc, cache_items: bool, workers: int):
    """REAL pipeline: fake JPEGs on disk -> MSDDataset -> DataLoader."""
    import tempfile

    from d2r_tpu.data.dataset import (DataLoader, MSDDataset, MSDProcessor,
                                      write_fake_dataset)

    root = tempfile.mkdtemp(prefix="d2r_trainer_bench_")
    n = DISK_BATCHES * BATCH
    paths = write_fake_dataset(root, n=n, image_size=vc.image_size)
    proc = MSDProcessor(paths, cfg.bert_name,
                        vocab_size=cfg.text_config().vocab_size)
    ds = MSDDataset(proc, paths["img_dir"], max_seq=SEQ, mode="train",
                    image_size=vc.image_size,
                    num_vision_tokens=vc.num_tokens,
                    pixel_transfer=cfg.pixel_transfer,
                    cache_items=cache_items)
    return DataLoader(ds, BATCH, shuffle=True, num_workers=workers, seed=0)


def run(pixel_transfer: str, pipeline: str = "synthetic",
        cache_items: bool = False, workers: int = 8) -> dict:
    import numpy as np

    import jax

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.trainer import Trainer

    num_batches = DISK_BATCHES if pipeline == "disk" else NUM_BATCHES
    cfg = D2RConfig(DR_step=4, max_seq=SEQ, batch_size=BATCH,
                    compute_dtype="bfloat16", use_pallas=True,
                    num_epochs=EPOCHS, eval_begin_epoch=10 ** 9,
                    pixel_transfer=pixel_transfer)
    vc = cfg.vision_config()
    if pipeline == "disk":
        loader = _disk_loader(cfg, vc, cache_items, workers)
        pixel_bytes = (3 * vc.image_size ** 2 * BATCH *
                       (1 if pixel_transfer == "uint8" else 4))
    else:
        base = synthetic_batch(BATCH, SEQ, vc.image_size,
                               vocab_size=cfg.text_config().vocab_size,
                               seed=0)
        if pixel_transfer == "uint8":
            rng = np.random.RandomState(0)
            base["pixel_values"] = rng.randint(
                0, 256, size=base["pixel_values"].shape).astype(np.uint8)
        # distinct objects per batch so np.stack does real work per epoch
        batches = [dict(base) for _ in range(num_batches)]
        loader = SyntheticLoader(batches)
        pixel_bytes = base["pixel_values"].nbytes

    model = D2RClassifier(cfg)
    logger = logging.getLogger("trainer_bench")
    trainer = Trainer(train_data=loader, model=model, cfg=cfg, logger=logger)

    # warm/compile pass (first dispatch compiles; excluded from timing by
    # running a full epoch first — in disk+cache mode it also populates the
    # item cache, exactly like epoch 1 of a real run)
    t0 = time.time()
    trainer.train()
    warm_s = time.time() - t0

    t0 = time.time()
    trainer.train()
    elapsed = time.time() - t0
    samples = num_batches * BATCH
    return {
        "pixel_transfer": pixel_transfer,
        "pipeline": pipeline,
        "cache_items": cache_items,
        "workers": workers,
        "trainer_samples_per_sec": round(samples / elapsed, 1),
        "elapsed_s": round(elapsed, 2),
        "warm_epoch_s": round(warm_s, 1),
        "batches": num_batches,
        "bytes_per_batch_mb": round(pixel_bytes / 1e6, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixel", default="both",
                    choices=["uint8", "float32", "both"])
    ap.add_argument("--pipeline", default="synthetic",
                    choices=["synthetic", "disk"])
    ap.add_argument("--cache_items", action="store_true",
                    help="disk mode: memoise items so the timed epoch is "
                         "all cache hits")
    ap.add_argument("--workers", type=int, default=8,
                    help="disk mode: DataLoader thread count")
    ap.add_argument("--out", default="/tmp/trainer_bench.jsonl")
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    modes = ["uint8", "float32"] if args.pixel == "both" else [args.pixel]
    if args.pipeline == "disk" and args.pixel == "both":
        modes = ["uint8"]  # disk A/B targets the cache lever, not pixels
    for mode in modes:
        try:
            result = run(mode, pipeline=args.pipeline,
                         cache_items=args.cache_items, workers=args.workers)
        except Exception as e:
            result = {"pixel_transfer": mode, "error": repr(e)[:500]}
        line = json.dumps(result)
        print(line, flush=True)
        with open(args.out, "a", encoding="utf-8") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
