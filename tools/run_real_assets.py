#!/usr/bin/env python
"""Real-asset accuracy-parity harness: one command from assets to weighted F1.

The accuracy north star (BASELINE.md: reference-parity weighted F1 on
MVSA-Single / MVSA-Multiple) needs real assets that cannot ship in this repo:

    <assets_dir>/vocab.txt      bert-base-uncased WordPiece vocab
                                (RoBERTa towers instead: vocab.json +
                                merges.txt, byte-level BPE)
    <assets_dir>/bert.pt        torch.save(BertModel.from_pretrained(n).state_dict())
                                (or RobertaModel.state_dict() — the
                                converter is key-compatible; pair with a
                                position_style='roberta' text preset)
    <assets_dir>/clip_vit.pt    torch.save(CLIPModel.from_pretrained(n)
                                           .vision_model.state_dict())
    <data_dir>/train.json dev.json test.json   MVSA split files
                                  [{"id", "text", "emotion_label"}, ...]
    <img_dir>/<id>.jpg            tweet images (+ optional inf.png fallback)

Given those, this runs the full reference recipe (ref: run.sh:1-21 —
20 epochs, lr 1e-5, warmup 0.2, seed 2023, bsz 64, seq 64, w_js 0.9/0.3,
DR_step 4) through the production converter (utils/weights.py) and trainer,
and prints one JSON line with dev-best + test weighted F1.

Accuracy mode is STRICT: a missing vocab.txt raises instead of silently
degrading to the hash tokenizer (round-1 VERDICT item 6).

Usage:
    python tools/run_real_assets.py --assets_dir /data/assets \\
        --data_dir /data/mvsa_single/10-fold-1 --img_dir /data/mvsa_single/imgs
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--assets_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--img_dir", required=True)
    p.add_argument("--save_path", default="./output")
    p.add_argument("--num_epochs", default=20, type=int)
    p.add_argument("--lr", default=1e-5, type=float)
    p.add_argument("--warmup_ratio", default=0.2, type=float)
    p.add_argument("--seed", default=2023, type=int)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--max_seq", default=64, type=int)
    p.add_argument("--num_classes", default=3, type=int)
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    # Geometry / loop-shape overrides (recipe defaults). A CI smoke run uses
    # the registered tiny presets to execute this exact path end-to-end with
    # fabricated assets (tests/test_real_assets_harness.py).
    p.add_argument("--bert_name", default="bert-base-uncased")
    p.add_argument("--vit_name", default="clip-vit-base-patch32")
    p.add_argument("--embed_size", default=768, type=int)
    p.add_argument("--num_head_IMRC", default=16, type=int)
    p.add_argument("--hid_IMRC", default=768, type=int)
    p.add_argument("--hid_router", default=768, type=int)
    p.add_argument("--DR_step", default=4, type=int)
    p.add_argument("--steps_per_dispatch", default=16, type=int)
    p.add_argument("--eval_begin_epoch", default=1, type=int)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from d2r_tpu.config import D2RConfig
    from d2r_tpu.data.dataset import DataLoader, MSDDataset, MSDProcessor
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.trainer import Trainer
    from d2r_tpu.utils.weights import load_pretrained_params
    from d2r_tpu.train.state import create_train_state

    for fname in ("bert.pt", "clip_vit.pt"):
        path = os.path.join(args.assets_dir, fname)
        if not os.path.exists(path):
            raise FileNotFoundError(f"required asset missing: {path}")
    has_wordpiece = os.path.exists(os.path.join(args.assets_dir, "vocab.txt"))
    has_bpe = all(os.path.exists(os.path.join(args.assets_dir, f))
                  for f in ("vocab.json", "merges.txt"))
    if not (has_wordpiece or has_bpe):
        raise FileNotFoundError(
            f"no tokenizer assets in {args.assets_dir}: need vocab.txt "
            "(WordPiece, BERT towers) or vocab.json+merges.txt (byte-level "
            "BPE, RoBERTa towers)")

    cfg = D2RConfig(
        # the reference recipe (ref: run.sh:1-21)
        num_epochs=args.num_epochs, lr=args.lr, warmup_ratio=args.warmup_ratio,
        seed=args.seed, batch_size=args.batch_size, max_seq=args.max_seq,
        weight_js_1=0.9, weight_js_2=0.3, DR_step=args.DR_step,
        num_classes=args.num_classes,
        save_path=args.save_path,
        bert_name=args.bert_name, vit_name=args.vit_name,
        embed_size=args.embed_size, num_head_IMRC=args.num_head_IMRC,
        hid_IMRC=args.hid_IMRC, hid_router=args.hid_router,
        steps_per_dispatch=args.steps_per_dispatch,
        eval_begin_epoch=args.eval_begin_epoch,
        compute_dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
        use_pallas=jax.default_backend() == "tpu",
    )
    vc, tc = cfg.vision_config(), cfg.text_config()

    paths = {m: os.path.join(args.data_dir, f"{m}.json")
             for m in ("train", "dev", "test")}
    processor = MSDProcessor(paths, args.assets_dir,
                             vocab_size=tc.vocab_size,
                             allow_hash_fallback=False)  # STRICT

    def mk(mode):
        return MSDDataset(processor, args.img_dir, max_seq=cfg.max_seq,
                          mode=mode, image_size=vc.image_size,
                          num_vision_tokens=vc.num_tokens,
                          pixel_transfer=cfg.pixel_transfer)

    loaders = {
        mode: DataLoader(mk(mode), batch_size=cfg.batch_size,
                         shuffle=(mode == "train"), seed=cfg.seed)
        for mode in ("train", "dev", "test")
    }

    model = D2RClassifier(cfg)
    trainer = Trainer(train_data=loaders["train"], dev_data=loaders["dev"],
                      test_data=loaders["test"], model=model, cfg=cfg)

    # production converter path (utils/weights.py — the substring-surgery
    # replacement, ref: modules/train.py:92-111)
    sample = next(iter(loaders["train"]))
    state = create_train_state(model, cfg, None, jax.random.key(cfg.seed),
                               sample, total_steps=trainer.train_num_steps)
    params = load_pretrained_params(args.assets_dir, cfg, state.params)
    trainer.state = state.replace(params=jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(x), params))

    result = trainer.train()
    print(json.dumps({
        "metric": "test_weighted_f1",
        "value": result.get("f_score"),
        "dev_best_f1": trainer.best_dev_metric,
        "dev_best_epoch": trainer.best_dev_epoch,
        "test_accuracy": result.get("eval_accuracy"),
        "recipe": "MVSA reproduction (ref run.sh:1-21)",
    }))


if __name__ == "__main__":
    main()
