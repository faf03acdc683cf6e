"""Command-line experiment driver (L4, mirrors ref: run.py:38-158).

Flag names, defaults, and dataset-path conventions match the reference
argparse surface one-to-one so existing run.sh sweeps port directly; extra
TPU-native flags are grouped at the end and all have safe defaults.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Dict

from d2r_tpu.config import D2RConfig

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s -   %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger(__name__)


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # --- reference flags (ref: run.py:40-82) ---
    p.add_argument("--bert_name", default="bert-base-uncased", type=str)
    p.add_argument("--vit_name", default="clip-vit-base-patch32", type=str)
    p.add_argument("--num_epochs", default=30, type=int)
    p.add_argument("--device", default="tpu", type=str)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--lr", default=3e-5, type=float)
    p.add_argument("--warmup_ratio", default=0.01, type=float)
    p.add_argument("--eval_begin_epoch", default=1, type=int)
    p.add_argument("--seed", default=2023, type=int)
    p.add_argument("--load_path", default=None, type=str)
    p.add_argument("--save_path", default="./output/", type=str)
    p.add_argument("--write_path", default=None, type=str)
    p.add_argument("--notes", default="", type=str)
    p.add_argument("--do_train", action="store_true", default=True)
    p.add_argument("--only_test", action="store_true")
    p.add_argument("--max_seq", default=128, type=int)
    p.add_argument("--ignore_idx", default=0, type=int)
    p.add_argument("--sample_ratio", default=1.0, type=float)
    p.add_argument("--alpha", default=0.0, type=float, help="CCR")
    p.add_argument("--margin", default=0.1, type=float, help="CCR")
    p.add_argument("--beta", default=0.1, type=float)
    p.add_argument("--mild_margin", default=0.7, type=float)
    p.add_argument("--hetero", default=0.9, type=float)
    p.add_argument("--homo", default=0.9, type=float)
    p.add_argument("--DR_step", default=3, type=int)
    p.add_argument("--weight_js_1", default=0.1, type=float)
    p.add_argument("--weight_js_2", default=0.1, type=float)
    p.add_argument("--weight_diff", default=0.1, type=float)
    p.add_argument("--embed_size", default=768, type=int)
    p.add_argument("--num_head_IMRC", default=16, type=int)
    p.add_argument("--hid_IMRC", default=768, type=int)
    p.add_argument("--raw_feature_norm_CMRC", default="clipped_l2norm")
    p.add_argument("--lambda_softmax_CMRC", default=4.0, type=float)
    p.add_argument("--hid_router", default=768, type=int)
    p.add_argument("--num_classes", default=None, type=int,
                   help="classifier width; default 3 (2 for --dataset hfm)")
    # --- dataset locations (hardcoded dicts in ref: run.py:86-105) ---
    p.add_argument("--dataset", default="mvsa-single",
                   choices=["mvsa-single", "mvsa-multiple", "hfm", "custom"])
    p.add_argument("--data_dir", default="data", type=str)
    p.add_argument("--train_json", default=None, type=str)
    p.add_argument("--dev_json", default=None, type=str)
    p.add_argument("--test_json", default=None, type=str)
    p.add_argument("--img_dir", default=None, type=str)
    # --- TPU-native flags ---
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--mesh_data", default=-1, type=int,
                   help="data-parallel axis size (-1 = all devices)")
    p.add_argument("--mesh_model", default=1, type=int,
                   help="tensor-parallel axis size")
    p.add_argument("--mesh_stage", default=1, type=int,
                   help="pipeline-parallel axis size: run each tower's "
                        "layer stack as a mesh_stage-deep GPipe pipeline "
                        "(models/pipeline.py); must divide the tower depth")
    p.add_argument("--pipeline_microbatches", default=0, type=int,
                   help="microbatches per batch for --mesh_stage pipelines "
                        "(0 = stages; bubble = (S-1)/(M+S-1))")
    p.add_argument("--mesh_topology", action="store_true",
                   help="order mesh axes along the physical ICI torus "
                        "(jax mesh_utils; recommended on pod slices)")
    # multi-host (pod-scale) runtime — parallel/distributed.py. On a Cloud
    # TPU pod slice pass --num_processes -1 for full auto-detection; on
    # CPU/GPU clusters give explicit coordinator/rank/world.
    p.add_argument("--coordinator_address", default=None, type=str,
                   help="host:port of process 0 (multi-host training)")
    p.add_argument("--num_processes", default=None, type=int,
                   help="world size; -1 = auto-detect (Cloud TPU pods)")
    p.add_argument("--process_id", default=None, type=int,
                   help="this process's rank in [0, num_processes)")
    p.add_argument("--num_workers", default=16, type=int)
    p.add_argument("--pretrained_dir", default=None, type=str,
                   help="dir with bert/ and clip/ torch state dicts to convert")
    p.add_argument("--debug_nans", action="store_true")
    p.add_argument("--profile_dir", default=None, type=str)
    p.add_argument("--cleanup_output", action="store_true",
                   help="reference behaviour: delete save_path after test")
    p.add_argument("--save_opt_state", action="store_true",
                   help="checkpoint optimizer state too (true resume; the "
                        "reference restarts the schedule)")
    p.add_argument("--auto_resume", action="store_true",
                   help="write a full-state checkpoint every epoch under "
                        "save_path/resume/ and continue an interrupted run "
                        "from it bit-exactly (rerun the same command)")
    p.add_argument("--patience", default=0, type=int,
                   help="stop early when dev F1 has not improved for N "
                        "evaluated epochs (0 = train all epochs)")
    p.add_argument("--metrics_jsonl", default=None, type=str,
                   help="append per-window/eval/summary metrics as JSON "
                        "lines to this file")
    p.add_argument("--dry_run", action="store_true",
                   help="validate the config without data: build the model, "
                        "compile ONE real train step on the configured mesh, "
                        "and print a JSON line with the parameter count and "
                        "the compiler's FLOPs/bytes per step, then exit")
    p.add_argument("--freeze_towers", action="store_true",
                   help="linear-probe mode: freeze the pretrained text and "
                        "vision towers; train only the routing fabric, "
                        "fusion head, and classifier")
    p.add_argument("--tensorboard_dir", default=None, type=str,
                   help="write TensorBoard event files (train loss + "
                        "dev/test metrics); the reference declares this "
                        "writer but never constructs it")
    p.add_argument("--use_sentic_graph", action="store_true",
                   help="enable SenticNet affective-graph GCN refinement")
    p.add_argument("--sentic_lexicon", default=None, type=str,
                   help="path to senticnet_word.txt (default: vendored asset)")
    p.add_argument("--steps_per_dispatch", default=16, type=int,
                   help="train steps fused into one device program (lax.scan)")
    p.add_argument("--grad_accum_steps", default=1, type=int,
                   help="average grads over K microbatches per optimizer "
                        "step (effective batch K*batch_size at one "
                        "microbatch's activation memory)")
    p.add_argument("--optimizer_impl", default="grouped",
                   choices=["grouped", "fused", "fused_leaf",
                            "multi_transform"])
    p.add_argument("--adam_mu_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--scan_layers", action="store_true",
                   help="run tower layers as one nn.scan over stacked params "
                        "(identical math, ~12x smaller HLO / faster compile)")
    p.add_argument("--seq_shard", action="store_true",
                   help="Megatron-style sequence parallelism: under a >1 "
                        "'model' mesh axis, run tower LN/dropout/residual "
                        "segments seq-sharded (reduce-scatter+all-gather "
                        "instead of all-reduce; identical math)")
    p.add_argument("--fabric_shard", action="store_true",
                   help="under a >1 'model' axis, respread the routing "
                        "fabric's batch over (data x model) so tp devices "
                        "share fabric work instead of replicating it "
                        "(identical math)")
    p.add_argument("--async_checkpoint", action="store_true",
                   help="overlap best-model checkpoint writes with the next "
                        "epoch's compute (awaited before the test reload)")
    p.add_argument("--cache_items", action="store_true",
                   help="memoise finished dataset items in RAM so epochs "
                        ">=2 skip all host-side tokenise/decode work "
                        "(~image_size^2*3 bytes/item at the uint8 default)")
    p.add_argument("--pixel_transfer", default="uint8",
                   choices=["uint8", "float32"],
                   help="image host->device format: uint8 ships raw resized "
                        "pixels (4x fewer bytes, normalised on device), "
                        "float32 = host-side CLIP normalisation")
    p.add_argument("--prng_impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="dropout PRNG: rbg = TPU-native (fast), "
                        "threefry2x32 = sharding-stable bits")
    p.add_argument("--quant_train", default="none",
                   choices=["none", "int8", "int8_all"],
                   help="run projection matmuls on the int8 MXU path "
                        "(2x bf16 peak; AQT-style dynamic quantization, "
                        "STE backward; int8_all also quantizes the two "
                        "backward dots). NOT recipe-parity numerics")
    return p


def dataset_paths(args) -> Dict[str, str]:
    """Reference path conventions (ref: run.py:86-105)."""
    if args.train_json:
        return {"train": args.train_json, "dev": args.dev_json,
                "test": args.test_json, "img": args.img_dir}
    d = args.data_dir
    if args.dataset == "mvsa-single":
        base = os.path.join(d, "MVSA-single", "10-flod-1")
        img = os.path.join(d, "MVSA-single", "MVSA_Single", "data")
    elif args.dataset == "mvsa-multiple":
        base = os.path.join(d, "MVSA-multiple", "10-flod-1")
        img = os.path.join(d, "MVSA-multiple", "MVSA", "data")
    else:  # hfm
        base = os.path.join(d, "HFM")
        img = os.path.join(d, "HFM", "dataset_image")
    dev = "valid.json" if args.dataset == "hfm" else "dev.json"
    return {"train": os.path.join(base, "train.json"),
            "dev": os.path.join(base, dev),
            "test": os.path.join(base, "test.json"),
            "img": img}


def config_from_args(args) -> D2RConfig:
    # mesh axes in ("data", "stage", "model") order, dropping size-1 axes —
    # dp always present; pp shards pipeline stages; tp shards tower matmuls
    mesh_shape, axis_names = [args.mesh_data], ["data"]
    if args.mesh_stage > 1:
        mesh_shape.append(args.mesh_stage)
        axis_names.append("stage")
    if args.mesh_model > 1:
        mesh_shape.append(args.mesh_model)
        axis_names.append("model")
    mesh_shape, axis_names = tuple(mesh_shape), tuple(axis_names)
    if args.num_classes is not None:
        num_classes = args.num_classes
    else:
        # 3-way sentiment (ref: models/unimo_model.py:145); HFM sarcasm is
        # binary (the commented-out variant at ref: run.py:100-105)
        num_classes = 2 if args.dataset == "hfm" else 3
    return D2RConfig(
        num_classes=num_classes,
        bert_name=args.bert_name, vit_name=args.vit_name,
        num_epochs=args.num_epochs, device=args.device,
        batch_size=args.batch_size, lr=args.lr,
        warmup_ratio=args.warmup_ratio, eval_begin_epoch=args.eval_begin_epoch,
        seed=args.seed, load_path=args.load_path, save_path=args.save_path,
        write_path=args.write_path, notes=args.notes, do_train=args.do_train,
        only_test=args.only_test, max_seq=args.max_seq,
        ignore_idx=args.ignore_idx, sample_ratio=args.sample_ratio,
        alpha=args.alpha, margin=args.margin, beta=args.beta,
        mild_margin=args.mild_margin, hetero=args.hetero, homo=args.homo,
        DR_step=args.DR_step, weight_js_1=args.weight_js_1,
        weight_js_2=args.weight_js_2, weight_diff=args.weight_diff,
        embed_size=args.embed_size, num_head_IMRC=args.num_head_IMRC,
        hid_IMRC=args.hid_IMRC,
        raw_feature_norm_CMRC=args.raw_feature_norm_CMRC,
        lambda_softmax_CMRC=args.lambda_softmax_CMRC,
        hid_router=args.hid_router,
        save_opt_state=args.save_opt_state,
        auto_resume=args.auto_resume,
        patience=args.patience,
        metrics_jsonl=args.metrics_jsonl,
        tensorboard_dir=args.tensorboard_dir,
        freeze_towers=args.freeze_towers,
        use_sentic_graph=args.use_sentic_graph,
        sentic_lexicon_path=args.sentic_lexicon,
        compute_dtype=args.compute_dtype,
        use_pallas=not args.no_pallas, remat=args.remat,
        mesh_shape=mesh_shape, mesh_axis_names=axis_names,
        debug_nans=args.debug_nans, profile_dir=args.profile_dir,
        steps_per_dispatch=args.steps_per_dispatch,
        grad_accum_steps=args.grad_accum_steps,
        optimizer_impl=args.optimizer_impl,
        adam_mu_dtype=args.adam_mu_dtype,
        prng_impl=args.prng_impl,
        quant_train=args.quant_train,
        pixel_transfer=args.pixel_transfer,
        cache_items=args.cache_items,
        async_checkpoint=args.async_checkpoint,
        scan_layers=args.scan_layers,
        seq_shard=args.seq_shard,
        fabric_shard=args.fabric_shard,
        pipeline_stages=args.mesh_stage,
        pipeline_microbatches=args.pipeline_microbatches,
        mesh_topology=args.mesh_topology,
    )


def _dry_run(cfg, logger):
    """--dry_run: compile the REAL train step (same jit, same mesh, same
    shapes) against a synthetic batch and report the parameter count plus
    the compiler's own cost model — a config/geometry/memory check that
    needs no dataset and writes nothing. No reference equivalent."""
    import json

    import jax
    import numpy as np

    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.parallel.mesh import make_mesh, shard_batch
    from d2r_tpu.train.state import create_train_state, make_train_step

    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(cfg.batch_size, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    if cfg.use_sentic_graph:
        # Match the loader: a dense (B, L, L) affective adjacency. Without
        # it the model traces WITHOUT the sentic GCN (models/unimo.py
        # guards on sentic_adj is None) and dry_run would validate a
        # different program than the real run compiles.
        batch["sentic_adj"] = np.random.RandomState(1).uniform(
            0.0, 2.0, size=(cfg.batch_size, cfg.max_seq, cfg.max_seq),
        ).astype(np.float32)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    cost = {}
    with mesh:
        state = create_train_state(model, cfg, None,
                                   jax.random.key(cfg.seed), batch,
                                   total_steps=max(cfg.num_epochs, 1))
        step = make_train_step(model)
        try:
            dropout_key = jax.random.key(
                cfg.seed + 1, impl=getattr(cfg, "prng_impl", "threefry2x32"))
            compiled = step.lower(state, shard_batch(batch, mesh),
                                  dropout_key).compile()
            c = compiled.cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0] if c else {}
            cost = dict(c or {})
        except Exception as e:  # noqa: BLE001 — cost model is best-effort
            logger.warning("dry_run: step compile/cost analysis failed: %r",
                           e)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(state.params))
    line = {
        "dry_run": True,
        "params": n_params,
        "flops_per_step": cost.get("flops"),
        "bytes_accessed_per_step": cost.get("bytes accessed"),
        "devices": jax.device_count(),
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "batch_size": cfg.batch_size,
        "max_seq": cfg.max_seq,
        "compute_dtype": cfg.compute_dtype,
    }
    print(json.dumps(line), flush=True)
    logger.info("dry run OK")
    return line


def main(argv=None) -> None:
    args = build_arg_parser().parse_args(argv)
    cfg = config_from_args(args)
    logger.info(args)

    # honour --device (ref: run.py:44) — on this stack the TPU plugin
    # overrides JAX_PLATFORMS, so set the config flag explicitly.
    if args.device in ("cpu", "tpu"):
        import jax
        try:
            jax.config.update("jax_platforms", args.device)
        except Exception:
            pass
    from d2r_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # multi-host: join the pod BEFORE any device use; no-op single-host.
    from d2r_tpu.parallel import distributed
    if args.num_processes is not None and args.num_processes < 0:
        distributed.initialize(auto=True)
    else:
        distributed.initialize(args.coordinator_address, args.num_processes,
                               args.process_id)

    # deterministic seeding (ref: run.py:29-35): JAX threads PRNG keys
    # explicitly, so cfg.seed fully determines init + dropout + shuffling.
    import numpy as np
    np.random.seed(cfg.seed)

    if args.dry_run:
        # config validation without any dataset: compile the real step,
        # report what the compiler says it costs, exit.
        return _dry_run(cfg, logger)

    if cfg.save_path is not None:
        os.makedirs(cfg.save_path, exist_ok=True)

    paths = dataset_paths(args)
    from d2r_tpu.data.dataset import DataLoader, MSDDataset, MSDProcessor
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.trainer import Trainer

    processor = MSDProcessor(
        {k: paths[k] for k in ("train", "dev", "test")}, cfg.bert_name,
        vocab_size=cfg.text_config().vocab_size)
    vc = cfg.vision_config()
    lexicon = None
    if cfg.use_sentic_graph:
        from d2r_tpu.data.sentic import load_sentic_lexicon
        lexicon = load_sentic_lexicon(cfg.sentic_lexicon_path)  # default: vendored asset
    mk = lambda mode: MSDDataset(
        processor, paths["img"], max_seq=cfg.max_seq, mode=mode,
        image_size=vc.image_size, num_vision_tokens=vc.num_tokens,
        sample_ratio=cfg.sample_ratio if mode == "train" else 1.0,
        sentic_lexicon=lexicon, pixel_transfer=cfg.pixel_transfer,
        cache_items=cfg.cache_items)
    # multi-host: every process loads only its slice of each global batch
    shard = distributed.process_shard() if distributed.is_multiprocess() \
        else None
    train_loader = DataLoader(mk("train"), cfg.batch_size, shuffle=True,
                              num_workers=args.num_workers, seed=cfg.seed,
                              process_shard=shard)
    dev_loader = DataLoader(mk("dev"), cfg.batch_size, shuffle=False,
                            num_workers=max(args.num_workers // 2, 1),
                            process_shard=shard)
    test_loader = DataLoader(mk("test"), cfg.batch_size, shuffle=False,
                             num_workers=max(args.num_workers // 2, 1),
                             process_shard=shard)

    model = D2RClassifier(cfg)
    trainer = Trainer(train_data=train_loader, dev_data=dev_loader,
                      test_data=test_loader, model=model, cfg=cfg,
                      logger=logger, cleanup_output=args.cleanup_output)

    pretrained = None
    if args.pretrained_dir:
        from d2r_tpu.utils.weights import load_pretrained_params
        first = next(iter(train_loader))
        trainer.init_state(first)
        pretrained = load_pretrained_params(
            args.pretrained_dir, cfg, trainer.state.params)
        trainer.state = trainer.state.replace(params=pretrained)

    if cfg.only_test:
        if cfg.load_path:
            # geometry guard BEFORE the (multi-minute) init compile
            from d2r_tpu.train.checkpoint import check_checkpoint_geometry
            check_checkpoint_geometry(cfg.load_path, cfg)
        first = next(iter(test_loader))
        if trainer.state is None:
            trainer.init_state(first)
        if cfg.load_path:
            from d2r_tpu.train.checkpoint import restore_checkpoint
            trainer.state = restore_checkpoint(cfg.load_path, trainer.state)
        trainer.test(0)
    elif cfg.do_train:
        trainer.train()


def console_main(argv=None) -> int:
    """Console-script entry (pyproject `d2r-train`). ``main`` returns the
    dry-run report dict for in-process callers (tests, notebooks); the
    setuptools wrapper does ``sys.exit(main())``, which turns any non-None
    return into exit code 1 — discard it here. Caught by
    tools/package_smoke.py."""
    main(argv)
    return 0


if __name__ == "__main__":
    main()
