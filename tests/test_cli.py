"""CLI surface tests: flag names/defaults mirror the reference argparse
(ref: run.py:40-82) and dataset-path conventions (ref: run.py:86-105)."""

import os

from d2r_tpu.cli import build_arg_parser, config_from_args, dataset_paths


def test_reference_defaults():
    args = build_arg_parser().parse_args([])
    # ref: run.py:40-82 defaults
    assert args.bert_name == "bert-base-uncased"
    assert args.vit_name == "clip-vit-base-patch32"
    assert args.num_epochs == 30
    assert args.batch_size == 32
    assert args.lr == 3e-5
    assert args.warmup_ratio == 0.01
    assert args.eval_begin_epoch == 1
    assert args.seed == 2023
    assert args.max_seq == 128
    assert args.alpha == 0.0 and args.margin == 0.1
    assert args.DR_step == 3
    assert args.weight_js_1 == 0.1 and args.weight_js_2 == 0.1
    assert args.embed_size == 768
    assert args.num_head_IMRC == 16 and args.hid_IMRC == 768
    assert args.raw_feature_norm_CMRC == "clipped_l2norm"
    assert args.lambda_softmax_CMRC == 4.0
    assert args.hid_router == 768


def test_round3_trainer_flags_round_trip():
    argv = ("--auto_resume --patience 3 --metrics_jsonl /tmp/m.jsonl "
            "--cache_items --async_checkpoint").split()
    args = build_arg_parser().parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.auto_resume is True and cfg.patience == 3
    assert cfg.metrics_jsonl == "/tmp/m.jsonl"
    assert cfg.cache_items is True and cfg.async_checkpoint is True
    # defaults: all off (reference behaviour)
    dflt = config_from_args(build_arg_parser().parse_args([]))
    assert dflt.auto_resume is False and dflt.patience == 0
    assert dflt.metrics_jsonl is None
    assert dflt.cache_items is False and dflt.async_checkpoint is False


def test_dry_run_reports_params_and_cost():
    """--dry_run compiles one real train step with no dataset and reports
    the parameter count + compiler cost model as one JSON line."""
    from d2r_tpu.cli import main

    line = main(["--dry_run", "--device", "cpu", "--bert_name", "tiny-bert",
                 "--vit_name", "tiny-vit", "--embed_size", "64",
                 "--num_head_IMRC", "4", "--hid_IMRC", "64",
                 "--hid_router", "32", "--max_seq", "16",
                 "--batch_size", "8", "--no_pallas",
                 "--compute_dtype", "float32"])
    assert line["dry_run"] is True
    assert line["params"] > 10 ** 6
    assert line["flops_per_step"] is None or line["flops_per_step"] > 0
    assert line["batch_size"] == 8 and line["max_seq"] == 16


def test_dry_run_includes_sentic_gcn_params():
    """--dry_run --use_sentic_graph must validate the program the real run
    compiles: the synthetic batch carries a sentic_adj so the GCN branch
    traces (models/unimo.py skips it when sentic_adj is None)."""
    from d2r_tpu.cli import main

    tiny = ["--device", "cpu", "--bert_name", "tiny-bert",
            "--vit_name", "tiny-vit", "--embed_size", "64",
            "--num_head_IMRC", "4", "--hid_IMRC", "64",
            "--hid_router", "32", "--max_seq", "16",
            "--batch_size", "4", "--no_pallas",
            "--compute_dtype", "float32"]
    base = main(["--dry_run"] + tiny)
    sentic = main(["--dry_run", "--use_sentic_graph"] + tiny)
    assert sentic["params"] > base["params"]


def test_recipe_flags_round_trip():
    # the run.sh MVSA-Single recipe (ref: run.sh:1-21)
    argv = ("--num_epochs 20 --lr 1e-5 --warmup_ratio 0.2 --seed 2023 "
            "--batch_size 64 --max_seq 64 --weight_js_1 0.9 --weight_js_2 0.3 "
            "--DR_step 4 --weight_diff 0").split()
    args = build_arg_parser().parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.num_epochs == 20 and cfg.lr == 1e-5 and cfg.batch_size == 64
    assert cfg.DR_step == 4 and cfg.weight_js_1 == 0.9 and cfg.weight_js_2 == 0.3
    assert cfg.max_seq == 64
    # hidden constants (SURVEY.md section 5.6)
    assert cfg.num_cells == 6 and cfg.path_hid == 128
    assert cfg.fc_lr == 5e-2 and cfg.router_bias_init == 1.5
    assert cfg.routing_threshold == 1e-4 and cfg.cma_temperature == 100.0
    assert cfg.num_classes == 3


def test_unknown_encoder_presets_raise():
    # No silent geometry fallback: a typo'd name must not quietly train
    # bert-base-uncased / ViT-B/32 shapes.
    import pytest

    from d2r_tpu.config import D2RConfig

    with pytest.raises(ValueError, match="unknown text encoder preset"):
        D2RConfig(bert_name="roberta-larg").text_config()
    with pytest.raises(ValueError, match="unknown vision encoder preset"):
        D2RConfig(vit_name="clip-vit-larg").vision_config()
    # known names (with or without the org prefix) still resolve
    assert D2RConfig(bert_name="roberta-large").text_config().hidden_size == 1024
    assert D2RConfig(
        vit_name="openai/clip-vit-base-patch32").vision_config().patch_size == 32


def test_dataset_path_conventions():
    args = build_arg_parser().parse_args(["--dataset", "mvsa-single"])
    p = dataset_paths(args)
    assert p["train"].endswith(os.path.join("MVSA-single", "10-flod-1", "train.json"))
    assert p["img"].endswith(os.path.join("MVSA_Single", "data"))

    args = build_arg_parser().parse_args(["--dataset", "hfm"])
    p = dataset_paths(args)
    assert p["dev"].endswith("valid.json")  # HFM uses valid.json (ref: run.py:102)
    cfg = config_from_args(args)
    assert cfg.num_classes == 2  # sarcasm is binary

    args = build_arg_parser().parse_args(
        ["--train_json", "a.json", "--dev_json", "b.json",
         "--test_json", "c.json", "--img_dir", "imgs"])
    p = dataset_paths(args)
    assert p == {"train": "a.json", "dev": "b.json", "test": "c.json",
                 "img": "imgs"}
