"""Self-describing checkpoints: config.json round-trip and the serving
geometry resolution order (CLI override > checkpoint config.json > flagship
defaults)."""

import dataclasses
import json
import os

from d2r_tpu.config import (
    D2RConfig,
    load_config_json,
    save_config_json,
    tiny_test_config,
)
from d2r_tpu.server import resolve_serve_config


class TestRoundTrip:
    def test_all_fields_survive(self, tmp_path):
        cfg = tiny_test_config(DR_step=5, lr=1.25e-4, alpha=0.3,
                               mesh_shape=(2, 4),
                               mesh_axis_names=("data", "model"),
                               save_opt_state=True)
        p = str(tmp_path / "config.json")
        save_config_json(cfg, p)
        loaded = load_config_json(p)
        assert loaded == cfg  # frozen dataclass: field-wise equality
        # tuple-typed fields must come back as tuples, not JSON lists
        assert isinstance(loaded.mesh_shape, tuple)
        assert isinstance(loaded.mesh_axis_names, tuple)

    def test_unknown_keys_from_newer_versions_are_dropped(self, tmp_path):
        p = str(tmp_path / "config.json")
        save_config_json(D2RConfig(), p)
        with open(p) as f:
            d = json.load(f)
        d["some_future_knob"] = 42
        with open(p, "w") as f:
            json.dump(d, f)
        assert load_config_json(p) == D2RConfig()


class TestResolveServeConfig:
    def _write(self, directory, cfg):
        os.makedirs(directory, exist_ok=True)
        save_config_json(cfg, os.path.join(directory, "config.json"))

    def test_discovered_inside_load_path(self, tmp_path):
        trained = tiny_test_config(embed_size=64, DR_step=5)
        ckpt = str(tmp_path / "best_model")
        self._write(ckpt, trained)
        cfg = resolve_serve_config(ckpt)
        assert cfg == trained

    def test_discovered_one_level_up(self, tmp_path):
        # the trainer writes save_path/config.json beside save_path/best_model
        trained = tiny_test_config(hid_router=32)
        self._write(str(tmp_path), trained)
        cfg = resolve_serve_config(str(tmp_path / "best_model"))
        assert cfg == trained

    def test_training_quant_train_not_restored(self, tmp_path):
        # quant_train is a training-time knob: a checkpoint trained with
        # --quant_train int8 must serve full-precision unless the operator
        # asks for serving quantization explicitly (--quantize).
        trained = tiny_test_config(quant_train="int8")
        ckpt = str(tmp_path / "best_model")
        self._write(ckpt, trained)
        cfg = resolve_serve_config(ckpt)
        assert cfg.quant_train == "none"
        # everything else still comes from the checkpoint config
        assert cfg.embed_size == trained.embed_size

    def test_cli_override_beats_config_json(self, tmp_path):
        trained = tiny_test_config(num_classes=3)
        self._write(str(tmp_path), trained)
        cfg = resolve_serve_config(str(tmp_path / "best_model"),
                                   num_classes=2, compute_dtype="float32")
        assert cfg.num_classes == 2
        assert cfg.compute_dtype == "float32"
        # untouched geometry still comes from the checkpoint config
        assert cfg.embed_size == trained.embed_size
        assert cfg.bert_name == trained.bert_name

    def test_defaults_without_config_json(self, tmp_path):
        cfg = resolve_serve_config(str(tmp_path / "nothing_here"))
        assert cfg.bert_name == "bert-base-uncased"
        assert cfg.max_seq == 64 and cfg.DR_step == 4
        assert cfg.compute_dtype == "bfloat16"

    def test_explicit_config_json_flag(self, tmp_path):
        trained = tiny_test_config(DR_step=2)
        p = str(tmp_path / "elsewhere.json")
        save_config_json(trained, p)
        cfg = resolve_serve_config(str(tmp_path / "best_model"),
                                   config_json=p)
        assert cfg.DR_step == 2

    def test_missing_explicit_config_json_raises(self, tmp_path):
        import pytest

        with pytest.raises(FileNotFoundError):
            resolve_serve_config(str(tmp_path), config_json=str(
                tmp_path / "nope.json"))

    def test_unknown_override_raises_value_error(self, tmp_path):
        import pytest

        # a raise, not an assert: must also fire under `python -O`
        with pytest.raises(ValueError, match="unexpected serve overrides"):
            resolve_serve_config(str(tmp_path / "best_model"),
                                 not_a_field=1)


class TestCheckpointGeometryGuard:
    def test_matching_geometry_passes(self, tmp_path):
        from d2r_tpu.train.checkpoint import check_checkpoint_geometry

        cfg = tiny_test_config()
        save_config_json(cfg, str(tmp_path / "config.json"))
        used = check_checkpoint_geometry(str(tmp_path / "best_model"),
                                         cfg.replace(lr=9e-9, max_seq=99))
        assert used == str(tmp_path / "config.json")  # non-geometry may differ

    def test_mismatch_raises_with_field_names(self, tmp_path):
        import pytest

        from d2r_tpu.train.checkpoint import check_checkpoint_geometry

        cfg = tiny_test_config(embed_size=64, DR_step=3)
        save_config_json(cfg, str(tmp_path / "config.json"))
        with pytest.raises(ValueError) as ei:
            check_checkpoint_geometry(
                str(tmp_path / "best_model"),
                cfg.replace(embed_size=128, DR_step=4))
        assert "embed_size" in str(ei.value) and "DR_step" in str(ei.value)

    def test_legacy_checkpoint_without_config_json_is_unchecked(self, tmp_path):
        from d2r_tpu.train.checkpoint import check_checkpoint_geometry

        assert check_checkpoint_geometry(str(tmp_path / "best_model"),
                                         tiny_test_config()) is None


def test_trainer_save_site_writes_config_json(tmp_path, monkeypatch):
    """The best-model save path emits config.json (wired in
    trainer.evaluate); exercised cheaply by reusing the saved-state helper
    rather than a full training epoch — the full path is driven by the CLI
    e2e (verify skill / test_real_assets_harness)."""
    cfg = tiny_test_config(save_path=str(tmp_path))
    # mirror trainer.evaluate's save block
    save_config_json(cfg, os.path.join(cfg.save_path, "config.json"))
    served = resolve_serve_config(os.path.join(cfg.save_path, "best_model"))
    assert served == cfg
