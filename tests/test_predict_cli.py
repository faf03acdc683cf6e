"""Offline bulk scoring (d2r-predict, d2r_tpu/predict.py): input parsing,
image resolution, and end-to-end CLI agreement with the serving Predictor."""

import json
import os

import jax
import numpy as np
import pytest

from d2r_tpu.config import save_config_json, tiny_test_config
from d2r_tpu.predict import _resolve_image, iter_samples, main, score_samples


# ------------------------------------------------------------- input parsing
def test_iter_samples_jsonl_and_array(tmp_path):
    rows = [{"id": "a", "text": "hi"}, {"id": "b", "text": "yo"}]
    jl = tmp_path / "in.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows) + "\n\n")
    arr = tmp_path / "in.json"
    arr.write_text(json.dumps(rows))
    assert iter_samples(str(jl)) == rows
    assert iter_samples(str(arr)) == rows


def test_iter_samples_array_with_leading_whitespace_and_bom(tmp_path):
    rows = [{"id": "a", "text": "hi"}]
    ws = tmp_path / "ws.json"
    ws.write_text("\n  " + json.dumps(rows))
    assert iter_samples(str(ws)) == rows
    # >4 KB of leading whitespace still sniffs the array correctly
    deep_ws = tmp_path / "deep_ws.json"
    deep_ws.write_text(" " * 8192 + "\n" + json.dumps(rows))
    assert iter_samples(str(deep_ws)) == rows
    bom = tmp_path / "bom.json"
    bom.write_bytes(b"\xef\xbb\xbf" + json.dumps(rows).encode())
    assert iter_samples(str(bom)) == rows
    # a BOM'd JSONL file decodes too
    bom_jl = tmp_path / "bom.jsonl"
    bom_jl.write_bytes(b"\xef\xbb\xbf" + json.dumps(rows[0]).encode() + b"\n")
    assert iter_samples(str(bom_jl)) == rows


def test_iter_samples_reports_bad_line(tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1, "text": "x"}\nnot json\n')
    with pytest.raises(ValueError, match="bad.jsonl:2"):
        iter_samples(str(p))


def test_resolve_image_precedence(tmp_path):
    d = str(tmp_path)
    assert _resolve_image({"image": "/abs/x.png"}, d) == "/abs/x.png"
    assert _resolve_image({"image": "rel.png"}, d) == os.path.join(d, "rel.png")
    # the reference's <id>.jpg convention (ref: processor/dataset.py:40-43)
    assert _resolve_image({"id": "42"}, d) == os.path.join(d, "42.jpg")
    assert _resolve_image({"id": "42"}, None) is None


# ----------------------------------------------------------------- e2e CLI
@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """A tiny random-init checkpoint laid out exactly like the trainer
    writes it (save_path/best_model + save_path/config.json)."""
    from d2r_tpu.data.dataset import synthetic_batch
    from d2r_tpu.models.unimo import D2RClassifier
    from d2r_tpu.train.checkpoint import save_checkpoint

    cfg = tiny_test_config()
    model = D2RClassifier(cfg)
    vc = cfg.vision_config()
    batch = synthetic_batch(2, cfg.max_seq, vc.image_size,
                            vocab_size=cfg.text_config().vocab_size, seed=0)
    import jax.numpy as jnp
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["pixel_values"]))

    class _State:  # save_checkpoint duck-types params/batch_stats
        params = variables["params"]
        batch_stats = variables.get("batch_stats")

    root = str(tmp_path_factory.mktemp("predict_ckpt"))
    save_checkpoint(os.path.join(root, "best_model"), _State())
    save_config_json(cfg, os.path.join(root, "config.json"))
    return cfg, variables, root


def test_cli_scores_jsonl_and_matches_predictor(ckpt, tmp_path):
    cfg, variables, root = ckpt
    from PIL import Image

    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
                    ).save(os.path.join(img_dir, "s1.jpg"))

    rows = [
        {"id": "s1", "text": "a happy picture"},          # <id>.jpg found
        {"id": "s2", "text": "text only sample"},         # placeholder path
        {"id": "s3", "text": "explicit missing image", "image": "nope.jpg"},
    ]
    inp = tmp_path / "in.jsonl"
    inp.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "out.jsonl"

    main(["--load_path", os.path.join(root, "best_model"),
          "--input", str(inp), "--output", str(out),
          "--img_dir", img_dir, "--batch_buckets", "4"])

    got = [json.loads(l) for l in out.read_text().splitlines()]
    assert [g["id"] for g in got] == ["s1", "s2", "s3"]
    for g in got:
        assert 0 <= g["label"] < cfg.num_classes
        np.testing.assert_allclose(sum(g["probs"]), 1.0, rtol=1e-5)

    # bit-agreement with a directly-constructed Predictor on the same inputs
    from d2r_tpu.data.tokenizer import load_tokenizer
    from d2r_tpu.serve import Predictor
    predictor = Predictor(cfg, variables, batch_buckets=(4,))
    tok = load_tokenizer(cfg.bert_name,
                         vocab_size=cfg.text_config().vocab_size)
    want = list(score_samples(predictor, tok, rows, img_dir=img_dir))
    assert [w["label"] for w in want] == [g["label"] for g in got]
    np.testing.assert_allclose(
        np.array([w["probs"] for w in want]),
        np.array([g["probs"] for g in got]), atol=1e-6)


def test_accepts_reference_msd_split_format(ckpt, tmp_path):
    """The reference's labelled split JSON scores as-is (labels ignored)."""
    cfg, variables, root = ckpt
    inp = tmp_path / "dev.json"
    inp.write_text(json.dumps([
        {"id": "1", "text": "reference format", "emotion_label": 2},
        {"id": "2", "text": "another row", "emotion_label": 0},
    ]))
    out = tmp_path / "out.jsonl"
    main(["--load_path", os.path.join(root, "best_model"),
          "--input", str(inp), "--output", str(out),
          "--batch_buckets", "2"])
    got = [json.loads(l) for l in out.read_text().splitlines()]
    assert [g["id"] for g in got] == ["1", "2"]
    assert all("probs" in g and len(g["probs"]) == cfg.num_classes
               for g in got)
