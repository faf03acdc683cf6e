"""SenticNet GCN refinement (optional feature, BASELINE config 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from d2r_tpu.config import tiny_test_config
from d2r_tpu.data.dataset import synthetic_batch
from d2r_tpu.models.unimo import D2RClassifier


def _args(batch, adj=None):
    a = [jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
         jnp.asarray(batch["token_type_ids"]), jnp.asarray(batch["labels"]),
         jnp.asarray(batch["pixel_values"])]
    return a


def test_gcn_changes_output_only_when_enabled():
    cfg_on = tiny_test_config(use_sentic_graph=True)
    cfg_off = tiny_test_config()
    vc = cfg_on.vision_config()
    batch = synthetic_batch(2, cfg_on.max_seq, vc.image_size,
                            vocab_size=cfg_on.text_config().vocab_size, seed=0)
    adj = jnp.asarray(
        np.eye(cfg_on.max_seq, dtype=np.float32)[None].repeat(2, 0) * 2.0)

    m_on = D2RClassifier(cfg_on)
    vs = jax.jit(m_on.init)(jax.random.key(0), *_args(batch), sentic_adj=adj)
    assert "sentic_gcn" in vs["params"]["model"]

    loss_with, logits_with, _ = jax.jit(m_on.apply)(vs, *_args(batch), sentic_adj=adj)
    assert np.isfinite(float(loss_with))

    # same params but adjacency of zeros: GCN output = relu(bias-ish) differs
    zero_adj = jnp.zeros_like(adj)
    _, logits_zero, _ = jax.jit(m_on.apply)(vs, *_args(batch), sentic_adj=zero_adj)
    assert not np.allclose(np.asarray(logits_with), np.asarray(logits_zero))

    # disabled config has no gcn params at all
    m_off = D2RClassifier(cfg_off)
    vs_off = jax.jit(m_off.init)(jax.random.key(0), *_args(batch))
    assert "sentic_gcn" not in vs_off["params"]["model"]


def test_dataset_emits_adjacency(tmp_path):
    from d2r_tpu.data.dataset import DataLoader, MSDDataset, MSDProcessor, write_fake_dataset
    paths = write_fake_dataset(str(tmp_path), n=4, image_size=32)
    proc = MSDProcessor(paths, "no-vocab", vocab_size=500)
    lex = {"happy": 0.9, "sad": -0.7}
    ds = MSDDataset(proc, paths["img_dir"], max_seq=8, mode="train",
                    image_size=32, sentic_lexicon=lex)
    item = ds[0]
    assert item["sentic_adj"].shape == (8, 8)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    batch = next(iter(loader))
    assert batch["sentic_adj"].shape == (2, 8, 8)
