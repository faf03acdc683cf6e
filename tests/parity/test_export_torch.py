"""Round-trip interop: a d2r_tpu-trained model exported back into the torch
reference. Proves a TPU fine-tune here can be DEPLOYED on the reference
stack: utils/export_torch.py emits a ``state_dict`` the live reference code
loads with ``strict=True`` (exact key coverage, buffers included) and that
reproduces our eval-mode loss/logits."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.parity.ref_loader import (  # noqa: E402
    import_reference,
    make_flax_config,
    make_ref_args,
    write_tiny_config_dirs,
)

B, L = 4, 16


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cfgs"))
    bert_dir, clip_dir = write_tiny_config_dirs(root)
    mods = import_reference()
    args = make_ref_args(bert_dir, clip_dir)
    cfg = make_flax_config()

    from d2r_tpu.models.unimo import D2RClassifier
    model = D2RClassifier(cfg)
    rng = np.random.default_rng(7)
    vc = cfg.vision_config()
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, 128, size=(B, L)), jnp.int32),
        attention_mask=jnp.asarray(
            (np.arange(L)[None, :] < np.array([16, 10, 7, 12])[:, None])
            .astype(np.float32)),
        token_type_ids=jnp.zeros((B, L), jnp.int32),
        labels=jnp.asarray([0, 1, 2, 1]),
        pixel_values=jnp.asarray(
            rng.normal(size=(B, 3, vc.image_size, vc.image_size)),
            jnp.float32),
    )
    variables = jax.jit(model.init)(jax.random.key(0), **batch)
    # One train-mode step so the SAF BatchNorm running stats move off their
    # init values — the export must carry REAL statistics, not defaults.
    _, mutated = model.apply(
        variables, **batch, deterministic=False, use_running_average=False,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}
    return mods, args, cfg, model, variables, batch


def _build_ref(mods, args):
    from transformers import BertConfig, CLIPConfig
    torch.manual_seed(123)
    bc = BertConfig.from_pretrained(args.bert_name)
    vc = CLIPConfig.from_pretrained(args.vit_name).vision_config
    return mods["model"].UnimoModelF(args, vc, bc)


def test_exported_keys_match_reference_exactly(setup):
    mods, args, cfg, model, variables, batch = setup
    from d2r_tpu.utils.export_torch import reference_state_dict

    exported = reference_state_dict(variables)
    ref_keys = set(_build_ref(mods, args).state_dict().keys())
    got_keys = set(exported)
    assert got_keys == ref_keys, (
        f"missing={sorted(ref_keys - got_keys)[:10]} "
        f"unexpected={sorted(got_keys - ref_keys)[:10]}")


def test_reference_loads_strict_and_matches_logits(setup, tmp_path):
    mods, args, cfg, model, variables, batch = setup
    from d2r_tpu.utils.export_torch import save_reference_checkpoint

    path = str(tmp_path / "best_model.pth")
    save_reference_checkpoint(path, variables)

    rmod = _build_ref(mods, args)
    # exactly the reference's own load path (ref: modules/train.py:226-229)
    rmod.load_state_dict(torch.load(path))
    rmod.eval()

    with torch.no_grad():
        ref_loss, ref_logits = rmod(
            input_ids=torch.tensor(np.asarray(batch["input_ids"], np.int64)),
            attention_mask=torch.tensor(np.asarray(batch["attention_mask"])),
            token_type_ids=torch.tensor(
                np.asarray(batch["token_type_ids"], np.int64)),
            labels=torch.tensor(np.asarray(batch["labels"], np.int64)),
            images=torch.tensor(np.asarray(batch["pixel_values"])))

    loss, logits, _ = model.apply(variables, **batch)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=1e-3, err_msg="round-trip logits")
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-3,
                               err_msg="round-trip loss")


def test_export_handles_scan_layers_layout(setup):
    """A checkpoint saved with cfg.scan_layers=True (stacked tower params)
    exports identically to the unstacked layout."""
    mods, args, cfg, model, variables, batch = setup
    from d2r_tpu.utils.export_torch import reference_state_dict
    from d2r_tpu.utils.weights import stack_tower_layers

    base = reference_state_dict(variables)
    stacked = {"params": stack_tower_layers(variables["params"]),
               "batch_stats": variables["batch_stats"]}
    restacked = reference_state_dict(stacked)
    assert set(base) == set(restacked)
    for k in base:
        np.testing.assert_array_equal(base[k], restacked[k], err_msg=k)
