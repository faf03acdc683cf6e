"""AOT serving export: serialize the bucket forwards to StableHLO artifacts.

The reference has no deployment story at all (its closest analogue is
re-running the test loop, ref: modules/train.py:220-278). TPU-native
design: ``jax.export`` lowers each jitted (batch-bucket, seq) serving
forward ONCE and serializes the resulting StableHLO program + calling
convention to disk. A serving host then ``deserialize``s and calls the
artifact — the numerics are pinned by the artifact, not by whatever
model-code version happens to be installed, so a framework upgrade can
never silently change what a deployed endpoint predicts.

Artifact layout (``export_predictor`` writes, ``load_exported`` reads)::

    out_dir/
      manifest.json        buckets, seq len, pixel dtype, jax version,
                           lowering platforms, artifact filenames
      config.json          the full D2RConfig (same writer the trainer uses)
      fwd_b{B}.stablehlo   one serialized Exported per batch bucket

Notes:
  * ``platforms=("cpu", "tpu")`` cross-lowers on a CPU host so one artifact
    serves both backends. Pallas dispatch is backend-conditional at trace
    time (ops/attention.py), so a CPU-host export bakes the XLA attention
    path — which is also the measured-best dispatch at the flagship seq 64
    (docs/BENCHMARKS.md); export ON a TPU host if you want the long-context
    Pallas path baked in.
  * Parameters are NOT in the artifact: the forward takes the variables
    pytree as an argument, so the artifact pairs with any same-geometry
    Orbax checkpoint (and stays small).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from d2r_tpu.config import D2RConfig, load_config_json, save_config_json
from d2r_tpu.serve import Predictor

_MANIFEST = "manifest.json"
_CONFIG = "config.json"
_MANIFEST_VERSION = 1


def _variables_spec(variables):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        variables)


def export_predictor(
    cfg: D2RConfig,
    variables: Dict,
    out_dir: str,
    batch_buckets: Sequence[int] = (1, 8, 32),
    pixel_dtype=jnp.uint8,
    platforms: Optional[Sequence[str]] = None,
    self_check: bool = True,
    quantize: Optional[str] = None,
) -> Dict:
    """Serialize one Exported per batch bucket; returns the manifest dict.

    ``pixel_dtype`` must match what requests will carry (uint8 for the
    default ``pixel_transfer='uint8'`` clients). ``platforms=None`` lowers
    for the current backend only. ``quantize='int8'`` bakes the weight-only
    int8 serving path (d2r_tpu/quant.py) into the artifact: the exported
    calling convention then takes the QUANTIZED parameter tree (int8 codes +
    scales), and ``load_exported`` re-quantizes the paired checkpoint the
    same way — recorded in the manifest so artifact and loader can't drift.
    """
    from jax import export as jexp

    pred = Predictor(cfg, variables, batch_buckets=batch_buckets,
                     quantize=quantize)
    vc = cfg.vision_config()
    seq = pred.seq_len
    pixel_dtype = jnp.dtype(pixel_dtype)
    os.makedirs(out_dir, exist_ok=True)

    # pred.variables, not variables: under quantize the artifact's calling
    # convention is the quantized tree (QuantLeaf nodes of int8 q + scale)
    vars_spec = _variables_spec(pred.variables)
    files = {}
    for b in pred.batch_buckets:
        specs = (
            vars_spec,
            jax.ShapeDtypeStruct((b, seq), jnp.int32),
            jax.ShapeDtypeStruct((b, seq), jnp.int32),
            jax.ShapeDtypeStruct((b, seq), jnp.int32),
            jax.ShapeDtypeStruct(
                (b, vc.num_channels, vc.image_size, vc.image_size),
                pixel_dtype),
        )
        exp = jexp.export(
            pred._fn(b, seq),
            platforms=tuple(platforms) if platforms else None)(*specs)
        fname = f"fwd_b{b}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        files[str(b)] = fname

    manifest = {
        "version": _MANIFEST_VERSION,
        "seq_len": seq,
        "batch_buckets": list(pred.batch_buckets),
        "num_classes": cfg.num_classes,
        "pixel_dtype": pixel_dtype.name,
        "pixel_shape": [vc.num_channels, vc.image_size, vc.image_size],
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "jax_version": jax.__version__,
        "quantize": quantize,
        "files": files,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    save_config_json(cfg, os.path.join(out_dir, _CONFIG))

    if self_check:
        # Prove the artifact ROUND-TRIPS before anyone deploys it: reload
        # from disk and compare against the live forward on random inputs.
        import numpy as np
        loaded = load_exported(out_dir, variables)
        rng = np.random.default_rng(0)
        b = pred.batch_buckets[0]
        ids = rng.integers(0, cfg.text_config().vocab_size,
                           (b, seq)).astype(np.int32)
        mask = np.ones((b, seq), np.int32)
        tt = np.zeros((b, seq), np.int32)
        if pixel_dtype == jnp.uint8:
            pix = rng.integers(0, 256, (b, *manifest["pixel_shape"])
                               ).astype(np.uint8)
        else:
            pix = rng.normal(size=(b, *manifest["pixel_shape"])
                             ).astype(pixel_dtype.name)
        want = pred.predict(ids, mask, tt, pix)
        got = loaded.predict(ids, mask, tt, pix)
        np.testing.assert_allclose(got["probs"], want["probs"], atol=1e-6)
    return manifest


class ExportedPredictor(Predictor):
    """``serve.Predictor`` whose per-bucket programs come from disk.

    Inherits all the request plumbing (bucket choice, padding, chunking,
    padding-strip, latency_stats) but never traces the Flax model: ``_fn``
    deserializes the bucket's StableHLO artifact instead, so serving
    numerics are exactly the exported program's.
    """

    def __init__(self, cfg: D2RConfig, variables: Dict, manifest: Dict,
                 artifact_dir: str):
        super().__init__(cfg, variables,
                         batch_buckets=manifest["batch_buckets"],
                         seq_buckets=(manifest["seq_len"],),
                         quantize=manifest.get("quantize"))
        self.model = None  # the artifact replaces the traced model
        self.manifest = manifest
        self._dir = artifact_dir
        self._pixel_dtype = jnp.dtype(manifest["pixel_dtype"])

    def warmup(self, pixel_dtype=None) -> None:
        """Deserialize+compile every bucket. Defaults to the artifact's own
        pixel dtype (the manifest pins it) — the inherited float32 default
        would trip ``_fn``'s dtype guard on a uint8 artifact."""
        super().warmup(pixel_dtype=pixel_dtype if pixel_dtype is not None
                       else self._pixel_dtype)

    def _fn(self, b: int, l: int):
        key = (b, l)
        if key not in self._fns:
            from jax import export as jexp
            fname = self.manifest["files"][str(b)]
            with open(os.path.join(self._dir, fname), "rb") as f:
                exp = jexp.deserialize(bytearray(f.read()))
            call = jax.jit(exp.call)

            def fwd(variables, input_ids, attention_mask, token_type_ids,
                    pixel_values, _call=call):
                if pixel_values.dtype != self._pixel_dtype:
                    raise ValueError(
                        f"artifact was exported for pixel dtype "
                        f"{self._pixel_dtype.name}, got "
                        f"{pixel_values.dtype}; re-export with "
                        f"pixel_dtype={pixel_values.dtype} or convert the "
                        f"request")
                return _call(variables, input_ids, attention_mask,
                             token_type_ids, pixel_values)

            self._fns[key] = fwd
        return self._fns[key]


def load_exported(artifact_dir: str, variables: Dict) -> ExportedPredictor:
    """Open an ``export_predictor`` directory with a matching checkpoint."""
    with open(os.path.join(artifact_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("version") != _MANIFEST_VERSION:
        raise ValueError(
            f"unsupported export manifest version {manifest.get('version')} "
            f"in {artifact_dir} (this build reads version "
            f"{_MANIFEST_VERSION})")
    cfg = load_config_json(os.path.join(artifact_dir, _CONFIG))
    return ExportedPredictor(cfg, variables, manifest, artifact_dir)


def main(argv=None):
    """`d2r-export`: checkpoint -> deployable StableHLO serving artifact."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--load_path", required=True,
                    help="Orbax checkpoint dir (e.g. .../best_model)")
    ap.add_argument("--out_dir", required=True,
                    help="artifact directory to write")
    ap.add_argument("--config_json", default=None,
                    help="training-time config.json (default: auto-discover "
                         "inside/next to --load_path)")
    ap.add_argument("--batch_buckets", default="1,8,32")
    ap.add_argument("--pixel", default="uint8", choices=["uint8", "float32"])
    ap.add_argument("--platforms", default=None,
                    help="comma list to cross-lower, e.g. 'cpu,tpu' "
                         "(default: current backend only)")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="bake weight-only int8 serving into the artifact "
                         "(d2r_tpu/quant.py); the loader re-quantizes the "
                         "paired checkpoint per the manifest")
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--format", default="stablehlo",
                    choices=["stablehlo", "torch"],
                    help="'stablehlo': AOT serving artifact (default). "
                         "'torch': write <out_dir>/best_model.pth — a "
                         "reference-compatible state_dict that the PyTorch "
                         "reference loads with strict=True (utils/"
                         "export_torch.py; round-trip parity pinned by "
                         "tests/parity/test_export_torch.py)")
    args = ap.parse_args(argv)

    if args.device:
        jax.config.update("jax_platforms", args.device)

    from d2r_tpu.server import resolve_serve_config
    from d2r_tpu.train.checkpoint import restore_variables
    from d2r_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = resolve_serve_config(args.load_path, config_json=args.config_json)
    variables = restore_variables(args.load_path)

    if args.format == "torch":
        from d2r_tpu.utils.export_torch import save_reference_checkpoint
        os.makedirs(args.out_dir, exist_ok=True)
        path = os.path.join(args.out_dir, "best_model.pth")
        sd = save_reference_checkpoint(path, variables)
        print(json.dumps({"out_dir": args.out_dir, "format": "torch",
                          "file": path, "keys": len(sd)}))
        return
    manifest = export_predictor(
        cfg, variables, args.out_dir,
        batch_buckets=tuple(int(b) for b in args.batch_buckets.split(",")),
        pixel_dtype=jnp.uint8 if args.pixel == "uint8" else jnp.float32,
        platforms=(tuple(args.platforms.split(","))
                   if args.platforms else None),
        quantize=args.quantize)
    print(json.dumps({"out_dir": args.out_dir,
                      "buckets": manifest["batch_buckets"],
                      "platforms": manifest["platforms"],
                      "quantize": manifest["quantize"],
                      "self_check": "ok"}))


if __name__ == "__main__":
    main()
