#!/usr/bin/env python
"""Run the two TPU-only Pallas kernel tests on the REAL chip.

The CPU test suite (and therefore the release gate) must skip them —
`tests/test_flash_attention.py::TestOnTPU` needs the real Mosaic compiler
and `tests/test_fused_attention_small.py::test_dropout_on_tpu` needs the
in-kernel TPU PRNG, neither of which has a CPU interpreter lowering. This
tool executes the SAME test functions (imported from the test modules, no
re-implementation) on the tunnelled v5e and records the result, so the
gate's "2 skipped" line has a matching green artifact
(PALLAS_TPU_CHECK.json).

Run from the repo root with the default shell env (JAX_PLATFORMS=axon):
  python tools/pallas_tpu_check.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax

    from d2r_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    payload = {"metric": "pallas_tpu_check", "backend": backend,
               "devices": str(jax.devices()), "results": {}, "pass": False}
    if backend != "tpu":
        payload["error"] = "not on TPU (tunnel down?)"
        print(json.dumps(payload))
        return 1

    from tests.test_flash_attention import TestOnTPU
    from tests.test_fused_attention_small import test_dropout_on_tpu

    for name, fn in (
            ("flash_mosaic_matches_xla",
             TestOnTPU().test_mosaic_kernel_matches_xla),
            ("fused_small_in_kernel_dropout", test_dropout_on_tpu)):
        t0 = time.monotonic()
        fn()  # raises on mismatch
        payload["results"][name] = {"ok": True,
                                    "wall_s": round(time.monotonic() - t0, 1)}
        print(f"{name}: ok [{payload['results'][name]['wall_s']}s]",
              flush=True)

    payload["pass"] = True
    print(json.dumps(payload))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "PALLAS_TPU_CHECK.json"), "w") as f:
        json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
