"""Localhost multi-process "pod" launch helpers.

One place for the pieces the multi-host smoke tool
(``tools/multihost_smoke.py``) and the integration test
(``tests/test_multihost.py``) both need: a free coordinator port, the
subprocess environment for an N-virtual-CPU-device rank, and the tiny-
geometry training command line. Keeping them here means the multi-host CLI
contract (flag names, warmup requirements) is encoded exactly once — the
operator tool and the CI test cannot drift apart.

The reference has no multi-process story (SURVEY.md section 2.9); see
``parallel/distributed.py`` for the runtime these processes join.
"""

from __future__ import annotations

import os
import socket
import sys
from typing import Dict, List, Optional, Sequence

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def free_port() -> int:
    """An OS-assigned free TCP port for the jax.distributed coordinator."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def cpu_rank_env(local_devices: int,
                 base: Optional[Dict[str, str]] = None) -> Dict[str, str]:
    """Subprocess env for one localhost rank with ``local_devices`` virtual
    CPU chips. Drops ``JAX_PLATFORMS`` (the run itself passes --device cpu,
    which pins the platform past the axon plugin override)."""
    env = dict(base if base is not None else os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    return env


def tiny_train_cmd(paths: Dict[str, str], out_dir: str,
                   batch_size: int = 8,
                   extra: Sequence[str] = ()) -> List[str]:
    """The canonical tiny-geometry ``run.py`` command for CPU pod drives:
    tiny towers, seq 16, one epoch, float32 (cross-rank loss comparisons
    need bit-stable math), no Pallas. ``paths`` comes from
    ``data.dataset.write_fake_dataset``."""
    return [sys.executable, os.path.join(REPO, "run.py"),
            "--device", "cpu", "--bert_name", "tiny-bert",
            "--vit_name", "tiny-vit", "--embed_size", "64",
            "--num_head_IMRC", "4", "--hid_IMRC", "64", "--hid_router", "32",
            "--max_seq", "16", "--batch_size", str(batch_size),
            "--num_epochs", "1", "--lr", "3e-4",
            "--compute_dtype", "float32", "--no_pallas",
            "--num_workers", "2",
            "--train_json", paths["train"], "--dev_json", paths["dev"],
            "--test_json", paths["test"], "--img_dir", paths["img_dir"],
            "--save_path", out_dir] + list(extra)
