"""Test harness: force an 8-device virtual CPU mesh BEFORE jax imports.

This simulates the v5e-8 slice without hardware (SURVEY.md section 4); the
driver separately dry-run-compiles the multi-chip path via __graft_entry__.
"""

import os

# Force CPU even when the shell exports JAX_PLATFORMS (the 'axon' TPU plugin
# on this box overrides the env var, so set the config flag too) — unit tests
# must be hardware-independent.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_PLATFORM_NAME", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite recompiles the same tiny-config
# train/eval programs dozens of times across files and processes; on this
# 1-core host that dominates wall time. XLA:CPU AOT caching works here (the
# multichip dryrun loads its programs from this cache) and caching is
# correctness-neutral — entries key on program+flags.
from d2r_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (full-model jits on the 1-core CPU host); "
        "deselect for quick iteration with -m 'not slow'")
