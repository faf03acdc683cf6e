"""d2r_tpu: a TPU-native JAX/Flax/Pallas rebuild of the D2R dual-branch
dynamic-routing multimodal sentiment framework (EMNLP 2024).

Reference implementation studied at /root/reference (SorF520/D2R, PyTorch);
this package is a ground-up TPU-first design — see SURVEY.md for the layer
map and docs/PARITY.md for intentional deviations.
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml

from d2r_tpu.config import (  # noqa: F401
    D2RConfig,
    TextEncoderConfig,
    VisionEncoderConfig,
    tiny_test_config,
)
