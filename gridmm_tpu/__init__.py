"""gridmm-tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision-and-language navigation
framework with the capabilities of GridMM (ICCV 2023, arXiv:2307.12907)."""

__version__ = "0.1.0"

from gridmm_tpu.config import (  # noqa: F401
    GridConfig,
    GridMMConfig,
    MeshConfig,
    ModelConfig,
    NavigatorShapes,
    TrainConfig,
    r2r_ce_config,
    r2r_config,
    reverie_config,
    rxr_config,
)
