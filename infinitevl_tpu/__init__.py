"""InfiniteVL-TPU: a TPU-native (JAX/XLA/Pallas) framework providing the
capabilities of hustvl/InfiniteVL — hybrid SWA + Gated-DeltaNet
vision-language models with constant-memory unlimited-context streaming."""

from .config import (
    InfiniteVLConfig,
    TextConfig,
    VisionConfig,
    from_hf_dict,
    from_hf_json,
    infinitevl_3b,
    tiny_config,
)

__version__ = "0.1.0"
