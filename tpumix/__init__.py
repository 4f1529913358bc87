"""tpumix — a TPU-native (JAX / XLA / Pallas / pjit) framework for learned
automatic multitrack mixing.

Capability parity target: apelykh/deep-audio-mixer (see SURVEY.md), re-designed
TPU-first: fused STFT->dB frontend, Flax gain-prediction CNNs, one-XLA-program
full-song batched mixing, pjit/shard_map data+sequence parallelism, Orbax
checkpointing, and a first-principles BS.1770 loudness evaluation stack.
"""

__version__ = "0.1.0"

from tpumix.config import (  # noqa: F401
    DataConfig,
    FrontendConfig,
    MixConfig,
    ModelConfig,
    TrainConfig,
    preset,
)
