"""tpumix — a TPU-native (JAX / XLA / Pallas / pjit) framework for learned
automatic multitrack mixing.

Capability parity target: apelykh/deep-audio-mixer (see SURVEY.md), re-designed
TPU-first: fused STFT->dB frontend, Flax gain-prediction CNNs, one-XLA-program
full-song batched mixing, pjit/shard_map data+sequence parallelism, Orbax
checkpointing, and a first-principles BS.1770 loudness evaluation stack.
"""

__version__ = "0.1.0"


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache unless already configured.
    First XLA compiles through the remote-compile tunnel take minutes; the
    cache turns warm starts into sub-second loads."""
    import os

    # only for remote-compile TPU backends (axon tunnel): that's where cold
    # compiles cost minutes.  CPU AOT results are machine-feature-sensitive
    # and compile fast anyway — caching them risks SIGILL on feature drift.
    if "axon" not in os.environ.get("JAX_PLATFORMS", "") and "tpu" not in os.environ.get(
        "JAX_PLATFORMS", ""
    ):
        return
    try:
        import jax

        # a script may have overridden the platform to cpu (tests do) even
        # though the env still says axon — never cache CPU AOT executables
        # (they are machine-feature-sensitive)
        if (jax.config.jax_platforms or "").startswith("cpu"):
            return
        if jax.config.jax_compilation_cache_dir is None:
            cache = os.environ.get(
                "TPUMIX_COMPILE_CACHE",
                os.path.join(os.path.expanduser("~"), ".cache", "jax_comp"),
            )
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimisation only
        pass


_setup_compilation_cache()

from tpumix.config import (  # noqa: F401
    DataConfig,
    FrontendConfig,
    MixConfig,
    ModelConfig,
    TrainConfig,
    preset,
)
