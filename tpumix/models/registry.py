"""Model registry: preset name -> constructed Flax module.

``compute_dtype="bfloat16"`` runs the conv trunk in bf16 on the MXU.  Where
it pays (measured, docs/PERF.md): TRAINING — the lax.conv fwd+bwd step is
~1.13x faster at identical converged quality (0.15 vs 0.14 LU on the
flagship lstsq recipe; params/opt/BN stats stay f32, so checkpoints
interchange).  Where it does NOT: inference — khgemm's f32 path already
sits at the dot roofline (1199 bf16 vs 1202 f32 audio-s/s resident), and
gains deviate by the bf16 mantissa floor (~0.4 absolute on +/-100 dB
feature values entering conv 1) — keep f32 for reference-conformance runs
(the heads always accumulate and emit float32 either way).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpumix.config import ModelConfig
from tpumix.models.resnet import GainResNet
from tpumix.models.scalar import (
    MixingModelScalar1s,
    MixingModelScalar1sL,
    MixingModelScalar2s,
    MixingModelScalar2sL,
)


def build_model(cfg: ModelConfig, for_training: bool = False):
    """``for_training`` steers the conv_impl="auto" resolution: khgemm's
    widened GEMM wins the forward pass on the MXU (975 vs 672 audio-s/s on
    the fused mixing pipeline) but every khgemm-forward training variant
    loses (ms/step pipelined at batch 48x2s: lax.conv 149.9, khgemm forward
    + lax.conv backward 197.2, khgemm + hand-derived dense VJP 339.3 —
    docs/PERF.md round-3 close-outs), so auto = khgemm only for TPU
    inference."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    conv_impl = cfg.conv_impl
    if conv_impl == "khgemm_int8" and for_training:
        raise ValueError(
            "conv_impl='khgemm_int8' is inference-only — the W8A8 lowering "
            "has no useful gradient (round-to-nearest).  Train with "
            "conv_impl='auto' and switch to khgemm_int8 at eval time; the "
            "parameter trees are identical."
        )
    if conv_impl == "auto":
        from tpumix.utils.backend import is_tpu_backend

        conv_impl = "khgemm" if (is_tpu_backend() and not for_training) else "xla"
    kw = dict(dtype=dtype, bn_momentum=cfg.bn_momentum, use_dropout=cfg.use_dropout,
              conv_impl=conv_impl)
    builders = {
        "scalar1s": lambda: MixingModelScalar1s(**kw),
        "scalar1sL": lambda: MixingModelScalar1sL(**kw),
        "scalar2s": lambda: MixingModelScalar2s(**kw),
        "scalar2sL": lambda: MixingModelScalar2sL(**kw),
        # GainResNet keeps torch-default BN momentum internally (blocks.py)
        "resnet18": lambda: GainResNet(dtype=dtype),
    }
    if cfg.name not in builders:
        raise ValueError(f"unknown model {cfg.name!r}; have {sorted(builders)}")
    return builders[cfg.name]()


def example_feature_shape(cfg: ModelConfig, batch: int = 1):
    fe = cfg.frontend()
    return (batch, cfg.num_stems, fe.num_bins, cfg.num_frames)
