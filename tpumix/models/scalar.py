"""Scalar gain-prediction CNNs (the reference's flagship models).

Shared contract (reference models/model_scalar_1s.py:234-275,
model_scalar_2s.py:91-132): input stacked per-stem dB spectrograms
``x [B, 4, 1025, T]``; output ``(masked, gains)`` where ``gains[B, 4]`` holds
one scalar gain per stem and ``masked = sum_i gains_i * x_i`` is the predicted
mix spectrogram *in the dB domain* (reference quirk, preserved: training
multiplies scalar gains into dB values; inference reinterprets the same
scalars as dB gains via ``10**(0.5 g)``, inference_utils.py:128-129).

Architectures:
* ``MixingModelScalar1s`` — 5 ConvBlocks (4->16 k3 s2, 16->32 k5, 32->48 k5,
  48->64 k7, 64->128 k9) + 4 scalar heads; flattened head dim 10290 = 490*21
  at the pinned 87-frame input (model_scalar_1s.py:211-232).
* ``MixingModelScalar2s`` — identical except block 1 has dilation=2; flattened
  dim 30807 = 489*63 at 173 frames (model_scalar_2s.py:68-89).

TPU-first: NHWC internally, single fused forward under jit, gains returned as
one ``[B, 4]`` array (the reference's 4-tuple of ``[B, 1]`` is available via
``gains_as_tuple``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpumix.models.blocks import ConvBlock2d, ScalarHead
from tpumix.ops.gain import spectral_mix

NUM_STEMS = 4


def gains_as_tuple(gains: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """``[B, S] -> (m1..mS)`` each ``[B, 1]`` (reference return convention)."""
    return tuple(gains[:, i : i + 1] for i in range(gains.shape[1]))


class _ScalarModelBase(nn.Module):
    """Common trunk + heads; subclasses pin block-1 dilation.

    ``level_features=True`` (tpumix extension, NOT in the reference) feeds
    each gain head the per-stem mean dB of the raw input spectrograms
    alongside the conv features.  Mean dB shifts 1:1 with a stem's gain in
    dB, i.e. it is exactly the sufficient statistic for loudness
    rebalancing — which the BatchNorm-heavy conv trunk extracts only slowly
    (measured round 2: under the SELF-SUPERVISED objectives the
    reference-parity architecture collapses to near-constant gains, while
    under gain-label supervision it does learn — held-out 0.24 LU vs the
    level-aware variants' 0.17/0.16 with faster convergence).
    """

    block1_dilation: int = 1
    level_features: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # flax BN retained fraction; 0.10 = torch-0.90 parity (see ConvBlock2d)
    bn_momentum: float = 0.10
    # reference parity keeps dropout (p=0.2/0.3, model_scalar_1s.py:211-215).
    # Disable for infinite-stream training (the synthetic task): there is
    # nothing to regularise, and dropout's variance shift miscalibrates the
    # BN running stats that eval mode depends on (train/eval output gap)
    use_dropout: bool = True
    # conv lowering: "xla" (default) or "khgemm" — kh-unrolled GEMM for
    # narrow-channel MXU fill (blocks.KhGemmConv; params interchange freely)
    conv_impl: str = "xla"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """:param x: ``[B, num_stems, F, T]`` stacked dB spectrograms.
        :return: ``(masked [B, F, T], gains [B, num_stems])``."""
        num_stems = x.shape[1]
        # NCHW (reference layout) -> NHWC (TPU conv layout); stems become channels
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)

        block = lambda f, k, name, s=1, d=1, p=0.2: ConvBlock2d(  # noqa: E731
            features=f, kernel_size=k, strides=s, dilation=d,
            dropout_p=p if self.use_dropout else -1.0,
            axis_name=self.axis_name, dtype=self.dtype,
            bn_momentum=self.bn_momentum, conv_impl=self.conv_impl, name=name,
        )
        h = block(16, 3, "conv_b1", s=2, d=self.block1_dilation)(h, train=train)
        h = block(32, 5, "conv_b2")(h, train=train)
        h = block(48, 5, "conv_b3")(h, train=train)
        h = block(64, 7, "conv_b4")(h, train=train)
        h = block(128, 9, "conv_b5", p=0.3)(h, train=train)

        levels = None
        if self.level_features:
            # per-stem mean dB, scaled to O(1); shifts 1:1 with gain dB
            levels = (jnp.mean(x, axis=(2, 3)) * (1.0 / 20.0)).astype(self.dtype)

        gains = jnp.concatenate(
            [
                ScalarHead(dtype=self.dtype, name=f"head{i+1}")(h, extra=levels)
                for i in range(num_stems)
            ],
            axis=-1,
        )  # [B, num_stems]
        gains = gains.astype(jnp.float32)
        masked = spectral_mix(x.astype(jnp.float32), gains)
        return masked, gains


class MixingModelScalar1s(_ScalarModelBase):
    """1-second-chunk scalar model (87-frame input, hop 512)."""

    block1_dilation: int = 1


class MixingModelScalar1sL(_ScalarModelBase):
    """tpumix EXTENSION: Scalar1s trunk + level-aware gain heads — the
    low-latency companion of :class:`MixingModelScalar2sL` (1 s chunks =
    1 s algorithmic latency in the streaming mixer, tpumix/infer/streaming.py,
    vs 2 s for the flagship)."""

    block1_dilation: int = 1
    level_features: bool = True


class MixingModelScalar2s(_ScalarModelBase):
    """2-second-chunk scalar model (173-frame input, hop 512); block 1 uses
    dilation=2 (reference model_scalar_2s.py:68)."""

    block1_dilation: int = 2


class MixingModelScalar2sL(_ScalarModelBase):
    """tpumix EXTENSION (no reference counterpart): the Scalar2s architecture
    with level-aware gain heads (see ``_ScalarModelBase.level_features``).
    The flagship shipped-checkpoint model: on the synthetic mixing task it
    learns the engineer's per-stem loudness targets including the
    content-dependent rides (held-out 0.17 LU vs the parity architecture's
    0.24 under the same label-supervised recipe)."""

    block1_dilation: int = 2
    level_features: bool = True
