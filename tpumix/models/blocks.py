"""Shared Flax building blocks for the gain-prediction models.

Parity contracts (numerics, not code): the reference ConvBlock2d is
Conv2d(padding=0) -> BatchNorm2d(momentum=0.90, eps=0.001) -> ReLU ->
Dropout(train-only) (reference models/model_scalar_1s.py:151-190, duplicated
in model_scalar_2s.py:9-47); the ResNet BasicBlock is the CIFAR-style
conv-bn-relu-conv-bn + projection shortcut (model_resnet.py:6-28).

TPU-first design notes:
* NHWC layout throughout ([batch, freq, frames, channels]) — XLA's native conv
  layout on TPU; the public model API still accepts the reference's
  [B, stems, F, T] and transposes once at the boundary.
* torch BatchNorm ``momentum=0.90`` means ``running = 0.1*running + 0.9*batch``;
  Flax momentum is the *retained* fraction, so the equivalent here is
  ``momentum=0.10``.
* Optional ``axis_name`` syncs batch statistics across a data-parallel mesh
  axis (no torch equivalent — the reference is single-device).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

# torch BatchNorm2d(momentum=0.90) -> flax retained fraction 0.10
BN_MOMENTUM = 0.10
BN_EPS = 1e-3

Dtype = Any


def _pair(k: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(k, int):
        return (k, k)
    return tuple(k)  # type: ignore[return-value]


class KhGemmConv(nn.Module):
    """Drop-in nn.Conv replacement (VALID padding) backed by the kh-unrolled
    GEMM lowering (tpumix/ops/conv_khgemm.py) for narrow-channel MXU fill.

    Parameter names/shapes are IDENTICAL to flax nn.Conv ("kernel" HWIO,
    "bias"), so checkpoints interchange freely between implementations.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    kernel_dilation: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32
    # "khgemm" = hand-derived dense VJP; "xla" = hybrid (khgemm forward,
    # lax.conv backward — the measured training winner, docs/PERF.md)
    vjp: str = "khgemm"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from tpumix.ops.conv_khgemm import conv2d

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        y = conv2d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=self.strides,
            dilation=self.kernel_dilation,
            vjp=self.vjp,
        )
        return y + bias.astype(self.dtype)


def fused_min_cout() -> int:
    """Output-channel threshold splitting the two fused Pallas conv-block
    variants under ``conv_impl="pallas"``: blocks with ``Cout >=`` this use
    the per-kernel-row-dot kernel (full MXU lanes at 128 channels — conv5);
    narrower blocks use the khgemm-packed variant whose ``kh*Cout`` output
    packing fills the lanes the reference's 32/48/64-channel layers leave
    idle (tpumix/ops/conv_block_pallas.py cost model; default pinned by the
    docs/PERF.md segment measurements)."""
    return int(os.environ.get("TPUMIX_FUSED_MIN_COUT", "128"))


def fused_narrow_enabled() -> bool:
    """Gate for routing narrow (< fused_min_cout) eligible blocks to the
    khgemm-packed fused kernel; ``TPUMIX_FUSED_NARROW=0`` falls back to the
    XLA khgemm lowering for those blocks."""
    return os.environ.get("TPUMIX_FUSED_NARROW", "1") != "0"


class _ConvParams(nn.Module):
    """Parameter twin of ``nn.Conv(name='conv')``: declares the identical
    {kernel, bias} tree without executing a convolution, so the fused Pallas
    path interchanges checkpoints freely with the nn.Conv/KhGemmConv paths."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        return kernel, bias


class _BNParams(nn.Module):
    """Parameter twin of ``nn.BatchNorm(name='bn')``: identical params
    {scale, bias} and batch_stats {mean, var} trees, consumed by the
    inference-time BN fold instead of a separate normalisation pass."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones_init(), (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class ConvBlock2d(nn.Module):
    """Conv2d(VALID) -> BatchNorm -> ReLU -> Dropout(train-only)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: int = 1
    dilation: int = 1
    dropout_p: float = -1.0
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    # flax retained fraction; 0.10 = torch momentum 0.90 parity.  The parity
    # value makes running stats track the LAST batch almost exclusively —
    # fine for the reference's large-epoch regime, but eval-mode outputs get
    # noisy on short runs; raise towards 0.99 for stable running statistics
    # (ModelConfig.bn_momentum threads this through the registry).
    bn_momentum: float = BN_MOMENTUM
    # "xla" = lax.conv (default); "khgemm" = kh-unrolled GEMM lowering for
    # narrow-channel MXU fill (tpumix/ops/conv_khgemm.py; params identical);
    # "pallas" = fused conv+BN+ReLU Pallas kernel for wide inference blocks
    # (tpumix/ops/conv_block_pallas.py; >= fused_min_cout() channels, stride
    # 1/dilation 1, f32, eval mode — everything else falls to khgemm);
    # "khgemm_int8" = dynamic-W8A8 s8 MXU compute with f32 epilogue,
    # inference-ONLY (tpumix/ops/conv_int8.py; train=True raises — round-to-
    # nearest has no useful gradient, and silently swapping numerics under a
    # trainer would be a quality trap).  All variants declare IDENTICAL
    # parameter trees.
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if (
            self.conv_impl == "pallas"
            and not train
            and self.strides == 1
            and self.dilation == 1
            and self.dtype == jnp.float32
            and (self.features >= fused_min_cout() or fused_narrow_enabled())
        ):
            from tpumix.ops import conv_block_pallas as cbp

            # wide blocks (conv5) fill the MXU with one dot per kernel row;
            # narrow blocks use the khgemm lane packing with part in VMEM.
            # v2 (default) reads two adjacent tiles instead of materialised
            # halos; TPUMIX_FUSED_V=1 selects the haloed-tile kernels.
            from tpumix.ops.conv_block_pallas import fold_batchnorm

            wide = self.features >= fused_min_cout()
            if os.environ.get("TPUMIX_FUSED_V", "2") == "1":
                fused = cbp.conv_block_fused if wide else cbp.conv_block_fused_khpack
            else:
                fused = (
                    cbp.conv_block_fused_v2 if wide else cbp.conv_block_fused_khpack_v2
                )
            kernel, conv_bias = _ConvParams(
                features=self.features, kernel_size=_pair(self.kernel_size), name="conv"
            )(x.shape[-1])
            gamma, beta, mean, var = _BNParams(name="bn")(self.features)
            s, t = fold_batchnorm(conv_bias, gamma, beta, mean, var, BN_EPS)
            # conv + BN + ReLU in one VMEM-resident pass; dropout is an
            # eval-mode no-op
            return fused(x, kernel, s, t)
        if self.conv_impl in ("khgemm", "khgemm_hybrid", "pallas", "khgemm_int8"):
            if self.conv_impl == "khgemm_int8":
                if train:
                    raise ValueError(
                        "conv_impl='khgemm_int8' is inference-only (round-to-"
                        "nearest has no useful gradient); train with 'xla'/"
                        "'khgemm_hybrid' and switch impls at eval time — the "
                        "parameter trees are identical"
                    )
                vjp = "int8"
            else:
                vjp = "xla" if self.conv_impl == "khgemm_hybrid" else "khgemm"
            x = KhGemmConv(
                features=self.features,
                kernel_size=_pair(self.kernel_size),
                strides=(self.strides, self.strides),
                kernel_dilation=(self.dilation, self.dilation),
                dtype=self.dtype,
                vjp=vjp,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=_pair(self.kernel_size),
                strides=(self.strides, self.strides),
                kernel_dilation=(self.dilation, self.dilation),
                padding="VALID",
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=BN_EPS,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = nn.relu(x)
        if self.dropout_p > 0:
            x = nn.Dropout(rate=self.dropout_p, deterministic=not train)(x)
        return x


class ScalarHead(nn.Module):
    """Per-stem gain head: Conv 1x1 (C->1) -> ReLU -> flatten -> Dense(1).

    Matches the reference head structure (model_scalar_1s.py:222-232,244-258).
    With a single output channel, NHWC flatten of [B, H, W, 1] and torch's NCHW
    flatten of [B, 1, H, W] enumerate the same H*W order, so checkpoint
    conversion is a pure transpose-free copy for the Dense kernel.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, extra: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``extra [B, K]`` (optional): side features concatenated after the
        flatten, ahead of the Dense — used by the tpumix level-aware model
        variants (no effect on reference-parity models, which pass None)."""
        h = nn.Conv(features=1, kernel_size=(1, 1), dtype=self.dtype, name="conv")(x)
        h = nn.relu(h)
        h = h.reshape((h.shape[0], -1))
        if extra is not None:
            h = jnp.concatenate([h, extra.astype(h.dtype)], axis=-1)
        return nn.Dense(features=1, dtype=self.dtype, name="fc")(h)  # [B, 1]


class BasicBlock(nn.Module):
    """CIFAR-style residual block (reference model_resnet.py:6-28).

    conv3x3(stride)->bn->relu->conv3x3->bn (+ 1x1 projection shortcut when
    shape changes) -> relu.  Paddings are EXPLICIT, not SAME: for stride-2
    convs on even spatial extents XLA's SAME pads (0, 1) while torch's
    k3/s2/p1 pads (1, 1), which shifts every window by one sample — the
    shapes match but activations diverge from the torch reference.  Explicit
    ((1, 1), (1, 1)) for k3 and ((0, 0), (0, 0)) for the k1 shortcut
    reproduce torch's window alignment exactly (numerics parity, not just
    shape parity).
    """

    features: int
    strides: int = 1
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        def bn(name: str):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d default momentum=0.1
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
                name=name,
            )

        out = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = bn("bn2")(out)

        shortcut = x
        if self.strides != 1 or x.shape[-1] != self.features:
            shortcut = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                padding=((0, 0), (0, 0)), use_bias=False, dtype=self.dtype,
                name="shortcut_conv",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)

        return nn.relu(out + shortcut)


class Bottleneck(nn.Module):
    """Bottleneck residual block (reference model_resnet.py:31-56; defined but
    unused by the shipped ResNet18 — provided for parity/completeness)."""

    features: int
    strides: int = 1
    expansion: int = 4
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        def bn(name: str):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=self.dtype,
                name=name,
            )

        wide = self.features * self.expansion
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(wide, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)

        shortcut = x
        if self.strides != 1 or x.shape[-1] != wide:
            shortcut = nn.Conv(
                wide, (1, 1), strides=(self.strides, self.strides),
                padding=((0, 0), (0, 0)), use_bias=False, dtype=self.dtype,
                name="shortcut_conv",
            )(x)
            shortcut = bn("shortcut_bn")(shortcut)

        return nn.relu(out + shortcut)
