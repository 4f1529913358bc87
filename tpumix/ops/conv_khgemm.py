"""kh-unrolled GEMM convolution: widen the MXU contraction for narrow layers.

The reference CNN's early/mid conv layers emit 16/32/48/64 output channels
(reference model_scalar_1s.py:211-215) — on a 128-lane MXU a direct conv
fills only 12-50 % of the output lanes, which is why the trunk averages
~22 TF/s while conv5 (128 channels) alone measures ~62 TF/s
(docs/PERF.md "per-layer analysis").

This implementation restructures a VALID conv so the matmul's output
dimension is ``kh * C_out`` instead of ``C_out``:

    partial[n, h, wo, kh*o] = window_cols[n, h, wo, kw*ci] @ W2[kw*ci, kh*o]
    out[n, ho, wo, o]       = sum_i partial[n, ho + i, wo, i, o]

The single matmul covers every kernel row at once (lane fill 160/240/448
instead of 32/48/64 for the reference's conv2/3/4), and the epilogue is a
cheap VPU shifted add.  The GEMM always requests f32 accumulation
(``preferred_element_type``) and the kh shifted adds run in f32 even when
inputs are bf16, so the only deviation from lax.conv is f32 summand
reassociation — the bf16 path no longer rounds kh partials before adding
(round-2 advisor finding); the result is cast back to the input dtype at
the end.

Scope: stride 1, dilation 1, VALID — exactly the reference trunk's conv2..5.
Strided/dilated layers (conv1) fall back to lax.conv; they are a rounding
error of the FLOPs.  Opt-in via ``ModelConfig.conv_impl="khgemm"``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def conv2d_valid_khgemm(x: jax.Array, w: jax.Array) -> jax.Array:
    """VALID convolution, stride 1, dilation 1.

    :param x: ``[N, H, W, C_in]`` (NHWC)
    :param w: ``[kh, kw, C_in, C_out]`` (HWIO)
    :return: ``[N, H-kh+1, W-kw+1, C_out]``
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1
    # width windows: [N, H, Wo, kw*Cin]
    cols = jnp.concatenate([x[:, :, j : j + Wo, :] for j in range(kw)], axis=-1)
    # weights: [kh, kw, Cin, Cout] -> [kw*Cin, kh*Cout]
    w2 = jnp.transpose(w, (1, 2, 0, 3)).reshape(kw * Cin, kh * Cout)
    # f32 MXU accumulation + f32 shifted adds regardless of input dtype (bf16
    # inputs would otherwise round each kh partial before summation)
    part = jnp.matmul(cols, w2, preferred_element_type=jnp.float32).reshape(
        N, H, Wo, kh, Cout
    )
    out = part[:, 0:Ho, :, 0]
    for i in range(1, kh):
        out = out + part[:, i : i + Ho, :, i]
    return out.astype(x.dtype)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    strides: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """VALID conv dispatch: khgemm for the stride-1/dilation-1 hot layers,
    lax.conv for the rest (conv1's stride 2 / Scalar2s's dilation 2)."""
    if strides == (1, 1) and dilation == (1, 1):
        return conv2d_valid_khgemm(x, w)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding="VALID",
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
