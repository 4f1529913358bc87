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


def _khgemm_impl(x: jax.Array, w: jax.Array) -> jax.Array:
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


@jax.custom_vjp
def conv2d_valid_khgemm(x: jax.Array, w: jax.Array) -> jax.Array:
    """VALID convolution, stride 1, dilation 1.

    :param x: ``[N, H, W, C_in]`` (NHWC)
    :param w: ``[kh, kw, C_in, C_out]`` (HWIO)
    :return: ``[N, H-kh+1, W-kw+1, C_out]``

    Carries a hand-derived VJP: XLA's autodiff of the width-window concat
    produces a scatter-add data gradient that made the khgemm backward SLOWER
    than lax.conv's (287 vs 235 ms/step at batch 48x2s, round-2 docs/PERF.md).
    The custom backward is dense:

    * ``dx`` = the transpose convolution expressed as another khgemm VALID
      conv — full-correlate the (kh-1, kw-1)-padded cotangent with the
      spatially flipped, channel-transposed kernel;
    * ``dw`` = one MXU GEMM per kernel row contracting the (batch, H, W)
      axes of the rebuilt width windows against the cotangent.
    """
    return _khgemm_impl(x, w)


def _khgemm_fwd(x, w):
    return _khgemm_impl(x, w), (x, w)


def _khgemm_bwd(res, g):
    x, w = res
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1

    # dx: VALID khgemm conv of the zero-padded cotangent with the 180deg-
    # rotated, in/out-channel-swapped kernel (the dense transpose conv)
    gp = jnp.pad(g, ((0, 0), (kh - 1, kh - 1), (kw - 1, kw - 1), (0, 0)))
    w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # [kh, kw, Cout, Cin]
    dx = _khgemm_impl(gp, w_flip)

    # dw[i, j, ci, co] = sum_{n,h,w} x[n, h+i, w+j, ci] * g[n, h, w, co]:
    # per kernel row, one GEMM over the flattened (n, h, w) contraction
    dws = []
    for i in range(kh):
        xi = x[:, i : i + Ho]
        cols_i = jnp.concatenate(
            [xi[:, :, j : j + Wo, :] for j in range(kw)], axis=-1
        )  # [N, Ho, Wo, kw*Cin]
        dws.append(
            jax.lax.dot_general(
                cols_i.reshape(-1, kw * Cin),
                g.reshape(-1, Cout),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [kw*Cin, Cout]
    dw = jnp.stack(dws).reshape(kh, kw, Cin, Cout)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv2d_valid_khgemm.defvjp(_khgemm_fwd, _khgemm_bwd)


def _lax_conv_valid(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@jax.custom_vjp
def conv2d_valid_khgemm_hybrid(x: jax.Array, w: jax.Array) -> jax.Array:
    """khgemm FORWARD with lax.conv's own backward (``conv_impl="khgemm_hybrid"``).

    The round-3 close-out measured the hand-derived khgemm VJP at 338 ms/step
    vs lax.conv's 149 (docs/PERF.md) — the *backward* is where khgemm loses.
    This variant takes the best of each: the widened-lane GEMM forward (the
    measured forward winner) while the cotangent flows through XLA's fused
    ``conv_general_dilated`` transpose kernels, valid because the two
    forwards compute the same function to f32 reassociation.
    """
    return _khgemm_impl(x, w)


def _hybrid_fwd(x, w):
    return _khgemm_impl(x, w), (x, w)


def _hybrid_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(_lax_conv_valid, x, w)
    return vjp(g)


conv2d_valid_khgemm_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)

# the W8A8 variant shares the khgemm layout; implementation + scheme notes
# live in tpumix/ops/conv_int8.py (re-exported here as the khgemm family's
# third lowering)
from tpumix.ops.conv_int8 import conv2d_valid_khgemm_int8  # noqa: E402


def conv2d(
    x: jax.Array,
    w: jax.Array,
    strides: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
    vjp: str = "khgemm",
) -> jax.Array:
    """VALID conv dispatch: khgemm for the stride-1/dilation-1 hot layers,
    lax.conv for the rest (conv1's stride 2 / Scalar2s's dilation 2).
    ``vjp="xla"`` selects the hybrid (khgemm forward, lax.conv backward);
    ``vjp="int8"`` the inference-only s8 MXU path (tpumix/ops/conv_int8.py)."""
    if strides == (1, 1) and dilation == (1, 1):
        if vjp == "int8":
            return conv2d_valid_khgemm_int8(x, w)
        if vjp == "xla":
            return conv2d_valid_khgemm_hybrid(x, w)
        return conv2d_valid_khgemm(x, w)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding="VALID",
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
