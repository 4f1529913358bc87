"""int8 MXU compute for the inference conv trunk (``conv_impl="int8"``).

The khgemm-f32 trunk sits at its dot roofline (docs/PERF.md per-segment
table: the trunk is ~84 of 94 ms/segment, conv5 measured 61.9 TF/s f32).
The one untried compute lever on the MXU is int8: TPU systolic arrays run
s8 x s8 -> s32 dots at a multiple of the f32 rate, so IF quantisation noise
stays inside the mixing-gain budget (gain MAE <= 1e-3 vs the f32 path,
the same budget the khgemm and Pallas paths are held to in
tests/test_infer.py), the trunk's roofline moves.

Scheme — dynamic activation / static-per-column weight quantisation on the
khgemm layout (tpumix/ops/conv_khgemm.py):

* weights ``[kh, kw, Cin, Cout] -> w2 [kw*Cin, kh, Cout]``; one symmetric
  scale per (kernel-row, out-channel) pair — strictly finer than
  per-out-channel — ``w_q = round(w2 / colscale)`` in int8;
* activations: one symmetric scale per receptive-field *window*, computed
  as a kw-wide sliding max over the per-pixel channel max (VPU, dynamic —
  no calibration pass, and no f32 window matrix is ever materialised: each
  width-slice quantises straight into the int8 concat);
* kh s8 GEMMs (one per kernel row, int8 rows sliced before the
  contraction) with ``preferred_element_type=int32`` — exact integer
  accumulation, no rounding inside the contraction — each followed by an
  f32 dequant ``part_i32 * rowscale * colscale`` and accumulated in f32.

Inference-only: there is no custom VJP (round-to-nearest has zero gradient
almost everywhere); ``ConvBlock2d`` and ``build_model`` REJECT
``khgemm_int8`` for training (``ValueError``) — switch ``conv_impl`` at
eval/export time instead of training through a straight-through estimator
nobody validated.  Scope mirrors khgemm: stride 1, dilation 1,
VALID — the reference trunk's conv2..5 (reference
models/model_scalar_1s.py:211-232); conv1 (stride 2) and the Scalar2s
dilated block stay f32 lax.conv (a rounding error of the FLOPs).

The adopt-or-close-out decision lives in docs/PERF.md ("int8 compute
study"): measured segment time vs the khgemm-f32 default, plus the
trained-checkpoint gain deviation vs the 1e-3 budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# symmetric int8 range; scales are clamped so all-zero rows/columns stay
# finite (they quantise to exact zeros either way)
_QMAX = 127.0
_EPS = 1e-30


def _window_row_scales(x: jax.Array, kw: int, Wo: int) -> jax.Array:
    """Per-window symmetric int8 scales WITHOUT materialising the window
    matrix: ``scale[n, h, wo] = max_{j<kw, c} |x[n, h, wo+j, c]| / 127``.

    The f32 window matrix ``cols [N, H, Wo, kw*Cin]`` is the dominant
    intermediate of the khgemm layout (it OOMed HBM at the production
    64-chunk segment when both the f32 cols and its int8 copy were live:
    17.58G > 15.75G on v5e).  A per-pixel channel max ``m [N, H, W]``
    followed by a kw-wide sliding max gives the identical per-window scale
    at a rounding error of the memory.
    """
    m = jnp.max(jnp.abs(x), axis=-1)  # [N, H, W]
    scale = m[:, :, 0:Wo]
    for j in range(1, kw):
        scale = jnp.maximum(scale, m[:, :, j : j + Wo])
    return jnp.maximum(scale / _QMAX, _EPS)[..., None]  # [N, H, Wo, 1]


def quantize_weights(w: jax.Array):
    """Static per-(kernel-row, out-channel) int8 quantisation on the khgemm
    weight layout.

    :param w: ``[kh, kw, Cin, Cout]`` HWIO f32.
    :return: ``(w_q [kw*Cin, kh, Cout] int8, colscale [kh, Cout] f32)``.
    """
    kh, kw, cin, cout = w.shape
    w2 = jnp.transpose(w, (1, 2, 0, 3)).reshape(kw * cin, kh, cout)
    colscale = jnp.maximum(jnp.max(jnp.abs(w2), axis=0) / _QMAX, _EPS)
    w_q = jnp.clip(jnp.round(w2 / colscale), -_QMAX, _QMAX).astype(jnp.int8)
    return w_q, colscale


def conv2d_valid_khgemm_int8(x: jax.Array, w: jax.Array) -> jax.Array:
    """VALID conv, stride 1 / dilation 1, s8 MXU compute with f32 epilogue.

    :param x: ``[N, H, W, C_in]`` (NHWC) f32
    :param w: ``[kh, kw, C_in, C_out]`` (HWIO) f32
    :return: ``[N, H-kh+1, W-kw+1, C_out]`` f32

    Numerics: the integer contraction is exact; all error comes from the two
    round-to-nearest steps, bounded per element by half an LSB of each scale.
    Row scales adapt to each window's dynamic range, so quiet regions keep
    relative precision instead of being crushed by a tensor-wide scale.
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    Ho, Wo = H - kh + 1, W - kw + 1

    rowscale = _window_row_scales(x, kw, Wo)  # [N, H, Wo, 1]
    # quantise each width-slice straight into the int8 window matrix — the
    # divide/round/clip fuse into the concat producer, so the only large
    # intermediates are cols_q (int8, 1/4 of khgemm's f32 cols) and the s32
    # partial; rowscale is indexed by the OUTPUT window position wo, making
    # this bit-identical to quantising a materialised f32 cols row-wise
    cols_q = jnp.concatenate(
        [
            jnp.clip(jnp.round(x[:, :, j : j + Wo, :] / rowscale), -_QMAX, _QMAX).astype(
                jnp.int8
            )
            for j in range(kw)
        ],
        axis=-1,
    )  # [N, H, Wo, kw*Cin] s8
    w_q, colscale = quantize_weights(w)  # [kw*Cin, kh, Cout] s8, [kh, Cout]

    # one GEMM per kernel row, int8 rows sliced BEFORE the contraction.  The
    # packed single-GEMM form (khgemm's lane-fill trick) emits a
    # [N, H, Wo, kh*Cout] partial that must be dequantised to f32 before the
    # shifted adds — at the production 64-chunk segment that is 2 x ~8.8 GB
    # live for conv5 (the f32 partial plus XLA's layout copy), which OOMs
    # 16G HBM.  Splitting by kernel row caps the partial at
    # [N, Ho, Wo, Cout], skips the (H - Ho) wasted GEMM rows, and on int8
    # the MXU's native 128-lane tile means lane packing buys nothing the
    # 4x s8 data rate doesn't already cover.
    out = None
    for i in range(kh):
        part = jax.lax.dot_general(
            cols_q[:, i : i + Ho],
            w_q[:, i],
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [N, Ho, Wo, Cout] s32, exact
        term = part.astype(jnp.float32) * rowscale[:, i : i + Ho] * colscale[i]
        out = term if out is None else out + term
    return out.astype(x.dtype)
