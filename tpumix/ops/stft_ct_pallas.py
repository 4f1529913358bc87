"""Fused Pallas TPU kernel for the Cooley-Tukey factorized STFT frontend.

Round-3 measured the two prior frontends at the mixing segment shape
([64, 4, 88200] -> dB features, pipelined): the naive-basis fused Pallas
kernel at ~18.7 ms (compute-bound: 0.46 TFLOP of DFT matmul x6 f32-precision
passes) and an XLA-level factorized DFT (`implementation="ct"`) at ~23 ms —
the 12x FLOP reduction eaten by HBM round-trips for the materialized
intermediates (transposes, conjugate-symmetry flips, twiddle products).

This kernel keeps the factorization's FLOP win AND the fusion's memory win:

    X[128*k1 + k2] = sum_p W_16^(p*k1) * W_2048^(p*k2)
                     * sum_n2 w[16*n2 + p] * x[16*n2 + p] * W_128^(n2*k2)

* **Stage 1 (MXU)** — per phase p, one ``[T, 128] @ [128, 256]`` dot against
  the windowed per-phase basis (re|im at all 128 inner bins k2): full
  128-deep contraction fill, ~1/12 the naive-basis MACs.  The phase-frame
  tensor ``[B, 16, T, 128]`` is prebuilt OUTSIDE the kernel by XLA (static
  slices + stack at copy bandwidth) — same bytes as the naive frame matrix
  but consumed in one pass; per-(batch, phase) blocks are self-contained so
  BlockSpecs need no halo and the kernel needs no sublane-offset slicing
  (the Mosaic limitation that shaped tpumix/ops/stft_pallas.py).
* **Stage 2 (VPU)** — twiddle: complex multiply by ``W_2048^(p*k2)``,
  broadcast ``[1, 128]`` rows from a ``[16, 128]`` operand.
* **Stage 3 (VPU, statically unrolled)** — the 16-point output DFT as
  scalar-weighted accumulations into 9 ``[T, 128]`` accumulator pairs
  (k1 = 0..8 covers all onesided bins: 9*128 = 1152 >= 1025); the
  ``W_16^(p*k1)`` factors are Python floats baked into the kernel, zero /
  +-one terms elided.  No transposes, no batched dots, no lane concats.
* **Epilogue fused** — |.| and ``20*log10(max(., amin))`` per accumulator,
  written to static 128-lane output slices in k1-major order so the
  flattened bin axis is already ``k = 128*k1 + k2``.

Numerics: f32 operands, f32 MXU accumulation at HIGHEST precision — each
bin sums 128 + 16 terms instead of the naive basis's 2048, so rounding is
*tighter* than both prior paths (tests/test_stft_ct_pallas.py bounds).

Reference contract parity: reference data/dataset.py:132-162 (torch.stft
n_fft=2048 / hann / center reflect -> abs -> amplitude_to_DB).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumix.config import FrontendConfig
from tpumix.ops.stft import _CT_N1, ct_applicable, ct_phase_frames

_LOG10_INV = 1.0 / math.log(10.0)


@functools.lru_cache(maxsize=8)
def _ct_kernel_bases_np(n_fft: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bases for the fused kernel (float64 build, float32 store).

    Returns ``(b1[N1, N2, 2*N2], tw_re[N1, N2], tw_im[N1, N2],
    c3[N1, K1u], s3[N1, K1u])`` — stage 1 emits ALL N2 inner bins directly
    (twice the minimal stage-1 MACs, still ~1/12 of naive) so the kernel
    never needs the conjugate-symmetry lane reversal.
    """
    n1v = _CT_N1
    n2v = n_fft // n1v
    k1u = n1v // 2 + 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft)
    wp = w.reshape(n2v, n1v).T  # [N1, N2] — w[N1*n2 + p]
    n2 = np.arange(n2v, dtype=np.float64)
    ang1 = 2.0 * np.pi * n2[:, None] * n2[None, :] / n2v  # [N2(n2), N2(k2)]
    b1 = np.concatenate(
        [wp[:, :, None] * np.cos(ang1)[None], wp[:, :, None] * -np.sin(ang1)[None]],
        axis=-1,
    )  # [N1, N2, 2*N2]
    p = np.arange(n1v, dtype=np.float64)
    angt = 2.0 * np.pi * p[:, None] * np.arange(n2v, dtype=np.float64)[None, :] / n_fft
    k1 = np.arange(k1u, dtype=np.float64)
    ang3 = 2.0 * np.pi * p[:, None] * k1[None, :] / n1v
    return (
        b1.astype(np.float32),
        np.cos(angt).astype(np.float32),
        -np.sin(angt).astype(np.float32),
        np.cos(ang3),  # kept float64: consumed as Python scalars
        np.sin(ang3),
    )


def _ct_kernel(f_ref, b1_ref, twre_ref, twim_ref, o_ref, *, n1v: int, n2v: int,
               k1u: int, c3: tuple, s3: tuple, amin: float, multiplier: float):
    """One batch-item grid step.

    f_ref:  [1, N1, T, N2]   phase frames
    b1:     [N1, N2, 2*N2]   per-phase windowed inner-DFT basis
    tw:     [N1, N2] x2      twiddle factors
    o_ref:  [1, T, K1u*N2]   dB features, bin axis k1-major
    """
    scale = multiplier * _LOG10_INV
    acc_re = [None] * k1u
    acc_im = [None] * k1u
    for p in range(n1v):
        a_p = jnp.dot(
            f_ref[0, p],
            b1_ref[p],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [T, 2*N2]
        re_p, im_p = a_p[:, :n2v], a_p[:, n2v:]
        twre = twre_ref[p : p + 1, :]  # [1, N2], broadcasts over T
        twim = twim_ref[p : p + 1, :]
        re2 = re_p * twre - im_p * twim
        im2 = re_p * twim + im_p * twre
        for k1 in range(k1u):
            c, s = c3[p][k1], s3[p][k1]
            # (re2 + i*im2) * (c - i*s): re += re2*c + im2*s; im += im2*c - re2*s
            dre = _scaled_add(re2, c, im2, s)
            dim = _scaled_add(im2, c, re2, -s)
            acc_re[k1] = dre if acc_re[k1] is None else acc_re[k1] + dre
            acc_im[k1] = dim if acc_im[k1] is None else acc_im[k1] + dim
    for k1 in range(k1u):
        mag2 = acc_re[k1] * acc_re[k1] + acc_im[k1] * acc_im[k1]
        mag = jnp.sqrt(mag2)
        o_ref[0, :, k1 * n2v : (k1 + 1) * n2v] = scale * jnp.log(
            jnp.maximum(mag, amin)
        )


def _scaled_add(a, ca: float, b, cb: float):
    """``a*ca + b*cb`` with exact-constant terms elided (W_16 factors hit
    0 / +-1 on the p=0 row, the k1=0 column and the k1=8 alternation)."""
    eps = 1e-12
    ta = None if abs(ca) < eps else (a if abs(ca - 1.0) < eps else (-a if abs(ca + 1.0) < eps else a * ca))
    tb = None if abs(cb) < eps else (b if abs(cb - 1.0) < eps else (-b if abs(cb + 1.0) < eps else b * cb))
    if ta is None and tb is None:
        return jnp.zeros_like(a)
    if ta is None:
        return tb
    if tb is None:
        return ta
    return ta + tb


def stft_features_ct_pallas_tm(
    x: jax.Array, cfg: Optional[FrontendConfig] = None
) -> jax.Array:
    """Fused factorized frontend, time-major output ``[..., T, bins]``.

    Same signature/contract as ``stft_features_pallas_tm`` (requires
    ``ct_applicable(cfg)``: n_fft % hop == 0, hop % 16 == 0, center=True).
    """
    cfg = cfg or FrontendConfig()
    if not ct_applicable(cfg):
        raise ValueError("ct_pallas frontend requires ct_applicable(cfg)")
    n_fft = cfg.n_fft
    n1v = _CT_N1
    n2v = n_fft // n1v
    k1u = n1v // 2 + 1
    bins = cfg.num_bins

    # phase decimation + framing (XLA, copy-bandwidth) shared with the XLA
    # "ct" path — both must frame identically
    frames_ph, lead, T = ct_phase_frames(x, cfg)
    B = frames_ph.shape[0]

    b1_np, twre_np, twim_np, c3_np, s3_np = _ct_kernel_bases_np(n_fft)
    b1 = jnp.asarray(b1_np)
    twre = jnp.asarray(twre_np)
    twim = jnp.asarray(twim_np)
    c3 = tuple(tuple(float(v) for v in row) for row in c3_np)
    s3 = tuple(tuple(float(v) for v in row) for row in s3_np)

    kernel = functools.partial(
        _ct_kernel, n1v=n1v, n2v=n2v, k1u=k1u, c3=c3, s3=s3,
        amin=cfg.amin, multiplier=cfg.db_multiplier,
    )

    from tpumix.utils.backend import is_tpu_backend

    interpret = not is_tpu_backend()
    bins_padded = k1u * n2v  # 1152 for n_fft=2048

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n1v, T, n2v), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, n2v, 2 * n2v), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, n2v), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, n2v), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, bins_padded), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, bins_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * n1v * n2v * n2v,
            bytes_accessed=4 * (B * n1v * T * n2v + n1v * n2v * 2 * n2v + B * T * bins_padded),
            transcendentals=B * T * bins_padded,
        ),
        interpret=interpret,
    )(frames_ph, b1, twre, twim)

    return out[:, :, :bins].reshape(*lead, T, bins)


from tpumix.ops.stft_pallas import make_tm_hybrid

#: Fused CT kernel forward, XLA-derived backward: drop-in differentiable
#: frontend (shared factory — see stft_pallas.make_tm_hybrid).
stft_features_ct_tm_hybrid = make_tm_hybrid(stft_features_ct_pallas_tm)
