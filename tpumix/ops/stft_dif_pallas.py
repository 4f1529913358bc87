"""Fused Pallas TPU kernel: decimation-in-FREQUENCY factorized STFT frontend.

Round-3 measured the decimation-in-time factorized kernel
(``implementation="ct_pallas"``, tpumix/ops/stft_ct_pallas.py) at 14.3 ms per
mixing segment — and found HALF of it (6.9 ms) is the XLA *prebuild* of the
phase-frame tensor: DIT decimates the INPUT (``n = 16*n2 + p``), which forces
a strided phase transpose + overlap concat through HBM before the kernel ever
runs (benchmarks/frontend_fold_decompose.py).

This kernel flips the factorization to decimation-in-frequency:

    n = 128*n1 + n2   (n1 in [0,16), n2 in [0,128) — frame-CONTIGUOUS blocks)
    k = 16*k2  + k1   (k1 = k mod 16)

    y_k1[n2]  = sum_n1 (w*f)[128*n1 + n2] * W_16^(n1*k1)     (VPU, input side)
    z_k1      = y_k1 * W_2048^(k1*n2)                        (VPU twiddle)
    X[16*k2+k1] = sum_n2 z_k1[n2] * W_128^(n2*k2)            (MXU, 128-deep)

so the INPUT side needs only contiguous 128-lane blocks of each frame:

* the kernel consumes the same ``[B, T+R-1, hop]`` row operand as the
  naive-basis kernel (tpumix/ops/stft_pallas.py) — frame t's n1-th block is
  ``rows[t + (128*n1)//hop, (128*n1)%hop : +128]``, a static sublane-offset
  slice plus a 128-aligned lane slice, both proven Mosaic-clean there.  NO
  phase transpose, NO frame tensor in HBM: operand prep is pad + free
  reshape (~90 MB vs DIT's ~450 MB of prebuild traffic).
* stage A is the DIT kernel's output-side 16-point DFT moved to the input
  side.  Two formulations: ``stage_a="direct"`` (statically unrolled
  scalar-weighted accumulations, zero/+-1 terms elided, conjugate symmetry
  halves it: real input => y_{16-k1} = conj(y_k1)) and ``stage_a="r2"``
  (default: recursive real-input radix-2 FFT16, ~3x fewer tile ops —
  measured a marginal ~0.5 ms win, docs/PERF.md round-3 close-out).
* stage C regains the full 128-deep MXU contraction per k1 (4 dots
  ``[T,128] @ [128,128]``; only k2 < 65 columns are non-zero — onesided).
* the epilogue uses ``(mult/2) * log10(max(mag^2, amin^2))`` — identical to
  ``mult*log10(max(|X|, amin))`` but with NO sqrt, halving transcendentals.

The price of DIF: bins leave the kernel k1-INTERLEAVED (lane l of k1-block
is bin ``16*k2 + k1``), so a small XLA epilogue de-interleaves
``[B,T,16,128] -> slice k2<65 -> transpose -> [B,T,1040] -> [:1025]``.
Measured trade (docs/PERF.md round 3): prebuild 6.9 ms -> ~0, kernel cost
comparable, de-interleave ~1 ms.

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

_LOG10_INV = 1.0 / math.log(10.0)
_N2 = 128  # lane width — the contiguous block size of the DIF split


def dif_applicable(cfg: FrontendConfig) -> bool:
    """Needs reshape-only framing (``n_fft % hop == 0``), 128-aligned lane
    blocks (``hop % 128 == 0``, ``n_fft % 128 == 0``), an even block count
    (conjugate symmetry at N1/2) and center padding."""
    n1v = cfg.n_fft // _N2
    return (
        cfg.n_fft % cfg.hop_length == 0
        and cfg.hop_length % _N2 == 0
        and cfg.n_fft % _N2 == 0
        and n1v % 2 == 0
        and cfg.center
    )


@functools.lru_cache(maxsize=8)
def _dif_bases_np(n_fft: int):
    """float64-built operands: ``(w2d[N1,128], ctw[N1,128], stw[N1,128],
    c128[128,128], s128[128,128], c16[N1][K1u], s16[N1][K1u])`` — the W_16
    factors are returned as nested Python floats (baked into the kernel)."""
    n1v = n_fft // _N2
    k1u = n1v // 2 + 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft)
    w2d = w.reshape(n1v, _N2)
    k1 = np.arange(n1v, dtype=np.float64)
    n2 = np.arange(_N2, dtype=np.float64)
    angt = 2.0 * np.pi * k1[:, None] * n2[None, :] / n_fft  # W_N^(k1*n2)
    k2 = np.arange(_N2, dtype=np.float64)
    ang3 = 2.0 * np.pi * n2[:, None] * k2[None, :] / _N2  # W_128^(n2*k2)
    c128 = np.cos(ang3)
    s128 = np.sin(ang3)
    # onesided: k = 16*k2 + k1 needs k2 <= (n_fft//2 - k1)/16 -> k2u = 65
    k2u = (n_fft // 2) // n1v + 1
    c128[:, k2u:] = 0.0
    s128[:, k2u:] = 0.0
    n1 = np.arange(n1v, dtype=np.float64)
    k1s = np.arange(k1u, dtype=np.float64)
    angA = 2.0 * np.pi * n1[:, None] * k1s[None, :] / n1v  # W_16^(n1*k1)
    return (
        w2d.astype(np.float32),
        np.cos(angt).astype(np.float32),
        np.sin(angt).astype(np.float32),
        c128.astype(np.float32),
        s128.astype(np.float32),
        np.cos(angA),
        np.sin(angA),
    )


def _acc(acc, term):
    return term if acc is None else acc + term


# ---- radix-2 stage A ---------------------------------------------------------
#
# The direct 16-point DFT above stage C costs ~220 scaled tile accumulations
# (16 blocks x 9 outputs x re/im, zero/+-1 elided).  A recursive real-input
# radix-2 factorization (FFT16 = 2xFFT8 = 4xFFT4 with conjugate-symmetry and
# product reuse at every level) computes the same 9 onesided outputs in ~76
# tile ops — the classic FLOP argument, applied at [T,128]-tile granularity
# where every saved op is a full VPU pass.  Values are (re, im) pairs with
# ``im=None`` encoding an exact zero (real value), so elision survives the
# recursion.  Convention matches the direct path: y_k = sum_n b_n e^{-2pi i
# n k / 16} (forward DFT).

_SQRT1_2 = math.sqrt(0.5)


def _cneg(a):
    return None if a is None else -a


def _cadd(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _fft4_real(a0, a1, a2, a3):
    """4-point forward DFT of real tiles -> X[0..2]; X3 = conj(X1) implied."""
    t0, t1 = a0 + a2, a0 - a2
    t2, t3 = a1 + a3, a1 - a3
    return (t0 + t2, None), (t1, -t3), (t0 - t2, None)


def _fft8_real(a):
    """8-point forward DFT of 8 real tiles -> X[0..4]; X[8-k] = conj(X[k])."""
    E0, E1, E2 = _fft4_real(a[0], a[2], a[4], a[6])
    O0, O1, O2 = _fft4_real(a[1], a[3], a[5], a[7])
    c = _SQRT1_2
    o1re, o1im = O1
    # P1 = W8^1 * O1 with W8^1 = c - ic
    p1re = c * (o1re + o1im)
    p1im = c * (o1im - o1re)
    X0 = (E0[0] + O0[0], None)
    X1 = (E1[0] + p1re, _cadd(E1[1], p1im))
    X2 = (E2[0], _cneg(O2[0]))  # W8^2 = -i, O2 real
    # X3 = conj(E1) + W8^3*O3 where O3 = conj(O1) and W8^3*conj(O1) = -conj(P1)
    X3 = (E1[0] - p1re, _cadd(_cneg(E1[1]), p1im))
    X4 = (E0[0] - O0[0], None)
    return X0, X1, X2, X3, X4


def _fft16_real(b):
    """16-point forward DFT of 16 real tiles -> onesided X[0..8] as (re, im)
    pairs (im None = exact zero).  Requires len(b) == 16."""
    E = _fft8_real(b[0::2])
    O = _fft8_real(b[1::2])
    X = [None] * 9
    X[0] = (E[0][0] + O[0][0], None)
    X[8] = (E[0][0] - O[0][0], None)
    X[4] = (E[4][0], _cneg(O[4][0]))  # W16^4 = -i, E4/O4 real
    for k in (1, 2, 3):
        ck = math.cos(math.pi * k / 8.0)
        sk = math.sin(math.pi * k / 8.0)
        ore, oim = O[k]
        if k == 2:  # W16^2 = c - ic: two mults via the shared-factor form
            pre = ck * (ore + oim)
            pim = ck * (oim - ore)
        else:  # full complex twiddle (ck - i sk)
            pre = ck * ore + sk * oim
            pim = ck * oim - sk * ore
        X[k] = (E[k][0] + pre, _cadd(E[k][1], pim))
        # X[8-k] = conj(E[k]) + W16^(8-k)*conj(O[k]) = conj(E[k]) - conj(P[k])
        X[8 - k] = (E[k][0] - pre, _cadd(_cneg(E[k][1]), pim))
    return X


def _scaled(a, c: float):
    """``a * c`` with 0 / +-1 elided to None / a / -a."""
    eps = 1e-12
    if abs(c) < eps:
        return None
    if abs(c - 1.0) < eps:
        return a
    if abs(c + 1.0) < eps:
        return -a
    return a * c


def _dif_kernel(x_ref, w_ref, ctw_ref, stw_ref, c128_ref, s128_ref, o_ref, *,
                T: int, hop: int, n1v: int, c16: tuple, s16: tuple,
                amin: float, multiplier: float, stage_a: str = "direct"):
    """One batch-item grid step.

    x_ref: [1, T+R-1, hop] signal rows; o_ref: [1, T, n1v*128] dB features,
    k1-major 128-lane blocks (bin ``16*k2 + k1`` lives at block k1, lane k2).
    """
    rows = x_ref[0]
    k1u = n1v // 2 + 1
    # stage A — windowed 16-point DFT over the frame-contiguous blocks
    blocks = []
    for n1 in range(n1v):
        j, c0 = (_N2 * n1) // hop, (_N2 * n1) % hop
        blocks.append(rows[j : j + T, c0 : c0 + _N2] * w_ref[n1 : n1 + 1, :])
    if stage_a == "r2" and n1v == 16:
        ys = _fft16_real(blocks)  # [T,128] tiles, ~3x fewer VPU passes
        yre = [re for re, _ in ys]
        yim = [im for _, im in ys]
    else:  # direct DFT (any even n1v; zero/+-1 weights elided)
        yre = [None] * k1u
        yim = [None] * k1u
        for n1, blk in enumerate(blocks):
            for k1 in range(k1u):
                t = _scaled(blk, c16[n1][k1])
                if t is not None:
                    yre[k1] = _acc(yre[k1], t)
                t = _scaled(blk, -s16[n1][k1])
                if t is not None:
                    yim[k1] = _acc(yim[k1], t)
    zero = jnp.zeros((T, _N2), jnp.float32)
    yre = [zero if a is None else a for a in yre]
    yim = [zero if a is None else a for a in yim]

    scale = 0.5 * multiplier * _LOG10_INV  # (mult/2)*ln->log10 on mag^2
    amin2 = amin * amin
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    for k1 in range(n1v):
        if k1 < k1u:
            yr, yi = yre[k1], yim[k1]
        else:  # conjugate symmetry of the real-input inner DFT
            yr, yi = yre[n1v - k1], -yim[n1v - k1]
        ct = ctw_ref[k1 : k1 + 1, :]  # [1,128] broadcasts over T
        st = stw_ref[k1 : k1 + 1, :]
        # z = y * e^{-i theta}
        zre = yr * ct + yi * st
        zim = yi * ct - yr * st
        # stage C — 128-point output DFT on the MXU
        xre = dot(zre, c128_ref[...]) + dot(zim, s128_ref[...])
        xim = dot(zim, c128_ref[...]) - dot(zre, s128_ref[...])
        m2 = xre * xre + xim * xim
        o_ref[0, :, k1 * _N2 : (k1 + 1) * _N2] = scale * jnp.log(
            jnp.maximum(m2, amin2)
        )


def stft_features_dif_pallas_tm(
    x: jax.Array, cfg: Optional[FrontendConfig] = None,
    stage_a: Optional[str] = None,
) -> jax.Array:
    """Fused DIF-factorized frontend, time-major output ``[..., T, bins]``.

    Same contract as ``stft_features_pallas_tm`` (requires
    ``dif_applicable(cfg)``).  ``stage_a``: ``"direct"`` (unrolled 16-point
    DFT) or ``"r2"`` (recursive radix-2 real-input FFT, ~3x fewer VPU tile
    ops at n1v == 16); default from ``TPUMIX_DIF_STAGEA``.
    """
    import os

    cfg = cfg or FrontendConfig()
    if stage_a is None:
        # r2 measured 92.6 vs direct's 93.2 ms on the scalar2s segment
        # (benchmarks/frontend_stagea_bench.py) — a ~0.7% edge inside link
        # weather noise, but never slower, so it is the default; the stage-A
        # tile-op count was ~0.5 ms of the kernel all along (docs/PERF.md)
        stage_a = os.environ.get("TPUMIX_DIF_STAGEA", "r2")
    if not dif_applicable(cfg):
        raise ValueError("dif_pallas frontend requires dif_applicable(cfg)")
    n_fft, hop = cfg.n_fft, cfg.hop_length
    n1v = n_fft // _N2
    k1u = n1v // 2 + 1
    k2u = (n_fft // 2) // n1v + 1
    R = n_fft // hop
    bins = cfg.num_bins

    lead = x.shape[:-1]
    S = x.shape[-1]
    T = 1 + S // hop
    B = int(np.prod(lead)) if lead else 1
    xb = x.reshape(B, S).astype(jnp.float32)
    pad = n_fft // 2
    xp = jnp.pad(xb, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    rows = xp[:, : (T + R - 1) * hop].reshape(B, T + R - 1, hop)

    w2d, ctw, stw, c128, s128, c16_np, s16_np = _dif_bases_np(n_fft)
    c16 = tuple(tuple(float(v) for v in row) for row in c16_np)
    s16 = tuple(tuple(float(v) for v in row) for row in s16_np)

    kernel = functools.partial(
        _dif_kernel, T=T, hop=hop, n1v=n1v, c16=c16, s16=s16,
        amin=cfg.amin, multiplier=cfg.db_multiplier, stage_a=stage_a,
    )

    from tpumix.utils.backend import is_tpu_backend

    interpret = not is_tpu_backend()

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T + R - 1, hop), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, _N2), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, _N2), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, _N2), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N2, _N2), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_N2, _N2), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, n1v * _N2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, n1v * _N2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * T * n1v * _N2 * _N2,
            bytes_accessed=4 * (B * (T + R - 1) * hop + B * T * n1v * _N2),
            transcendentals=B * T * n1v * _N2,
        ),
        interpret=interpret,
    )(rows, jnp.asarray(w2d), jnp.asarray(ctw), jnp.asarray(stw),
      jnp.asarray(c128), jnp.asarray(s128))

    # de-interleave: block k1, lane k2 -> bin 16*k2 + k1
    deint = out.reshape(B, T, n1v, _N2)[:, :, :, :k2u]
    deint = jnp.swapaxes(deint, -1, -2).reshape(B, T, k2u * n1v)
    return deint[:, :, :bins].reshape(*lead, T, bins)


from tpumix.ops.stft_pallas import make_tm_hybrid

#: Fused DIF kernel forward, XLA-derived backward: drop-in differentiable
#: frontend (shared factory — see stft_pallas.make_tm_hybrid).
stft_features_dif_tm_hybrid = make_tm_hybrid(stft_features_dif_pallas_tm)
