"""Fused Pallas TPU kernel: framing + windowed real-DFT + |.| + dB in one pass.

Why a custom kernel (SURVEY.md §7 "hard parts", PAPERS.md GEMM-NDFT/nnAudio
pattern): the XLA path materialises the overlapped frame tensor in HBM
(hop=512, n_fft=2048 -> 4x data duplication: ~360 MB read+write per 64-chunk
segment) before the FFT, then round-trips again for window/abs/log.  This
kernel keeps everything in VMEM:

* **Framing as shifted reshapes** — the padded signal is reshaped (free, in
  XLA) to ``[B, R_rows, hop]``; inside the kernel, frame ``t`` is the lane-
  concatenation of rows ``t .. t+R-1`` where ``R = n_fft // hop``.  No
  gather, no HBM duplication.
* **DFT as MXU matmuls** — frames ``[T, n_fft]`` against precomputed windowed
  cos / -sin bases ``[n_fft, TK]`` tiled over the bin axis (the basis is
  ~16.8 MB in f32 — tiled to fit VMEM; grid order puts the bin-tile OUTER so
  each basis tile loads once and the signal rows stream past it).
* **Epilogue fused** — magnitude and ``20*log10(max(.,amin))`` applied to the
  matmul tile before the single HBM write of the feature block.

Numerics: f32 frames x f32 basis with f32 MXU accumulation — same precision
class as the matmul-DFT jnp path (tests/test_stft.py bounds).  Output layout
is time-major ``[B, T, bins]`` (frames on sublanes, bins on lanes).

The backward pass (for training) routes through a ``jax.custom_vjp`` whose
cotangent is computed with the equivalent jnp formulation — the fused kernel
accelerates the forward/inference path, gradients stay XLA-generated.
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
from tpumix.ops.stft import _dft_bases_np

_LOG10_INV = 1.0 / math.log(10.0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _padded_bases(n_fft: int, bins_padded: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed (cos, -sin) bases zero-padded on the bin axis to a lane-tile
    multiple.  Zero columns produce amin-clamped outputs that are sliced off."""
    bins = n_fft // 2 + 1
    full = _dft_bases_np(n_fft, windowed=True)  # [n_fft, 2*bins]
    cos = np.zeros((n_fft, bins_padded), np.float32)
    sin = np.zeros((n_fft, bins_padded), np.float32)
    cos[:, :bins] = full[:, :bins]
    sin[:, :bins] = full[:, bins:]
    return cos, sin


def _stft_kernel(x_ref, cos_ref, sin_ref, o_ref, *, T: int, R: int, hop: int,
                 amin: float, multiplier: float):
    """One (bin-tile k, signal b) grid step.

    x_ref:   [1, T + R - 1, hop]  — signal rows
    cos/sin: [n_fft, TK]          — basis tile
    o_ref:   [1, T, TK]           — output feature tile

    The frame matrix is never materialised: frame t is the concatenation of
    rows t..t+R-1, so ``frames @ basis`` decomposes into R partial matmuls
    ``rows[j:j+T] @ basis[j*hop:(j+1)*hop]`` accumulated in f32 — each a
    [T, hop] x [hop, TK] MXU contraction (Mosaic cannot lane-concatenate
    slices at different sublane offsets, and this form needs less VMEM
    anyway).
    """
    rows = x_ref[0]  # [T + R - 1, hop]
    re = jnp.zeros_like(o_ref[0])
    im = jnp.zeros_like(o_ref[0])
    for j in range(R):
        seg = rows[j : j + T]  # [T, hop]
        # HIGHEST: f32-equivalent MXU passes (bf16x6) — the default single
        # bf16 pass loses ~8 mantissa bits, visible as ~0.02 dB feature noise
        re = re + jnp.dot(seg, cos_ref[j * hop : (j + 1) * hop, :],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        im = im + jnp.dot(seg, sin_ref[j * hop : (j + 1) * hop, :],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    o_ref[0] = multiplier * _LOG10_INV * jnp.log(jnp.maximum(mag, amin))


def _pick_bin_tile(T: int, R: int, hop: int, n_fft: int) -> int:
    """Largest bin tile whose working set fits VMEM.  The budget counts the
    double-buffered signal rows and basis tiles, the output tile, and the
    f32->bf16x6 splitting scratch of the HIGHEST-precision dots (~2x the
    operand bytes) — the term that blew the 16 MB scoped limit at hop=1024
    (R=2 means 1024-row basis slices; observed on the resnet18 preset)."""
    rows_bytes = 2 * (T + R - 1) * hop * 4
    for bt in (512, 256, 128):
        need = (
            rows_bytes
            + 2 * 2 * n_fft * bt * 4  # cos+sin tiles, double buffered
            + 2 * _round_up(T, 8) * bt * 4  # output tile, double buffered
            + 6 * _round_up(T, 8) * bt * 4  # re/im/mag temporaries
            + 2 * (T * hop + n_fft * bt) * 2  # bf16x6 operand splits
        )
        # threshold calibrated against measured Mosaic scoped allocations:
        # scalar2s@256 modelled 13.0 M runs (known-good 18 ms config);
        # resnet@256 modelled 15.0 M faulted at 17.2 M real
        if need <= 13.5 * 1024 * 1024:
            return bt
    return 128


def stft_features_pallas_tm(
    x: jax.Array, cfg: Optional[FrontendConfig] = None, bin_tile: Optional[int] = None
) -> jax.Array:
    """Fused frontend, time-major output.

    :param x: ``[..., C]`` waveforms; C must be a multiple of hop_length and
        ``n_fft % hop_length == 0`` (true for every tpumix preset).
    :return: ``[..., T, bins]`` dB features, ``T = 1 + C // hop``.
    """
    cfg = cfg or FrontendConfig()
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if n_fft % hop != 0:
        raise ValueError("pallas frontend requires n_fft % hop_length == 0")
    C = x.shape[-1]
    R = n_fft // hop
    T = 1 + C // hop
    bins = cfg.num_bins
    if bin_tile is None:
        bin_tile = _pick_bin_tile(T, R, hop, n_fft)

    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    xb = x.reshape(B, C).astype(jnp.float32)

    # centre reflect-pad, then truncate to the exact sample span the frames
    # cover: (T-1)*hop + n_fft == (T+R-1)*hop <= C + n_fft for any C
    pad = n_fft // 2
    xp = jnp.pad(xb, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    rows = xp[:, : (T + R - 1) * hop].reshape(B, T + R - 1, hop)

    bins_padded = _round_up(bins, bin_tile)
    num_k = bins_padded // bin_tile
    cos_np, sin_np = _padded_bases(n_fft, bins_padded)
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)

    kernel = functools.partial(
        _stft_kernel, T=T, R=R, hop=hop, amin=cfg.amin, multiplier=cfg.db_multiplier
    )

    # interpreter mode off-TPU so the same code path is unit-testable on the
    # CPU simulation backend
    from tpumix.utils.backend import is_tpu_backend

    interpret = not is_tpu_backend()

    out = pl.pallas_call(
        kernel,
        grid=(num_k, B),  # bin-tile OUTER: basis tile loads once per k
        in_specs=[
            pl.BlockSpec(
                (1, T + R - 1, hop), lambda k, b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_fft, bin_tile), lambda k, b: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bin_tile), lambda k, b: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, bin_tile), lambda k, b: (b, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, bins_padded), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * n_fft * bins_padded,
            bytes_accessed=4 * (B * (T + R - 1) * hop + 2 * n_fft * bins_padded + B * T * bins_padded),
            transcendentals=B * T * bins_padded,
        ),
        interpret=interpret,
    )(rows, cos, sin)

    return out[:, :, :bins].reshape(*lead, T, bins)


def _tm_jnp(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """jnp mirror used for the custom-vjp backward.

    The implementation MUST be pinned to a non-pallas path: on TPU backends
    ``implementation="auto"`` re-resolves to the Pallas kernel, which would
    send the backward straight back into ``pl.pallas_call`` (no VJP rule) —
    the exact thing this mirror exists to avoid."""
    import dataclasses

    from tpumix.ops.stft import amplitude_to_db, stft_magnitude

    cfg = dataclasses.replace(cfg, implementation="fft")
    mag = stft_magnitude(x, cfg)
    return amplitude_to_db(mag, amin=cfg.amin, multiplier=cfg.db_multiplier)


def make_tm_hybrid(forward):
    """Wrap a time-major Pallas frontend ``forward(x, cfg)`` in a
    ``jax.custom_vjp``: kernel forward, XLA-derived backward through the
    ``_tm_jnp`` mirror.  All three fused frontends (naive-basis, DIT/"ct",
    DIF) share this exact pattern — a fix to the backward routing applies
    to every kernel through this one factory."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def hybrid(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
        return forward(x, cfg)

    def fwd(x, cfg):
        return forward(x, cfg), x

    def bwd(cfg, x, g):
        _, vjp = jax.vjp(lambda xx: _tm_jnp(xx, cfg), x)
        return (vjp(g)[0],)

    hybrid.defvjp(fwd, bwd)
    return hybrid


#: Pallas forward, XLA-derived backward: drop-in differentiable frontend in
#: time-major layout.
stft_features_tm_hybrid = make_tm_hybrid(stft_features_pallas_tm)


def stft_magnitude_pallas(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Adapter for tpumix.ops.stft.stft_magnitude(implementation="pallas"):
    returns linear magnitude [..., T, bins] (the dB stage is re-applied by the
    caller; for the fully fused path use stft_features_pallas_tm)."""
    db = stft_features_pallas_tm(x, cfg)
    return jnp.exp(db * (math.log(10.0) / cfg.db_multiplier))
