"""STFT -> dB-magnitude feature frontend, TPU-first.

Contract parity with the reference frontend (reference data/dataset.py:132-162):

    spectrum  = torch.stft(x, n_fft=2048, hop_length=H, window=hann(2048),
                           return_complex=True)           # center=True, reflect pad
    features  = 20 * log10(max(|spectrum|, 1e-5))          # amplitude_to_DB,
                                                           # multiplier=20, amin=1e-5,
                                                           # db_multiplier=0
    # output shape [n_fft//2+1, 1 + len(x)//H]  == [1025, frames]

Three interchangeable implementations behind one signature:

* ``implementation="fft"``    — framing (strided gather) + jnp.fft.rfft.  XLA's
  native FFT; the default and the conformance oracle for the other two.
* ``implementation="matmul"`` — real DFT as one matmul against a precomputed
  windowed [n_fft, 2*bins] cos/sin basis.  ~n/log n more FLOPs than FFT but the
  FLOPs land on the MXU (128x128 systolic array), which is the right trade on
  TPU for n_fft=2048 (cf. PAPERS.md: GEMM-native NDFT / nnAudio pattern).
* ``implementation="pallas"`` — fused Pallas kernel: frame construction from the
  padded waveform inside VMEM (never materialising the 2x-redundant frame
  matrix in HBM), DFT matmul, magnitude and log fused in one pass
  (tpumix/ops/stft_pallas.py).

All entry points accept arbitrary leading batch dims and operate over the last
(sample) axis; everything is jit/vmap/shard_map-compatible (static shapes, no
data-dependent control flow).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpumix.config import FrontendConfig

_LOG10_INV = 1.0 / math.log(10.0)


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (torch.hann_window default periodic=True):
    ``0.5 - 0.5*cos(2*pi*k/n)``."""
    k = np.arange(n)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return jnp.asarray(w, dtype=dtype)


def _pad_center(x: jax.Array, n_fft: int, pad_mode: str) -> jax.Array:
    pad = n_fft // 2
    pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, pad_width, mode=pad_mode)


def frame_signal(
    x: jax.Array, n_fft: int, hop_length: int, *, center: bool = True, pad_mode: str = "reflect"
) -> jax.Array:
    """Slice ``x[..., S]`` into overlapping frames ``[..., frames, n_fft]``.

    center=True reflect-pads n_fft//2 on both sides and yields
    ``1 + S // hop`` frames (torch.stft semantics).
    """
    if center:
        x = _pad_center(x, n_fft, pad_mode)
        num_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    else:
        num_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    starts = jnp.arange(num_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def amplitude_to_db(
    mag: jax.Array, amin: float = 1e-5, multiplier: float = 20.0, db_multiplier: float = 0.0
) -> jax.Array:
    """torchaudio.functional.amplitude_to_DB with top_db=None:
    ``multiplier * log10(max(mag, amin)) - multiplier * db_multiplier``."""
    x = jnp.maximum(mag, amin)
    out = multiplier * jnp.log(x) * _LOG10_INV
    if db_multiplier != 0.0:
        out = out - multiplier * db_multiplier
    return out


@functools.lru_cache(maxsize=8)
def _dft_bases_np(n_fft: int, windowed: bool = True) -> np.ndarray:
    """Precomputed real-DFT basis ``[n_fft, 2*bins]`` with the Hann window
    folded in: columns ``[cos | -sin]`` so that
    ``frames @ basis = [real | imag]`` of the onesided DFT.

    float64 accumulation at build time, cast to float32 — keeps the matmul
    path within ~1e-4 dB of the FFT path.
    """
    bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # [n_fft, 2*bins]
    if windowed:
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft)
        basis = basis * w[:, None]
    return basis.astype(np.float32)


def dft_bases(n_fft: int, windowed: bool = True) -> jax.Array:
    return jnp.asarray(_dft_bases_np(n_fft, windowed))


def _stft_mag_fft(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length, center=cfg.center, pad_mode=cfg.pad_mode)
    frames = frames * hann_window(cfg.n_fft, dtype=frames.dtype)
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., frames, bins]
    return jnp.abs(spec)


def _stft_mag_matmul(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length, center=cfg.center, pad_mode=cfg.pad_mode)
    basis = dft_bases(cfg.n_fft)
    # HIGHEST: f32-equivalent MXU passes — the default single bf16 pass loses
    # ~8 mantissa bits, which in the dB epilogue blows up to tens of dB of
    # error in quiet bins (measured 62 dB max on real TPU)
    ri = jnp.dot(
        frames,
        basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [..., frames, 2*bins]
    bins = cfg.num_bins
    re, im = ri[..., :bins], ri[..., bins:]
    return jnp.sqrt(re * re + im * im)


def stft_magnitude(x: jax.Array, cfg: Optional[FrontendConfig] = None) -> jax.Array:
    """Magnitude spectrogram ``[..., frames, bins]`` (time-major internal layout)."""
    cfg = cfg or FrontendConfig()
    impl = cfg.resolved_implementation()
    if impl == "matmul":
        return _stft_mag_matmul(x, cfg)
    if impl == "pallas":
        from tpumix.ops.stft_pallas import stft_magnitude_pallas

        return stft_magnitude_pallas(x, cfg)
    return _stft_mag_fft(x, cfg)


def spectrogram_features(x: jax.Array, cfg: Optional[FrontendConfig] = None) -> jax.Array:
    """Full frontend: waveform ``[..., S]`` -> dB features ``[..., bins, frames]``.

    Output layout matches the reference contract [1025, T]
    (reference data/dataset.py:162 returns [freq, frames]).
    """
    cfg = cfg or FrontendConfig()
    if cfg.resolved_implementation() == "pallas":
        from tpumix.ops.stft_pallas import stft_features_pallas_tm

        return jnp.swapaxes(stft_features_pallas_tm(x, cfg), -1, -2)
    mag = stft_magnitude(x, cfg)  # [..., frames, bins]
    db = amplitude_to_db(mag, amin=cfg.amin, multiplier=cfg.db_multiplier)
    return jnp.swapaxes(db, -1, -2)


def spectrogram_features_np(x: np.ndarray, cfg: Optional[FrontendConfig] = None) -> np.ndarray:
    """Pure-numpy host-side mirror of :func:`spectrogram_features` — used as
    the conformance oracle and by host tooling that must not touch the device
    (CPU baseline benchmark, dataset parity API).  Output ``[bins, frames]``."""
    cfg = cfg or FrontendConfig()
    x = np.asarray(x, dtype=np.float32)
    pad = cfg.n_fft // 2
    if cfg.center:
        xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=cfg.pad_mode)
    else:
        xp = x
    num_frames = 1 + (xp.shape[-1] - cfg.n_fft) // cfg.hop_length
    strides = xp.strides[:-1] + (cfg.hop_length * xp.strides[-1], xp.strides[-1])
    frames = np.lib.stride_tricks.as_strided(
        xp, shape=xp.shape[:-1] + (num_frames, cfg.n_fft), strides=strides
    )
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft)).astype(np.float32)
    spec = np.fft.rfft(frames * w, axis=-1)
    mag = np.abs(spec).astype(np.float32)
    db = cfg.db_multiplier * np.log10(np.maximum(mag, cfg.amin))
    return np.swapaxes(db, -1, -2)


def spectrogram_features_tm(x: jax.Array, cfg: Optional[FrontendConfig] = None) -> jax.Array:
    """Frontend in time-major layout ``[..., frames, bins]`` — the TPU-friendly
    internal layout (frames on sublanes, bins on lanes) used by the batched
    mixer; avoids a transpose before NHWC convs."""
    cfg = cfg or FrontendConfig()
    if cfg.resolved_implementation() == "pallas":
        from tpumix.ops.stft_pallas import stft_features_pallas_tm

        return stft_features_pallas_tm(x, cfg)
    mag = stft_magnitude(x, cfg)
    return amplitude_to_db(mag, amin=cfg.amin, multiplier=cfg.db_multiplier)
