"""ITU-R BS.1770-4 loudness metering and loudness normalisation.

The reference delegates loudness to ``pyloudnorm`` (reference evaluation.py:32,
data/dataset.py:118, models/baselines/mean_loudness_model.py) — a CPU Python
dependency this environment does not ship.  tpumix implements the standard
from first principles:

* K-weighting pre-filter: stage-1 high-shelf (+4 dB, fc=1681.97 Hz,
  Q=0.7071752) and stage-2 high-pass (fc=38.135 Hz, Q=0.5003270), RBJ biquad
  coefficient formulas evaluated for the actual sample rate (the same
  parametrisation pyloudnorm uses, so meters agree across sample rates).
* Gated integrated loudness: 400 ms blocks with 75 % overlap, per-channel mean
  square, channel weights (1, 1, 1, 1.41, 1.41), absolute gate at -70 LKFS and
  relative gate at -10 LU below the absolute-gated mean
  (BS.1770-4 Annex 1).

``Meter`` mirrors the pyloudnorm API surface used by the reference
(``Meter(rate).integrated_loudness(audio)`` with audio ``[samples]`` or
``[samples, channels]``), and ``normalize_loudness`` mirrors
``pyloudnorm.normalize.loudness``.

Host-side numpy/scipy implementation: metering is an evaluation-time epilogue
over full songs (the reference runs it on CPU too, evaluation.py:40).  A
batched JAX variant for on-device gating lives in ``block_loudness_jax``.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
from scipy.signal import lfilter


def _high_shelf_coeffs(fs: float, gain_db: float = 3.999843853973347,
                       fc: float = 1681.9744509555319,
                       q: float = 0.7071752369554196) -> Tuple[np.ndarray, np.ndarray]:
    """BS.1770 stage-1 high-shelf, De Man tan-domain parametrisation — the
    (G, fc, Q) triple reverse-engineered so that at fs=48000 these reproduce
    the coefficients published in BS.1770-4 Table 1 exactly, and generalise
    consistently to other sample rates."""
    K = math.tan(math.pi * fc / fs)
    Vh = 10.0 ** (gain_db / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / q + K * K
    b = np.array([
        (Vh + Vb * K / q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / q + K * K) / a0,
    ])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / q + K * K) / a0])
    return b, a


def _high_pass_coeffs(fs: float, fc: float = 38.13547087602444,
                      q: float = 0.5003270373238773) -> Tuple[np.ndarray, np.ndarray]:
    """BS.1770 stage-2 RLB high-pass (De Man parametrisation; note the
    standard's numerator is the un-normalised [1, -2, 1], matching Table 2)."""
    K = math.tan(math.pi * fc / fs)
    denom = 1.0 + K / q + K * K
    b = np.array([1.0, -2.0, 1.0])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / denom, (1.0 - K / q + K * K) / denom])
    return b, a


@functools.lru_cache(maxsize=8)
def k_weighting_coeffs(fs: float):
    return _high_shelf_coeffs(fs), _high_pass_coeffs(fs)


def k_weight(audio: np.ndarray, fs: float) -> np.ndarray:
    """Apply the two-stage K-weighting filter along axis 0 (samples)."""
    (b1, a1), (b2, a2) = k_weighting_coeffs(fs)
    y = lfilter(b1, a1, audio, axis=0)
    return lfilter(b2, a2, y, axis=0)


# BS.1770 channel weights: L, R, C, Ls, Rs
_CHANNEL_G = np.array([1.0, 1.0, 1.0, 1.41, 1.41])
_ABS_GATE_LUFS = -70.0
_REL_GATE_LU = -10.0
_BLOCK_S = 0.400
_OVERLAP = 0.75


def integrated_loudness(audio: np.ndarray, fs: float) -> float:
    """Gated integrated loudness in LUFS.

    :param audio: ``[samples]`` mono or ``[samples, channels]`` (pyloudnorm
        convention — the reference passes ``track.T`` of ``[ch, samples]``
        arrays, evaluation.py:40).
    """
    audio = np.asarray(audio, dtype=np.float64)
    if audio.ndim == 1:
        audio = audio[:, None]
    n_samples, n_ch = audio.shape
    if n_ch > 5:
        raise ValueError(f"at most 5 channels supported, got {n_ch}")

    block = int(round(_BLOCK_S * fs))
    step = int(round(block * (1.0 - _OVERLAP)))
    if n_samples < block:
        return -np.inf

    y = k_weight(audio, fs)
    n_blocks = (n_samples - block) // step + 1
    # mean square per (block, channel) via cumulative sums — O(n) not O(n*block)
    csum = np.concatenate([np.zeros((1, n_ch)), np.cumsum(y * y, axis=0)], axis=0)
    starts = np.arange(n_blocks) * step
    z = (csum[starts + block] - csum[starts]) / block  # [n_blocks, n_ch]

    g = _CHANNEL_G[:n_ch]
    with np.errstate(divide="ignore"):
        l_blocks = -0.691 + 10.0 * np.log10(np.maximum(z @ g, 1e-30))

    above_abs = l_blocks > _ABS_GATE_LUFS
    if not np.any(above_abs):
        return -np.inf
    z_abs = z[above_abs].mean(axis=0)
    rel_gate = -0.691 + 10.0 * np.log10(max(z_abs @ g, 1e-30)) + _REL_GATE_LU

    gated = above_abs & (l_blocks > rel_gate)
    if not np.any(gated):
        return -np.inf
    z_gated = z[gated].mean(axis=0)
    return float(-0.691 + 10.0 * np.log10(max(z_gated @ g, 1e-30)))


def normalize_loudness(audio: np.ndarray, input_loudness: float, target_loudness: float) -> np.ndarray:
    """Gain-scale ``audio`` from ``input_loudness`` to ``target_loudness`` LUFS
    (pyloudnorm.normalize.loudness parity — pure gain, no limiting)."""
    delta = target_loudness - input_loudness
    return audio * (10.0 ** (delta / 20.0))


class Meter:
    """pyloudnorm.Meter API shim (reference evaluation.py:32)."""

    def __init__(self, rate: float):
        self.rate = rate

    def integrated_loudness(self, audio: np.ndarray) -> float:
        return integrated_loudness(audio, self.rate)


def integrated_loudness_jax(audio, fs: float):
    """Gated integrated loudness (LUFS) fully on device, batched.

    :param audio: ``[..., channels, samples]`` with ``channels <= 5``; a 1-D
        array is promoted to ``[1, samples]`` mono.  NOTE: a 2-D input is
        ALWAYS read as ``[channels, samples]`` — a batch of mono songs must
        be shaped ``[batch, 1, samples]`` explicitly (a bare ``[B, S]`` would
        silently meter as one B-channel signal with surround weights).
    :return: ``[...]`` LUFS values (-inf for all-gated/silent signals,
        static shapes — jit/vmap-friendly).

    Same algorithm as :func:`integrated_loudness`; the sequential K-weighting
    IIR runs as a single FFT convolution (tpumix/ops/iir.py), the 75 %-overlap
    block energies come from a cumulative sum, and both gates are masked means
    — no data-dependent shapes, so whole catalogues of songs batch under vmap.
    """
    import jax.numpy as jnp

    from tpumix.ops.iir import biquad_cascade_jax

    x = jnp.asarray(audio, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[None, :]  # mono convenience: [S] -> [1, S]
    if x.shape[-2] > 5:
        raise ValueError("expected [..., channels<=5, samples]")

    sections = list(k_weighting_coeffs(fs))
    y = biquad_cascade_jax(x, sections)

    block = int(round(_BLOCK_S * fs))
    step = int(round(block * (1.0 - _OVERLAP)))
    n = y.shape[-1]
    n_blocks = (n - block) // step + 1
    if n_blocks <= 0:
        raise ValueError("signal shorter than one 400 ms block")

    sq = jnp.cumsum(y * y, axis=-1)
    sq = jnp.concatenate([jnp.zeros_like(sq[..., :1]), sq], axis=-1)
    starts = jnp.arange(n_blocks) * step
    z = (sq[..., starts + block] - sq[..., starts]) / block  # [..., ch, blocks]

    g = jnp.asarray(_CHANNEL_G[: z.shape[-2]], dtype=jnp.float32)
    power = jnp.einsum("...cb,c->...b", z, g)  # [..., blocks]

    l_blocks = -0.691 + 10.0 * jnp.log10(jnp.maximum(power, 1e-30))

    abs_mask = (l_blocks > _ABS_GATE_LUFS).astype(jnp.float32)
    denom = jnp.maximum(abs_mask.sum(-1), 1.0)
    z_abs = (power * abs_mask).sum(-1) / denom
    rel_gate = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_abs, 1e-30)) + _REL_GATE_LU

    gated = abs_mask * (l_blocks > rel_gate[..., None]).astype(jnp.float32)
    denom2 = jnp.maximum(gated.sum(-1), 1.0)
    z_gated = (power * gated).sum(-1) / denom2
    lufs = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_gated, 1e-30))
    # silence (no gated blocks) -> very negative, mirroring -inf
    return jnp.where(gated.sum(-1) > 0, lufs, -jnp.inf)


def block_loudness_jax(audio, fs: float, block_s: float = _BLOCK_S, overlap: float = _OVERLAP):
    """On-device momentary block loudness (no gating): returns per-block LKFS
    for mono ``[..., samples]`` signals.  The sequential IIR K-weighting is
    expressed as a scan-free second-order recurrence over blocks via
    ``jax.lax.associative_scan`` on the 2x2 companion form.
    """
    import jax.numpy as jnp
    from tpumix.ops.iir import biquad_cascade_jax

    (b1, a1), (b2, a2) = k_weighting_coeffs(fs)
    y = biquad_cascade_jax(audio, [(b1, a1), (b2, a2)])
    block = int(round(block_s * fs))
    step = int(round(block * (1.0 - overlap)))
    n = audio.shape[-1]
    n_blocks = (n - block) // step + 1
    sq = y * y
    csum = jnp.cumsum(sq, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    starts = jnp.arange(n_blocks) * step
    z = (csum[..., starts + block] - csum[..., starts]) / block
    return -0.691 + 10.0 * jnp.log10(jnp.maximum(z, 1e-30))
