"""Parallel IIR (biquad) filtering on TPU via FIR/FFT convolution.

A biquad cascade is a sequential recurrence — poison for a 10M-sample song on
a vector machine if scanned sample-by-sample.  The K-weighting filters
(tpumix/ops/loudness.py) are stable with impulse responses that decay below
1e-7 within a few thousand samples, so tpumix evaluates them the TPU way:

1. materialise the cascade's impulse response once on the host (exact
   sequential recurrence over `fir_len` samples — microseconds of CPU), and
2. apply it on device as zero-padded FFT convolution (overlap-save across
   blocks), which XLA maps onto its native FFT — O(n log n), fully parallel,
   no per-sample dependency chain.

Truncation error is controlled by ``fir_len`` (default 16384: |h| tail
< 1e-9 for the BS.1770 filters at 44.1/48 kHz).

No reference equivalent: the reference's only IIR use is hidden inside
pyloudnorm's scipy.lfilter calls on the host CPU (reference evaluation.py:40).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _impulse_response_np(
    sections: Tuple[Tuple[Tuple[float, ...], Tuple[float, ...]], ...], fir_len: int
) -> np.ndarray:
    """Exact float64 impulse response of a biquad cascade (host-side)."""
    h = np.zeros(fir_len, dtype=np.float64)
    h[0] = 1.0
    for b, a in sections:
        b = np.asarray(b, dtype=np.float64)
        a = np.asarray(a, dtype=np.float64)
        y = np.zeros_like(h)
        y1 = y2 = 0.0
        x1 = x2 = 0.0
        for n in range(fir_len):
            yn = b[0] * h[n] + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2
            x2, x1 = x1, h[n]
            y2, y1 = y1, yn
            y[n] = yn
        h = y
    return h


@functools.lru_cache(maxsize=16)
def _cached_fir(key: Tuple, fir_len: int) -> np.ndarray:
    return _impulse_response_np(key, fir_len)


def _hashable(sections: Sequence[Tuple[np.ndarray, np.ndarray]]) -> Tuple:
    return tuple((tuple(float(v) for v in b), tuple(float(v) for v in a)) for b, a in sections)


def fir_from_biquads(
    sections: Sequence[Tuple[np.ndarray, np.ndarray]], fir_len: int = 16384
) -> np.ndarray:
    """Truncated impulse response of a cascade of (b, a) biquads."""
    return _cached_fir(_hashable(sections), fir_len)


def fft_filter(x: jax.Array, h: jax.Array, block: int = 1 << 18) -> jax.Array:
    """Causal FIR filtering along the last axis by overlap-save FFT
    convolution; returns the same length as ``x`` (lfilter semantics:
    zero initial conditions, no tail).

    ``block`` is the FFT segment length; each segment carries ``len(h)-1``
    samples of left context so segments are independent (embarrassingly
    parallel over the block axis — shard-friendly).
    """
    m = h.shape[-1]
    n = x.shape[-1]
    if n + m <= block:
        nfft = 1
        while nfft < n + m:
            nfft <<= 1
        X = jnp.fft.rfft(x, n=nfft)
        H = jnp.fft.rfft(h, n=nfft)
        y = jnp.fft.irfft(X * H, n=nfft)
        return y[..., :n].astype(x.dtype)

    step = block - (m - 1)
    num_blocks = -(-n // step)
    right_pad = num_blocks * step - n
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(m - 1, right_pad)])
    # gather overlapping segments [num_blocks, block]
    starts = jnp.arange(num_blocks) * step
    idx = starts[:, None] + jnp.arange(block)[None, :]
    segs = xp[..., idx]
    H = jnp.fft.rfft(h, n=block)
    Y = jnp.fft.irfft(jnp.fft.rfft(segs, n=block) * H, n=block)
    valid = Y[..., m - 1 :]  # [..., num_blocks, step]
    out = valid.reshape(valid.shape[:-2] + (num_blocks * step,))
    return out[..., :n].astype(x.dtype)


def biquad_jax(
    x: jax.Array, b: Sequence[float], a: Sequence[float], fir_len: int = 16384
) -> jax.Array:
    """Apply one biquad along the last axis (zero initial conditions,
    scipy.signal.lfilter parity up to FIR truncation)."""
    h = jnp.asarray(fir_from_biquads([(np.asarray(b), np.asarray(a))], fir_len), dtype=jnp.float32)
    return fft_filter(x, h)


def biquad_cascade_jax(
    x: jax.Array, sections: Sequence[Tuple[np.ndarray, np.ndarray]], fir_len: int = 16384
) -> jax.Array:
    """Apply a cascade of (b, a) biquads along the last axis in ONE pass:
    the sections are folded into a single impulse response, so the device does
    a single FFT convolution regardless of cascade depth."""
    h = jnp.asarray(fir_from_biquads(sections, fir_len), dtype=jnp.float32)
    return fft_filter(x, h)
