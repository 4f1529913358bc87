"""Inverse STFT (overlap-add) and spectral-domain reconstruction.

The reference validates mixture reconstruction from stem spectrograms + mix
phases in its experiments notebook (reference experiments.ipynb cells 44-53,
hop=512 frontend variant cell 44) using torch.istft; tpumix provides the
equivalent as first-class ops:

* ``istft`` — inverse of ``tpumix.ops.stft.stft_magnitude``'s underlying
  complex transform: windowed overlap-add with the standard squared-window
  normalisation (torch.istft semantics, center=True);
* ``reconstruct_from_magnitude`` — magnitude + phase -> waveform (the
  notebook's stem-spectrogram + mix-phase experiment);
* ``mix_in_spectrogram_domain`` — gain-weighted complex-stem sum -> ISTFT,
  the spectral-mixdown path the models' ``masked`` output implies.

All jit/vmap-compatible; static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpumix.config import FrontendConfig
from tpumix.ops.stft import frame_signal, hann_window


def stft_complex(x: jax.Array, cfg: Optional[FrontendConfig] = None) -> jax.Array:
    """Complex STFT ``[..., frames, bins]`` (time-major), torch.stft parity."""
    cfg = cfg or FrontendConfig()
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length, center=cfg.center, pad_mode=cfg.pad_mode)
    return jnp.fft.rfft(frames * hann_window(cfg.n_fft, dtype=frames.dtype), axis=-1)


def istft(spec: jax.Array, cfg: Optional[FrontendConfig] = None,
          length: Optional[int] = None) -> jax.Array:
    """Inverse STFT of ``[..., frames, bins]`` complex spectra.

    Windowed overlap-add with ``sum(w^2)`` normalisation; with center=True the
    n_fft//2 padding is trimmed.  ``length`` crops/zero-extends the output
    (torch.istft ``length=`` argument).
    """
    cfg = cfg or FrontendConfig()
    n_fft, hop = cfg.n_fft, cfg.hop_length
    w = hann_window(n_fft, dtype=jnp.float32)

    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(jnp.float32)  # [..., T, n_fft]
    frames = frames * w

    T = frames.shape[-2]
    out_len = n_fft + hop * (T - 1)

    lead = frames.shape[:-2]
    fr = frames.reshape((-1, T, n_fft))

    # overlap-add via scatter-add on frame start offsets
    idx = (jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)

    def ola(f):
        return jnp.zeros(out_len, jnp.float32).at[idx].add(f.reshape(-1))

    y = jax.vmap(ola)(fr)

    # squared-window normalisation
    wsq = jnp.zeros(out_len, jnp.float32).at[idx].add(jnp.broadcast_to(w * w, (T, n_fft)).reshape(-1))
    y = y / jnp.maximum(wsq, 1e-11)

    if cfg.center:
        pad = n_fft // 2
        y = y[:, pad : out_len - pad]
    if length is not None:
        cur = y.shape[-1]
        if length <= cur:
            y = y[:, :length]
        else:
            y = jnp.pad(y, ((0, 0), (0, length - cur)))
    return y.reshape(lead + y.shape[-1:])


def reconstruct_from_magnitude(mag: jax.Array, phase: jax.Array,
                               cfg: Optional[FrontendConfig] = None,
                               length: Optional[int] = None) -> jax.Array:
    """Magnitude (linear) + phase (radians) -> waveform, both ``[..., T, bins]``.

    The reference's stem-magnitude + mix-phase reconstruction experiment
    (experiments.ipynb cells 44-53)."""
    return istft(mag * jnp.exp(1j * phase), cfg, length=length)


def mix_in_spectrogram_domain(stem_specs: jax.Array, gains: jax.Array,
                              cfg: Optional[FrontendConfig] = None,
                              length: Optional[int] = None) -> jax.Array:
    """Gain-weighted complex-spectrogram mixdown: ``[..., S, T, bins]`` stems x
    ``[..., S]`` gains -> ISTFT waveform."""
    mixed = jnp.einsum("...stb,...s->...tb", stem_specs, gains.astype(stem_specs.dtype))
    return istft(mixed, cfg, length=length)
