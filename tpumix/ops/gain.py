"""Gain / mixdown math: dB<->amplitude converters, spectral mix-sum,
feature-domain augmentation.

Parity contracts:
* ``db_to_amplitude`` / ``amplitude_to_db_scalar`` — reference
  data/dataset_utils.py:39-50 and models/model_scalar_1s.py:193-204
  (``10**(0.5*x)`` and ``20*log10(x)``).
* ``spectral_mix`` — the mix-in-spectrogram sum ``masked = sum_i g_i * X_i``
  computed inside every reference model forward
  (model_scalar_1s.py:260-273, model_scalar_2s.py:117-130,
  model_resnet.py:120-124).  Note the reference quirk, preserved here and
  documented: during training the scalar gains multiply *dB-domain* values.
* ``augment_features_db`` — feature-level augmentation: random per-stem linear
  gains converted to dB and *added* to dB spectrograms (reference
  data/dataset.py:170-179); equivalent to waveform-domain gain (validated in
  reference experiments.ipynb cells 17-19).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LN10 = 2.302585092994046


def db_to_amplitude(x: jax.Array) -> jax.Array:
    """``10 ** (0.5 * x)`` (reference dataset_utils.py:46-50)."""
    return jnp.exp((0.5 * _LN10) * x)


def amplitude_to_db_scalar(x: jax.Array) -> jax.Array:
    """``20 * log10(x)`` (reference dataset_utils.py:39-43)."""
    return 20.0 * jnp.log(x) / _LN10


def spectral_mix(stem_features: jax.Array, gains: jax.Array) -> jax.Array:
    """Gain-weighted sum of stem spectrograms.

    :param stem_features: ``[..., num_stems, F, T]`` stacked per-stem features
        (dB domain during training — reference quirk preserved).
    :param gains: ``[..., num_stems]`` scalar per-stem gains.
    :return: ``[..., F, T]`` predicted mix spectrogram.
    """
    return jnp.einsum("...sft,...s->...ft", stem_features, gains)


def dummy_mix_db(stem_features_db: jax.Array, stem_axis: int = -3) -> jax.Array:
    """The DummyModel baseline: dB -> amplitude -> sum over stems -> dB
    (reference models/baselines/dummy_model.py:19-34).  Establishes the naive
    spectrogram-sum MSE floor (0.0035 with the round-trip vs 0.0786 without,
    reference experiments.ipynb markdown after cell 12)."""
    amp = db_to_amplitude(stem_features_db)
    summed = jnp.sum(amp, axis=stem_axis)
    return amplitude_to_db_scalar(summed)


def augment_features_db(
    features_db: jax.Array,
    rng: jax.Array,
    gain_from: float = 0.6,
    gain_to: float = 1.4,
) -> jax.Array:
    """Per-stem random-gain augmentation in the dB feature domain.

    :param features_db: ``[..., num_stems, F, T]``.
    :param rng: JAX PRNG key; one gain per stem (and per leading batch element).
    """
    stem_shape = features_db.shape[:-2]
    gains = jax.random.uniform(rng, stem_shape, minval=gain_from, maxval=gain_to)
    gains_db = 20.0 * jnp.log(gains) / _LN10
    return features_db + gains_db[..., None, None]


def augment_audio(
    audio: jax.Array, rng: jax.Array, gain_from: float = 0.6, gain_to: float = 1.4
) -> jax.Array:
    """Waveform-domain random gain (reference data/dataset.py:164-168); one
    gain per leading batch element."""
    gains = jax.random.uniform(rng, audio.shape[:-1], minval=gain_from, maxval=gain_to)
    return audio * gains[..., None]


def stereo_to_mono(audio: jax.Array, channel_axis: int = -2) -> jax.Array:
    """Downmix by channel mean (reference data/dataset.py:181-183)."""
    return jnp.mean(audio, axis=channel_axis)
