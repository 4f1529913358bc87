"""Baseline mixing systems (reference models/baselines/).

* ``DummyModel`` — parameterless spectrogram-domain naive sum with dB<->amp
  round-trip (reference baselines/dummy_model.py:19-34); calibrates the
  achievable MSE floor (experiments.ipynb cells 4-12).
* ``RandomModel`` — per-stem uniform random linear gain in [0.5, 1.5] applied
  to waveform dicts (baselines/random_model.py:4-14).
* ``MeanLoudnessModel`` — loudness-normalise each stem to the train-set mean
  LUFS of its class (baselines/mean_loudness_model.py:4-20), using tpumix's
  own BS.1770 meter.

Random/MeanLoudness operate on host-side waveform dicts exactly like the
reference (they are evaluation-time comparators, not device programs).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpumix.ops.gain import dummy_mix_db
from tpumix.ops.loudness import integrated_loudness, normalize_loudness

STEMS: Tuple[str, ...] = ("bass", "drums", "vocals", "other")


class DummyModel:
    """``forward(x [B, S, F, T] dB) -> [B, F, T]`` naive spectrogram sum."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return dummy_mix_db(x, stem_axis=-3)

    forward = __call__


class RandomModel:
    """Per-stem uniform random gain on waveform dicts."""

    def __init__(self, gain_from: float = 0.5, gain_to: float = 1.5,
                 rng: Optional[np.random.Generator] = None):
        self.tracklist = STEMS
        self._gain_from = gain_from
        self._gain_to = gain_to
        self._rng = rng or np.random.default_rng()

    def forward(self, x: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {
            track: float(self._rng.uniform(self._gain_from, self._gain_to)) * x[track]
            for track in self.tracklist
        }


class MeanLoudnessModel:
    """Normalise each stem to the train-set mean integrated loudness of its
    class.  ``mean_loudness`` maps stem name -> LUFS (produced by
    ``tpumix.data.dataset.compute_mean_loudness``)."""

    def __init__(self, mean_loudness: Dict[str, float], sr: int = 44100):
        self.mean_loudness = mean_loudness
        self.sr = sr
        self.tracklist = STEMS

    def forward(self, x: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        result = {}
        for track in self.tracklist:
            # waveforms are [channels, samples]; the meter wants [samples, ch]
            audio = np.asarray(x[track])
            loud = integrated_loudness(audio.T, self.sr)
            if not np.isfinite(loud):
                # silent stem: -inf LUFS would imply an infinite gain
                # (0 * inf = NaN audio — the reference's pyloudnorm path has
                # the same hole); pass silence through unchanged instead
                result[track] = audio
                continue
            result[track] = normalize_loudness(audio.T, loud, self.mean_loudness[track]).T
        return result
