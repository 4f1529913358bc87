"""Streaming (live) mixing: causal per-chunk gains with click-free ramps.

The reference has no live path — its only full-song mixer needs the entire
song up front because Savitzky-Golay smoothing is non-causal over the whole
gain curve (reference inference_utils.py:105-145).  tpumix's batched mixer
keeps that contract (tpumix/infer/mixer.py); this module adds the live
variant for monitoring / latency-bound use:

* audio arrives one chunk (``chunk_samples``) at a time per stem;
* each chunk's gains come from the same compiled device program the batched
  mixer uses (segment size 1 — a [4, C] transfer + one forward per chunk);
* smoothing is CAUSAL: a one-pole exponential average over the chunk gain
  sequence (the online analogue of the reference's savgol low-pass), and the
  applied per-sample gain ramps linearly from the previous chunk's value to
  the new smoothed value across the chunk — no zipper/click at boundaries;
* total algorithmic latency is exactly one chunk (the chunk must be complete
  before its gains exist) — the reference pipeline's is a whole song.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from tpumix.config import MixConfig, ModelConfig
from tpumix.infer.mixer import STEMS, SongMixer


class StreamingMixer:
    """Causal chunk-by-chunk mixer sharing SongMixer's device program.

    Usage::

        sm = StreamingMixer(model, variables, cfg)
        for chunk in live_chunks:          # chunk: [4, C] mono stems
            mixed = sm.push(chunk)         # [C] mixed audio, 1-chunk latency

    ``push`` accepts ``[4, C]`` mono stems or ``[4, channels, C]`` multi-
    channel stems (gains are computed on the mono downmix, applied to every
    channel — the batched mixer's convention).
    """

    def __init__(
        self,
        model,
        variables,
        model_cfg: ModelConfig,
        smoothing_alpha: float = 0.35,
        transfer_dtype: str = "float32",
        mix_cfg: Optional[MixConfig] = None,
        inner_mixer: Optional[SongMixer] = None,
    ):
        """``smoothing_alpha``: one-pole coefficient in (0, 1] — the weight of
        the NEW chunk's gain (1.0 = no smoothing).  0.35 has an effective
        averaging window of ~1/0.35 ≈ 3 chunks, matching the reference's
        savgol window (num_chunks//4 ≈ 3..7 on typical songs) in bandwidth.

        ``inner_mixer``: share an existing segment-size-1 SongMixer instead
        of building one — a fresh SongMixer carries its own jit closure, so
        per-stream construction would re-trace and re-compile the device
        program per stream (the serving layer hands every connection the
        same inner mixer; smoothing state stays per-StreamingMixer).
        """
        if not 0.0 < smoothing_alpha <= 1.0:
            raise ValueError(f"smoothing_alpha must be in (0, 1], got {smoothing_alpha}")
        if inner_mixer is not None:
            if (inner_mixer.mix_cfg.max_chunks or 0) != 1:
                raise ValueError("inner_mixer must use max_chunks=1 segments")
            self._mixer = inner_mixer
        else:
            inner_cfg = mix_cfg or MixConfig(
                chunk_length_s=model_cfg.chunk_length_s, max_chunks=1
            )
            if inner_cfg.max_chunks != 1:
                import dataclasses

                inner_cfg = dataclasses.replace(inner_cfg, max_chunks=1)
            self._mixer = SongMixer(
                model, variables, model_cfg, mix_cfg=inner_cfg,
                transfer_dtype=transfer_dtype,
            )
        self.chunk_samples = self._mixer.chunk_samples
        self.alpha = float(smoothing_alpha)
        self.reset()

    def reset(self) -> None:
        """Forget smoothing state (start of a new stream)."""
        self._g_smooth: Optional[np.ndarray] = None  # [4] amplitude gains
        self._g_applied: Optional[np.ndarray] = None  # last sample's gains

    # -- internals -------------------------------------------------------------

    def _chunk_gains(self, mono: np.ndarray) -> np.ndarray:
        """[4, C] mono chunk -> [4] amplitude gains via the shared device
        program (segment size 1: one chunk + the trailing dummy window the
        reference indexing never mixes)."""
        # song_gains computes n_chunks-1 gain windows; append one silent
        # dummy chunk so the real chunk is window 0
        padded = np.concatenate([mono, np.zeros_like(mono)], axis=1)
        g_db = self._mixer.song_gains(padded)  # [1, 4] model-scalar domain
        return (10.0 ** (0.5 * g_db[0])).astype(np.float64)

    # -- public API ------------------------------------------------------------

    def push(self, stems_chunk: np.ndarray) -> np.ndarray:
        """Mix one chunk: returns the gain-weighted stem sum with causal
        smoothing and a linear boundary ramp.  Input ``[4, C]`` or
        ``[4, channels, C]``; output ``[C]`` / ``[channels, C]``.
        """
        x = np.asarray(stems_chunk, dtype=np.float32)
        if x.shape[0] != len(STEMS):
            raise ValueError(f"expected leading stem axis of {len(STEMS)}, got {x.shape}")
        if x.shape[-1] != self.chunk_samples:
            raise ValueError(
                f"chunk must have {self.chunk_samples} samples, got {x.shape[-1]}"
            )
        mono = x.mean(axis=1) if x.ndim == 3 else x

        g_new = self._chunk_gains(mono)
        if self._g_smooth is None:
            self._g_smooth = g_new
            self._g_applied = g_new
        else:
            self._g_smooth = (1.0 - self.alpha) * self._g_smooth + self.alpha * g_new

        # per-sample linear ramp from the previously applied gain to the new
        # smoothed target (no discontinuity at the chunk boundary)
        C = self.chunk_samples
        ramp = np.linspace(0.0, 1.0, C, endpoint=True)[None, :]
        gains_t = self._g_applied[:, None] + (self._g_smooth - self._g_applied)[:, None] * ramp
        self._g_applied = self._g_smooth.copy()

        gains_t = gains_t.astype(np.float32)
        if x.ndim == 3:
            return np.einsum("sct,st->ct", x, gains_t)
        return np.einsum("st,st->t", x, gains_t)

    def push_tracks(self, tracks: Dict[str, np.ndarray]) -> np.ndarray:
        """Dict convenience wrapper (tpumix STEMS order)."""
        return self.push(np.stack([np.asarray(tracks[t]) for t in STEMS]))

    @property
    def current_gains(self) -> Optional[Tuple[float, ...]]:
        """Latest smoothed amplitude gains (None before the first chunk)."""
        if self._g_smooth is None:
            return None
        return tuple(float(v) for v in self._g_smooth)
