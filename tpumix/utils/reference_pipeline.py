"""Reference-equivalent CPU pipeline: the 1x throughput denominator and the
conformance oracle.

The reference publishes no throughput numbers (BASELINE.md), so the benchmark
suite must measure the reference-equivalent pipeline itself to establish the
denominator for the ">=50x on one chip" target.  This module reproduces the
reference's *control flow and numerics* exactly — per-chunk sequential
processing, host-side torch.stft frontend, one batch-of-1 torch model call
per chunk, scipy Savitzky-Golay smoothing, nearest-neighbour mask stretch —
using a torch twin of the tpumix model with weights exported via
tpumix.models.convert (the reference's own trained weights are not shipped in
its repo).

Used by:
* ``bench.py`` — CPU wall-clock of ``reference_mix_song_smooth`` = the 1x
  baseline for audio-seconds/sec;
* ``tests/test_infer.py`` — gain-MAE <= 1e-3 conformance of the batched TPU
  path against this oracle (BASELINE.md target).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

STEMS: Tuple[str, ...] = ("bass", "drums", "vocals", "other")


def build_torch_twin(flax_params, flax_batch_stats, block1_dilation: int = 1):
    """Construct a torch module numerically equivalent to
    MixingModelScalar1s/2s and load the given flax weights into it."""
    import torch
    import torch.nn as nn

    from tpumix.models.convert import flax_scalar_to_torch

    spec = [  # (in, out, k, stride, dilation)
        (4, 16, 3, 2, block1_dilation),
        (16, 32, 5, 1, 1),
        (32, 48, 5, 1, 1),
        (48, 64, 7, 1, 1),
        (64, 128, 9, 1, 1),
    ]

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            for i, (cin, cout, k, s, d) in enumerate(spec, start=1):
                setattr(self, f"conv_b{i}", nn.Sequential())
                blk = getattr(self, f"conv_b{i}")
                blk.add_module("conv", nn.Conv2d(cin, cout, k, stride=s, dilation=d))
                blk.add_module("batch_norm", nn.BatchNorm2d(cout, momentum=0.90, eps=1e-3))
            for i in range(1, 5):
                setattr(self, f"conv_head{i}", nn.Conv2d(128, 1, 1))
                setattr(self, f"fc_head{i}", nn.LazyLinear(1))

        def forward(self, x):
            h = x
            for i in range(1, 6):
                blk = getattr(self, f"conv_b{i}")
                h = torch.relu(blk.batch_norm(blk.conv(h)))
            gains = []
            for i in range(1, 5):
                g = torch.relu(getattr(self, f"conv_head{i}")(h))
                g = getattr(self, f"fc_head{i}")(g.reshape(x.shape[0], -1))
                gains.append(g)
            masked = sum(g.unsqueeze(2) * x[:, i] for i, g in enumerate(gains))
            return masked, tuple(gains)

    twin = Twin().eval()
    sd = flax_scalar_to_torch(flax_params, flax_batch_stats)
    # materialise lazy fc layers at the right width before loading
    flat = sd["fc_head1.weight"].shape[1]
    for i in range(1, 5):
        fc = nn.Linear(flat, 1)
        setattr(twin, f"fc_head{i}", fc)
    twin.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()})
    return twin.eval()


def torch_compute_features(audio: np.ndarray, n_fft: int = 2048, hop: int = 1024):
    """The reference frontend verbatim semantics on torch CPU
    (reference data/dataset.py:132-162)."""
    import torch

    spectrum = torch.stft(
        torch.from_numpy(np.asarray(audio, dtype=np.float32)),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    )
    mag = torch.abs(spectrum)
    return 20.0 * torch.log10(torch.clamp(mag, min=1e-5))


def reference_mix_song_smooth(
    torch_model,
    loaded_tracks: Dict[str, np.ndarray],
    chunk_length: float = 1.0,
    sr: int = 44100,
    hop: int = 512,
    n_fft: int = 2048,
):
    """The reference's sequential full-song path (inference_utils.py:105-145):
    per-chunk host STFT + batch-of-1 model call, then scipy smoothing.

    Returns ``(mixed_tracks, raw_gains, smooth_gains)``.
    """
    import torch
    from scipy.signal import savgol_filter

    from tpumix.ops.smoothing import interpolate_mask_np

    def mono(x):
        x = np.asarray(x, dtype=np.float32)
        return x.mean(axis=0) if x.ndim == 2 else x

    tracks_mono = {t: mono(loaded_tracks[t]) for t in STEMS}
    S = len(tracks_mono["drums"])
    chunk_samples = int(round(chunk_length * sr))
    num_chunks = S // chunk_samples

    raw_gains: Dict[str, list] = {t: [] for t in STEMS}
    with torch.no_grad():
        for chunk_i in range(1, num_chunks):
            i_from = (chunk_i - 1) * chunk_samples
            i_to = chunk_i * chunk_samples
            feats = [
                torch_compute_features(tracks_mono[t][i_from:i_to], n_fft, hop) for t in STEMS
            ]
            x = torch.stack(feats).unsqueeze(0)  # [1, 4, F, T]
            _, gains = torch_model(x)
            for i, t in enumerate(STEMS):
                g = float(gains[i].squeeze())
                raw_gains[t].append(float(10.0 ** (0.5 * g)))

    smooth_gains: Dict[str, list] = {t: [] for t in STEMS}
    mixed_tracks: Dict[str, np.ndarray] = {}
    for t in STEMS:
        curve = np.asarray(raw_gains[t])
        if len(curve) >= 3:
            win = num_chunks // 4
            win = win if win % 2 else win + 1
            win = max(3, min(win, len(curve) if len(curve) % 2 else len(curve) - 1))
            smoothed = savgol_filter(curve, win, min(2, win - 1))
        else:
            smoothed = curve
        smooth_gains[t] = list(smoothed)
        track = np.asarray(loaded_tracks[t], dtype=np.float32)
        mask = interpolate_mask_np(smoothed, track.shape[-1]).astype(np.float32)
        mixed_tracks[t] = track * mask
    return mixed_tracks, raw_gains, smooth_gains
