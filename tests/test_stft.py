"""Frontend conformance vs the reference oracle (torch.stft + the documented
amplitude_to_DB formula; reference data/dataset.py:132-162).

Target: bit-close features (BASELINE.md: STFT bit-close; gain MAE <= 1e-3)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tpumix.config import FrontendConfig
from tpumix.ops.stft import (
    amplitude_to_db,
    frame_signal,
    hann_window,
    spectrogram_features,
    spectrogram_features_tm,
    stft_magnitude,
)


def torch_reference_features(audio: np.ndarray, n_fft=2048, hop=1024) -> np.ndarray:
    """The reference frontend, reproduced with torch (oracle)."""
    spectrum = torch.stft(
        torch.from_numpy(audio.astype(np.float32)),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        return_complex=True,
    )
    mag = torch.abs(spectrum)
    # torchaudio amplitude_to_DB(multiplier=20, amin=1e-5, db_multiplier=0)
    db = 20.0 * torch.log10(torch.clamp(mag, min=1e-5))
    return db.numpy()


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(44100) / 44100.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 97 * t)
    sig += 0.05 * rng.standard_normal(44100)
    return sig.astype(np.float32)


@pytest.mark.parametrize("hop", [512, 1024])
def test_features_match_torch(audio, hop):
    cfg = FrontendConfig(hop_length=hop)
    ours = np.asarray(spectrogram_features(jnp.asarray(audio), cfg))
    ref = torch_reference_features(audio, hop=hop)
    assert ours.shape == ref.shape == (1025, 1 + 44100 // hop)
    # dB-domain closeness: float32 FFT rounding; the max error concentrates in
    # bins near the 1e-5 clamp floor where log10 amplifies ~1e-7 magnitude
    # noise — irrelevant to the linear-gain MAE <= 1e-3 target (BASELINE.md)
    assert np.max(np.abs(ours - ref)) < 1e-2
    assert np.mean(np.abs(ours - ref)) < 1e-4


@pytest.mark.parametrize("hop", [512, 1024])
def test_matmul_implementation_matches_fft(audio, hop):
    cfg_fft = FrontendConfig(hop_length=hop, implementation="fft")
    cfg_mm = FrontendConfig(hop_length=hop, implementation="matmul")
    f1 = np.asarray(spectrogram_features(jnp.asarray(audio), cfg_fft))
    f2 = np.asarray(spectrogram_features(jnp.asarray(audio), cfg_mm))
    # f32 DFT-matmul rounding: rare heavily-cancelling bins can deviate by
    # ~0.1 dB; the bulk of the spectrum agrees to ~1e-5 dB
    d = np.abs(f1 - f2)
    assert np.max(d) < 0.2
    assert np.mean(d) < 1e-4
    assert np.quantile(d, 0.999) < 5e-3


@pytest.mark.parametrize("hop", [512, 1024])
def test_ct_implementation_matches_fft(audio, hop):
    cfg_fft = FrontendConfig(hop_length=hop, implementation="fft")
    cfg_ct = FrontendConfig(hop_length=hop, implementation="ct")
    f1 = np.asarray(spectrogram_features(jnp.asarray(audio), cfg_fft))
    f2 = np.asarray(spectrogram_features(jnp.asarray(audio), cfg_ct))
    # factorized bins sum N2+N1 terms instead of n_fft -> tighter than the
    # direct matmul basis; residual max lives in near-clamp bins
    d = np.abs(f1 - f2)
    assert np.max(d) < 0.1
    assert np.mean(d) < 1e-4
    assert np.quantile(d, 0.999) < 5e-3


def test_ct_batched_and_gradable():
    # arbitrary leading dims + native differentiability (no custom VJP needed)
    cfg = FrontendConfig(hop_length=512, implementation="ct")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 44100)).astype(np.float32))
    out = spectrogram_features(x, cfg)
    assert out.shape == (2, 3, 1025, 87)
    g = jax.grad(lambda v: jnp.sum(spectrogram_features(v, cfg) ** 2))(x[0, 0])
    assert np.isfinite(np.asarray(g)).all()


def test_ct_applicability_fallback():
    from tpumix.ops.stft import ct_applicable

    assert ct_applicable(FrontendConfig(hop_length=512))
    assert ct_applicable(FrontendConfig(hop_length=1024))
    odd = FrontendConfig(hop_length=500, implementation="ct")
    assert not ct_applicable(odd)
    # odd hop silently takes the matmul path with identical contract
    x = jnp.asarray(np.random.default_rng(2).standard_normal(22050).astype(np.float32))
    ref = spectrogram_features(x, FrontendConfig(hop_length=500, implementation="matmul"))
    out = spectrogram_features(x, odd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_frame_counts_match_survey():
    # SURVEY.md §2.2 frame budget table
    cfg512 = FrontendConfig(hop_length=512)
    cfg1024 = FrontendConfig(hop_length=1024)
    assert cfg512.num_frames(44100) == 87
    assert cfg512.num_frames(88200) == 173
    assert cfg1024.num_frames(44100) == 44
    assert cfg1024.num_frames(88200) == 87
    assert cfg1024.num_frames(220500) == 216


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(2048))
    ref = torch.hann_window(2048).numpy()
    # our f64-designed window differs from torch's f32 computation by <= 1 ulp-ish
    np.testing.assert_allclose(ours, ref, atol=5e-7)


def test_frame_signal_batched(audio):
    batch = jnp.stack([jnp.asarray(audio)] * 3)
    frames = frame_signal(batch, 2048, 1024)
    assert frames.shape == (3, 44, 2048)
    single = frame_signal(jnp.asarray(audio), 2048, 1024)
    np.testing.assert_array_equal(np.asarray(frames[1]), np.asarray(single))


def test_amplitude_to_db_clamps():
    x = jnp.asarray([0.0, 1e-6, 1e-5, 1.0, 10.0])
    db = np.asarray(amplitude_to_db(x))
    np.testing.assert_allclose(db, [-100.0, -100.0, -100.0, 0.0, 20.0], atol=2e-3)


def test_time_major_layout_consistent(audio):
    cfg = FrontendConfig(hop_length=512)
    fm = np.asarray(spectrogram_features(jnp.asarray(audio), cfg))  # [bins, frames]
    tm = np.asarray(spectrogram_features_tm(jnp.asarray(audio), cfg))  # [frames, bins]
    np.testing.assert_array_equal(fm, tm.T)


def test_jit_and_vmap_compatible(audio):
    import jax

    cfg = FrontendConfig(hop_length=512)
    fn = jax.jit(lambda x: spectrogram_features(x, cfg))
    batched = jax.vmap(lambda x: spectrogram_features(x, cfg))
    single = np.asarray(fn(jnp.asarray(audio)))
    stacked = np.asarray(batched(jnp.stack([jnp.asarray(audio)] * 2)))
    np.testing.assert_allclose(stacked[0], single, atol=1e-5)
