"""Gain/mixdown math, smoothing, mask stretching, IIR, loudness."""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from tpumix.ops.gain import (
    amplitude_to_db_scalar,
    augment_features_db,
    db_to_amplitude,
    dummy_mix_db,
    spectral_mix,
    stereo_to_mono,
)
from tpumix.ops.iir import biquad_cascade_jax, biquad_jax
from tpumix.ops.loudness import (
    Meter,
    integrated_loudness,
    k_weighting_coeffs,
    normalize_loudness,
)
from tpumix.ops.smoothing import (
    default_savgol_window,
    interpolate_mask,
    interpolate_mask_np,
    savgol_smooth,
    savgol_smooth_jax,
)


class TestGainOps:
    def test_db_to_amplitude_matches_reference_formula(self):
        # reference dataset_utils.py:46-50: 10 ** (0.5 * x).  NOTE: this is
        # deliberately NOT the inverse of amplitude_to_db (20*log10) — a
        # reference quirk preserved for parity (SURVEY.md §2.2).
        x = np.linspace(-3, 3, 13)
        np.testing.assert_allclose(
            np.asarray(db_to_amplitude(jnp.asarray(x))), 10.0 ** (0.5 * x), rtol=1e-5
        )

    def test_amplitude_to_db_scalar_formula(self):
        x = np.asarray([0.1, 1.0, 2.0, 10.0])
        np.testing.assert_allclose(
            np.asarray(amplitude_to_db_scalar(jnp.asarray(x))), 20 * np.log10(x), rtol=1e-5
        )

    def test_spectral_mix(self):
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((2, 4, 8, 6)).astype(np.float32)
        gains = rng.standard_normal((2, 4)).astype(np.float32)
        out = np.asarray(spectral_mix(jnp.asarray(feats), jnp.asarray(gains)))
        expected = np.einsum("bsft,bs->bft", feats, gains)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_dummy_mix_floor(self):
        # DummyModel semantics (reference baselines/dummy_model.py): per-stem
        # 10**(0.5*db) -> sum -> 20*log10.  For 4 equal stems at d dB the
        # result is 20*(log10(4) + 0.5*d).
        d = -20.0
        db = np.full((1, 4, 5, 5), d, dtype=np.float32)
        out = np.asarray(dummy_mix_db(jnp.asarray(db)))
        np.testing.assert_allclose(out, 20 * (np.log10(4.0) + 0.5 * d), atol=1e-3)

    def test_augment_features_adds_db_gain(self):
        feats = jnp.zeros((4, 8, 6))
        out = np.asarray(augment_features_db(feats, jax.random.key(0)))
        # one constant offset per stem, within [20log10(0.6), 20log10(1.4)]
        per_stem = out.reshape(4, -1)
        assert np.allclose(per_stem.std(axis=1), 0, atol=1e-6)
        assert np.all(per_stem[:, 0] >= 20 * np.log10(0.6) - 1e-5)
        assert np.all(per_stem[:, 0] <= 20 * np.log10(1.4) + 1e-5)

    def test_stereo_to_mono(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 100)))
        np.testing.assert_allclose(
            np.asarray(stereo_to_mono(x)), np.asarray(x).mean(axis=0), atol=1e-6
        )


class TestSmoothing:
    def test_window_policy(self):
        # reference inference_utils.py:137-139
        assert default_savgol_window(100) == 25
        assert default_savgol_window(96) == 25  # 24 -> forced odd
        assert default_savgol_window(203) == 51

    @pytest.mark.parametrize("n,window,poly", [(50, 11, 2), (200, 51, 2), (40, 9, 3)])
    def test_savgol_matches_scipy(self, n, window, poly):
        rng = np.random.default_rng(2)
        y = rng.standard_normal(n)
        ours = savgol_smooth(y, window, poly)
        ref = scipy.signal.savgol_filter(y, window, poly)  # mode='interp'
        np.testing.assert_allclose(ours, ref, atol=1e-8)

    def test_savgol_jax_matches_numpy(self):
        rng = np.random.default_rng(3)
        y = rng.standard_normal((4, 80)).astype(np.float32)
        ours = np.asarray(savgol_smooth_jax(jnp.asarray(y), 19, 2))
        ref = savgol_smooth(y, 19, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_interpolate_mask_reference_semantics(self):
        # reference inference_utils.py:12-41: integer coef, last-value tail
        mask = np.array([1.0, 2.0, 3.0])
        out = interpolate_mask_np(mask, 10)  # coef = 3
        expected = np.array([1, 1, 1, 2, 2, 2, 3, 3, 3, 3], dtype=float)
        np.testing.assert_array_equal(out, expected)

    def test_interpolate_mask_jnp_matches_np(self):
        mask = np.array([0.5, 1.5, 2.5, 3.5, 4.5])
        out_np = interpolate_mask_np(mask, 23)
        out_j = np.asarray(interpolate_mask(jnp.asarray(mask), 23))
        np.testing.assert_allclose(out_j, out_np, atol=1e-6)


class TestIIR:
    def test_biquad_matches_scipy(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(2048).astype(np.float32)
        (b1, a1), (b2, a2) = k_weighting_coeffs(44100.0)
        ours = np.asarray(biquad_jax(jnp.asarray(x), b1, a1))
        ref = scipy.signal.lfilter(b1, a1, x)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_cascade_matches_scipy(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(1024).astype(np.float32)
        secs = list(k_weighting_coeffs(48000.0))
        ours = np.asarray(biquad_cascade_jax(jnp.asarray(x), secs))
        ref = x
        for b, a in secs:
            ref = scipy.signal.lfilter(b, a, ref)
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_overlap_save_long_signal(self):
        # force the multi-block overlap-save path with a small block size
        from tpumix.ops.iir import fft_filter, fir_from_biquads

        rng = np.random.default_rng(8)
        x = rng.standard_normal(40_000).astype(np.float32)
        (b1, a1), _ = k_weighting_coeffs(44100.0)
        h = fir_from_biquads([(b1, a1)], fir_len=2048)
        ours = np.asarray(fft_filter(jnp.asarray(x), jnp.asarray(h, dtype=jnp.float32), block=8192))
        ref = scipy.signal.lfilter(b1, a1, x)
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_batched(self):
        rng = np.random.default_rng(9)
        x = rng.standard_normal((3, 1000)).astype(np.float32)
        (b1, a1), _ = k_weighting_coeffs(44100.0)
        ours = np.asarray(biquad_jax(jnp.asarray(x), b1, a1))
        ref = scipy.signal.lfilter(b1, a1, x, axis=-1)
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestLoudness:
    def test_997hz_sine_reads_minus_3(self):
        # BS.1770 calibration: 997 Hz full-scale sine ~= -3.01 LUFS
        fs = 48000
        t = np.arange(fs * 5) / fs
        sine = np.sin(2 * np.pi * 997.0 * t)
        lufs = integrated_loudness(sine, fs)
        assert abs(lufs - (-3.01)) < 0.1

    def test_gain_shifts_loudness_linearly(self):
        fs = 44100
        rng = np.random.default_rng(6)
        x = 0.1 * rng.standard_normal(fs * 3)
        l0 = integrated_loudness(x, fs)
        l1 = integrated_loudness(x * 10 ** (-6 / 20), fs)
        assert abs((l0 - l1) - 6.0) < 0.2

    def test_normalize_loudness(self):
        fs = 44100
        t = np.arange(fs * 2) / fs
        x = 0.25 * np.sin(2 * np.pi * 440 * t)
        l = integrated_loudness(x, fs)
        y = normalize_loudness(x, l, -20.0)
        assert abs(integrated_loudness(y, fs) - (-20.0)) < 0.05

    def test_meter_api(self):
        fs = 44100
        x = 0.1 * np.sin(2 * np.pi * 300 * np.arange(fs) / fs)
        m = Meter(fs)
        stereo = np.stack([x, x], axis=1)  # [samples, ch]
        mono = m.integrated_loudness(x)
        st = m.integrated_loudness(stereo)
        # stereo doubling adds ~3 dB
        assert abs((st - mono) - 3.01) < 0.1

    def test_silence_is_minus_inf(self):
        assert integrated_loudness(np.zeros(44100), 44100) == -np.inf


class TestLoudnessJax:
    def test_matches_host_meter(self):
        import jax.numpy as jnp

        from tpumix.ops.loudness import integrated_loudness, integrated_loudness_jax

        fs = 44100
        rng = np.random.default_rng(11)
        x = (0.1 * rng.standard_normal((2, fs * 3))).astype(np.float32)
        host = integrated_loudness(x.T, fs)  # host API: [samples, ch]
        dev = float(integrated_loudness_jax(jnp.asarray(x), fs))  # [ch, samples]
        assert abs(host - dev) < 0.02

    def test_batched_vmap(self):
        import jax
        import jax.numpy as jnp

        from tpumix.ops.loudness import integrated_loudness, integrated_loudness_jax

        fs = 44100
        rng = np.random.default_rng(12)
        batch = (0.2 * rng.standard_normal((3, 1, fs * 2))).astype(np.float32)
        dev = np.asarray(jax.vmap(lambda a: integrated_loudness_jax(a, fs))(jnp.asarray(batch)))
        for i in range(3):
            host = integrated_loudness(batch[i, 0], fs)
            assert abs(host - dev[i]) < 0.02

    def test_gating_matters(self):
        # a loud burst in long near-silence: the gate must ignore the quiet
        # blocks so the result tracks the burst loudness
        import jax.numpy as jnp

        from tpumix.ops.loudness import integrated_loudness, integrated_loudness_jax

        fs = 44100
        t = np.arange(fs * 4) / fs
        x = np.where(t < 1.0, 0.5 * np.sin(2 * np.pi * 997 * t), 1e-5 * np.sin(2 * np.pi * 997 * t))
        host = integrated_loudness(x, fs)
        dev = float(integrated_loudness_jax(jnp.asarray(x.astype(np.float32)), fs))
        assert abs(host - dev) < 0.05
        assert dev > -15  # near the burst loudness, not the average
