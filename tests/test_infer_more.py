"""Additional inference coverage: Scalar2s (dilated) conformance against the
reference-semantics pipeline, ResNet mixer path, checkpoint-converter
roundtrip, degenerate songs."""

import numpy as np
import pytest

# integration-scale module: excluded from the fast tier (-m 'not slow and not heavy')
pytestmark = pytest.mark.heavy

import jax

from tpumix.config import ModelConfig
from tpumix.infer.mixer import SongMixer, STEMS
from tpumix.models import (
    GainResNet,
    MixingModelScalar2s,
    flax_scalar_to_torch,
    torch_scalar_to_flax,
)
from tpumix.utils.reference_pipeline import build_torch_twin, reference_mix_song_smooth

SR = 44100


@pytest.fixture(scope="module")
def song():
    rng = np.random.default_rng(7)
    n = 16 * SR  # 8 chunks of 2 s
    t = np.arange(n) / SR

    def shaped(scale, smooth):
        k = np.ones(smooth) / smooth
        return scale * np.convolve(rng.standard_normal(n), k, mode="same")

    return {
        "bass": (0.4 * np.sin(2 * np.pi * 70 * t) + shaped(0.1, 48)).astype(np.float32),
        "drums": shaped(0.3, 2).astype(np.float32),
        "vocals": (0.3 * np.sin(2 * np.pi * 260 * t) + shaped(0.1, 12)).astype(np.float32),
        "other": shaped(0.2, 6).astype(np.float32),
    }


class TestScalar2sConformance:
    def test_gain_mae_vs_reference_pipeline(self, song):
        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
        mixer = SongMixer(model, variables, cfg)
        _, raw_batched, _ = mixer.mix_song_smooth(song)

        twin = build_torch_twin(
            variables["params"], variables["batch_stats"], block1_dilation=2
        )
        _, raw_ref, _ = reference_mix_song_smooth(twin, song, chunk_length=2.0, sr=SR, hop=512)

        for t in STEMS:
            a, b = np.asarray(raw_batched[t]), np.asarray(raw_ref[t])
            assert a.shape == b.shape == (7,)
            mae = np.mean(np.abs(2 * np.log10(a) - 2 * np.log10(b)))
            assert mae <= 1e-3, (t, mae)


class TestResNetMixer:
    def test_resnet_gains_path(self, song):
        model = GainResNet()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 216), np.float32), train=False
        )
        cfg = ModelConfig(name="resnet18", chunk_length_s=5.0, hop_length=1024)
        mixer = SongMixer(model, variables, cfg)
        stems = np.stack([song[t] for t in STEMS])
        gains = mixer.song_gains(stems)
        assert gains.shape == (16 // 5 - 1, 4)  # 3 chunks -> 2 gains
        assert np.all(np.isfinite(gains))


class TestConverterRoundtrip:
    def test_flax_torch_flax(self):
        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(1), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        sd = flax_scalar_to_torch(variables["params"], variables["batch_stats"])
        params2, stats2 = torch_scalar_to_flax(sd)
        for a, b in zip(
            jax.tree.leaves(variables["params"]), jax.tree.leaves(params2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(variables["batch_stats"]), jax.tree.leaves(stats2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_converted_forward_matches(self):
        """Params loaded back from the torch naming scheme drive the flax
        model to identical outputs."""
        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(2), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        sd = flax_scalar_to_torch(variables["params"], variables["batch_stats"])
        params2, stats2 = torch_scalar_to_flax(sd)
        x = np.random.default_rng(0).standard_normal((1, 4, 1025, 173)).astype(np.float32)
        m1, g1 = model.apply(variables, x, train=False)
        m2, g2 = model.apply({"params": params2, "batch_stats": stats2}, x, train=False)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


class TestDegenerateSongs:
    def test_single_chunk_song_passthrough(self):
        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
        mixer = SongMixer(model, variables, cfg)
        tiny = {t: 0.1 * np.ones(2 * SR + 5, np.float32) for t in STEMS}  # 1 chunk
        mixed, raw, smooth = mixer.mix_song_smooth(tiny)
        for t in STEMS:
            np.testing.assert_array_equal(mixed[t], tiny[t])  # unmodified
            assert raw[t] == [] and smooth[t] == []


class TestMixSongRaw:
    def test_raw_gains_piecewise(self, song):
        """Legacy mix_song semantics (reference inference_utils.py:71-100):
        window w's raw gains scale window w itself; the LAST chunk is never
        written (the reference loop covers windows 0..num_chunks-2)."""
        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
        mixer = SongMixer(model, variables, cfg)
        mixed, history = mixer.mix_song_raw(song)
        C = mixer.chunk_samples
        num_chunks = len(song["bass"]) // C
        assert mixed.shape == song["bass"].shape
        # final chunk never mixed (reference writes windows 0..num_chunks-2)
        assert np.all(mixed[(num_chunks - 1) * C :] == 0)
        # window 0 equals the gain-weighted stem sum with window-0 gains
        g0 = np.array([history[t][0] for t in STEMS], dtype=np.float32)
        stems = np.stack([song[t] for t in STEMS])
        expected = (g0[:, None] * stems[:, :C]).sum(axis=0)
        np.testing.assert_allclose(mixed[:C], expected, rtol=1e-5, atol=1e-6)
        assert all(len(history[t]) == num_chunks - 1 for t in STEMS)


class TestMulawTransfer:
    def test_mulaw8_roundtrip_and_gain_deviation(self, song):
        """The mu-law wire format is opt-in and lossy: (a) the device decode
        exactly inverts the host LUT encode's representable levels; (b) the
        gain deviation vs the float32 path is bounded (regression tripwire —
        NOT the 1e-3 conformance budget, which only int16/float32 meet)."""
        import jax.numpy as jnp

        from tpumix.infer.mixer import _dequantize_on_device, _mulaw_lut

        # (a) encode->decode->encode is a fixed point over all 65536 inputs
        lut = _mulaw_lut()
        decoded = np.asarray(_dequantize_on_device(jnp.asarray(lut)))
        pcm = np.clip(np.rint(decoded * 32768.0), -32768, 32767).astype(np.int32)
        np.testing.assert_array_equal(lut[pcm + 32768], lut)

        # (b) gains deviate measurably but boundedly from the float32 path
        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
        stems = np.stack([song[t] for t in STEMS])
        g_f32 = SongMixer(model, variables, cfg, transfer_dtype="float32").song_gains(stems)
        g_mu = SongMixer(model, variables, cfg, transfer_dtype="mulaw8").song_gains(stems)
        dev = np.abs(g_mu - g_f32)
        assert dev.max() < 5.0  # dB-domain scalars; measured ~2 on random init
        assert dev.mean() < 2.0


def test_savgol_polyorder_respects_short_curves():
    """MixConfig(savgol_polyorder=3) on a 3-window song must clamp the
    polyorder to the window, not stretch the window past the curve."""
    import jax

    from tpumix.config import MixConfig, ModelConfig
    from tpumix.infer.mixer import SongMixer, STEMS
    from tpumix.models import MixingModelScalar1s

    model = MixingModelScalar1s()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 4, 1025, 87), np.float32), train=False
    )
    cfg = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)
    mixer = SongMixer(model, variables, cfg,
                      mix_cfg=MixConfig(chunk_length_s=1.0, savgol_polyorder=3))
    rng = np.random.default_rng(0)
    tracks = {t: 0.1 * rng.standard_normal(4 * 44100).astype(np.float32)
              for t in STEMS}  # 4 chunks -> 3 gain windows
    mixed, raw, smooth = mixer.mix_song_smooth(tracks)
    assert all(len(v) == 3 for v in smooth.values())
    assert all(np.all(np.isfinite(v)) for v in mixed.values())


def test_mean_loudness_model_silent_stem_no_nan():
    """A silent stem must pass through unchanged instead of becoming NaN
    (-inf LUFS -> 10**inf gain; the reference's pyloudnorm path shares the
    hole)."""
    from tpumix.models.baselines import MeanLoudnessModel

    rng = np.random.default_rng(0)
    tracks = {t: 0.1 * rng.standard_normal((1, 44100)).astype(np.float32)
              for t in ("bass", "drums", "vocals")}
    tracks["other"] = np.zeros((1, 44100), np.float32)
    out = MeanLoudnessModel({t: -20.0 for t in tracks}).forward(tracks)
    assert np.all(np.isfinite(out["other"]))
    np.testing.assert_array_equal(out["other"], tracks["other"])
    assert np.all(np.isfinite(out["bass"]))


class TestInt12Transfer:
    def test_int12_pack_roundtrip(self):
        """Device decode inverts the host 12-bit pack to within half an LSB
        of the per-row peak scale."""
        import jax.numpy as jnp

        from tpumix.infer.mixer import _dequantize_on_device, _pack_int12

        rng = np.random.default_rng(0)
        x = (0.3 * rng.standard_normal((4, 2000))).astype(np.float32)
        wire, scales = _pack_int12(x)
        assert wire.shape == (4, 3000) and wire.dtype == np.uint8
        dec = np.asarray(_dequantize_on_device(jnp.asarray(wire), jnp.asarray(scales)))
        lsb = scales[:, None] / 2047.0
        assert np.all(np.abs(dec - x) <= 0.5 * lsb + 1e-7)

    def test_int12_gain_deviation_bounded(self, song):
        """Measured gain deviation of the 0.75x-int16 wire format vs float32
        (the docs/PERF.md deviation-vs-bits record; tripwire, not the 1e-3
        conformance budget)."""
        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
        stems = np.stack([song[t] for t in STEMS])
        g_f32 = SongMixer(model, variables, cfg, transfer_dtype="float32").song_gains(stems)
        g_12 = SongMixer(model, variables, cfg, transfer_dtype="int12").song_gains(stems)
        dev = np.abs(g_12 - g_f32)
        assert dev.max() < 1.0  # dB-domain scalars; far tighter than mu-law's ~2
        assert dev.mean() < 0.3


class TestOverlappedSegmentPipeline:
    def test_multi_segment_equals_single_segment(self, song):
        """The background-packer pipeline (multiple 2-chunk segments) must
        reproduce the one-big-segment gains to float noise — chunks are
        independent, so segmentation only changes the compiled batch shape
        (reduction order), never the math."""
        from tpumix.config import MixConfig

        model = MixingModelScalar2s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
        stems = np.stack([song[t] for t in STEMS])
        g_one = SongMixer(
            model, variables, cfg, mix_cfg=MixConfig(chunk_length_s=2.0, max_chunks=16)
        ).song_gains(stems)
        g_seg = SongMixer(
            model, variables, cfg, mix_cfg=MixConfig(chunk_length_s=2.0, max_chunks=2)
        ).song_gains(stems)
        np.testing.assert_allclose(g_one, g_seg, atol=1e-5, rtol=1e-5)
