"""Fully device-resident mixing path (``SongMixer.mix_song_smooth_device``):
gains + Savitzky-Golay smoothing + mask stretch + scaling + mixdown all inside
device programs must reproduce the host-epilogue path (which is itself pinned
to the reference pipeline by tests/test_infer.py; reference
inference_utils.py:105-145)."""

import numpy as np
import pytest

# integration-scale module: excluded from the fast tier (-m 'not slow and not heavy')
pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from tpumix.config import MixConfig, ModelConfig
from tpumix.infer.mixer import SongMixer, STEMS
from tpumix.models import MixingModelScalar1s

SR = 44100


@pytest.fixture(scope="module")
def model_and_vars():
    model = MixingModelScalar1s()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 4, 1025, 87), np.float32), train=False
    )
    return model, variables


def _song(dur_s: float, seed: int = 42):
    rng = np.random.default_rng(seed)
    n = int(dur_s * SR)
    t = np.arange(n) / SR

    def shaped_noise(scale, smooth):
        x = rng.standard_normal(n)
        k = np.ones(smooth) / smooth
        return scale * np.convolve(x, k, mode="same")

    return {
        "bass": (0.4 * np.sin(2 * np.pi * 80 * t) + shaped_noise(0.1, 64)).astype(
            np.float32
        ),
        "drums": (shaped_noise(0.3, 2) * (np.sin(2 * np.pi * 3 * t) > 0.3)).astype(
            np.float32
        ),
        "vocals": (
            0.3 * np.sin(2 * np.pi * 300 * t + np.sin(2 * np.pi * 2 * t))
            + shaped_noise(0.1, 16)
        ).astype(np.float32),
        "other": shaped_noise(0.2, 8).astype(np.float32),
    }


@pytest.fixture(scope="module")
def song():
    return _song(14.0)


def _mixer(model_and_vars, **mix_kwargs):
    model, variables = model_and_vars
    cfg = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)
    mix_cfg = MixConfig(chunk_length_s=1.0, **mix_kwargs) if mix_kwargs else None
    return SongMixer(model, variables, cfg, mix_cfg=mix_cfg)


class TestDeviceEpilogueParity:
    def test_matches_host_path(self, model_and_vars, song):
        mixer = _mixer(model_and_vars)
        host_tracks, _, host_smooth = mixer.mix_song_smooth(song)
        dev_tracks, dev_mix, dev_smooth = mixer.mix_song_smooth_device(song)

        dev_tracks = np.asarray(dev_tracks)
        dev_smooth = np.asarray(dev_smooth)
        for i, t in enumerate(STEMS):
            np.testing.assert_allclose(
                dev_smooth[i], np.asarray(host_smooth[t]), rtol=1e-5, atol=1e-6
            )
            np.testing.assert_allclose(
                dev_tracks[i], host_tracks[t], rtol=1e-4, atol=1e-5
            )

        host_mix = mixer.mix_song(song)
        np.testing.assert_allclose(np.asarray(dev_mix), host_mix, rtol=1e-4, atol=1e-5)

    def test_accepts_device_array(self, model_and_vars, song):
        mixer = _mixer(model_and_vars)
        stems = np.stack([song[t] for t in STEMS])
        stems_dev = jax.device_put(jnp.asarray(stems))
        _, mixed_a, _ = mixer.mix_song_smooth_device(stems_dev)
        _, mixed_b, _ = mixer.mix_song_smooth_device(song)
        np.testing.assert_allclose(
            np.asarray(mixed_a), np.asarray(mixed_b), rtol=1e-6, atol=1e-7
        )

    def test_segmented_matches_single_program(self, model_and_vars, song):
        """Forcing 4-chunk segments (device slice + pad + concat across
        programs) must give the same result as the one-segment path."""
        seg_mixer = _mixer(model_and_vars, max_chunks=4)
        one_mixer = _mixer(model_and_vars)
        _, mix_seg, sm_seg = seg_mixer.mix_song_smooth_device(song)
        _, mix_one, sm_one = one_mixer.mix_song_smooth_device(song)
        np.testing.assert_allclose(
            np.asarray(sm_seg), np.asarray(sm_one), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(mix_seg), np.asarray(mix_one), rtol=1e-5, atol=1e-6
        )

    def test_short_song_passthrough(self, model_and_vars):
        """< 2 chunks: no gain windows exist — stems pass through (host-path
        semantics), curves are empty, mixdown still normalised."""
        mixer = _mixer(model_and_vars)
        song = _song(1.0, seed=3)
        tracks, mixed, smooth = mixer.mix_song_smooth_device(song)
        assert np.asarray(smooth).shape == (4, 0)
        np.testing.assert_allclose(
            np.asarray(tracks), np.stack([song[t] for t in STEMS]), rtol=0, atol=0
        )
        assert np.max(np.abs(np.asarray(mixed))) == pytest.approx(1.0, abs=1e-6)

    def test_tiny_curve_no_smoothing(self, model_and_vars):
        """n_gains < 3 skips savgol on both paths (host parity)."""
        mixer = _mixer(model_and_vars)
        song = _song(3.0, seed=4)  # 3 chunks -> 2 gains
        _, _, host_smooth = mixer.mix_song_smooth(song)
        _, _, dev_smooth = mixer.mix_song_smooth_device(song)
        for i, t in enumerate(STEMS):
            np.testing.assert_allclose(
                np.asarray(dev_smooth)[i], np.asarray(host_smooth[t]), rtol=1e-5
            )

    def test_song_gains_device_matches_host_path(self, model_and_vars, song):
        """HBM-resident gains (no packing/wire) == the wire-transfer path,
        segmented and unsegmented."""
        stems = np.stack([song[t] for t in STEMS])
        for kwargs in ({}, {"max_chunks": 4}):
            mixer = _mixer(model_and_vars, **kwargs)
            host_gains = mixer.song_gains(stems)
            dev_gains = mixer.collect_gains(
                mixer.song_gains_device(jnp.asarray(stems))
            )
            np.testing.assert_allclose(dev_gains, host_gains, rtol=1e-5, atol=1e-5)

    def test_mix_song_device_is_normalised(self, model_and_vars, song):
        mixer = _mixer(model_and_vars)
        mixed = np.asarray(mixer.mix_song_device(song))
        assert mixed.shape == (len(song["bass"]),)
        assert np.max(np.abs(mixed)) == pytest.approx(1.0, rel=1e-6)


class TestShardedDeviceMix:
    def test_chunk_sharded_device_mix_matches_plain(self, model_and_vars, song):
        """The fused full-mix program must give the same mix when the gain
        computation's chunk axis is sharded over an 8-device mesh."""
        from tpumix.parallel.mesh import make_mesh

        plain = _mixer(model_and_vars)
        model, variables = model_and_vars
        from tpumix.config import ModelConfig

        cfg = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)
        mesh = make_mesh((8,), ("sp",))
        from tpumix.infer.mixer import SongMixer

        sharded = SongMixer(model, variables, cfg, mesh=mesh, chunk_axis="sp")
        _, mix_a, sm_a = plain.mix_song_smooth_device(song)
        _, mix_b, sm_b = sharded.mix_song_smooth_device(song)
        np.testing.assert_allclose(
            np.asarray(sm_a), np.asarray(sm_b), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(mix_a), np.asarray(mix_b), rtol=1e-4, atol=1e-4
        )


class TestCatalogDeviceMix:
    def test_catalog_device_mix_matches_host_mono(self, model_and_vars, tmp_path):
        import os

        from tpumix.data import wavio
        from tpumix.infer.catalog import mix_catalog
        from test_data import make_song as make_song_files

        base = str(tmp_path / "cat")
        os.makedirs(base)
        make_song_files(base, "DevA", 4.0, seed=11, stereo=False)
        mixer = _mixer(model_and_vars)

        host_out = str(tmp_path / "host")
        dev_out = str(tmp_path / "dev")
        mix_catalog(mixer, base, ["DevA"], host_out)
        written = mix_catalog(mixer, base, ["DevA"], dev_out, device_mix=True)
        assert len(written) == 1

        host_mix, sr = wavio.read(os.path.join(host_out, "DevA_mixed.wav"))
        dev_mix, sr2 = wavio.read(written[0])
        assert sr == sr2
        # the test fixture's stems are mono, so the host (track-domain) and
        # device (mono-downmix) mixes coincide up to f32 epilogue rounding
        np.testing.assert_allclose(
            np.squeeze(dev_mix), np.squeeze(host_mix), rtol=1e-4, atol=1e-5
        )
