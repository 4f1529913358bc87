"""Data layer: WAV I/O, loaders, songlist registry parity, dataset indexing,
precompute cache, batching."""

import importlib.util
import os
from struct import error as struct_error

import numpy as np
import pytest

from tpumix.data import wavio
from tpumix.data.dataset import MultitrackAudioDataset, STEMS
from tpumix.data.loaders import (
    load_tracks,
    load_tracks_musdb18,
    split_songlist,
)
from tpumix.data.prefetch import BatchIterator, prefetch_to_device
from tpumix.data import songlists

SR = 44100


def make_song(base: str, name: str, dur_s: float, sr: int = SR, layout: str = "medleydb",
              stereo: bool = True, seed: int = 0):
    """Write a synthetic 5-track song in the given directory layout."""
    rng = np.random.default_rng(seed)
    n = int(dur_s * sr)
    t = np.arange(n) / sr
    stems = {
        "bass": 0.4 * np.sin(2 * np.pi * 60 * t),
        "drums": 0.3 * (rng.standard_normal(n) * (np.sin(2 * np.pi * 2 * t) > 0.9)),
        "vocals": 0.3 * np.sin(2 * np.pi * 440 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 0.5 * t)),
        "other": 0.2 * np.sin(2 * np.pi * 220 * t),
    }
    mix = sum(stems.values())
    if layout == "medleydb":
        song_dir = os.path.join(base, name)
        stem_dir = os.path.join(song_dir, f"{name}_STEMS_JOINED")
        os.makedirs(stem_dir, exist_ok=True)
        paths = {s: os.path.join(stem_dir, f"{name}_STEM_{s.upper()}.wav") for s in stems}
        paths["mix"] = os.path.join(song_dir, f"{name}_MIX.wav")
    else:
        song_dir = os.path.join(base, name)
        os.makedirs(song_dir, exist_ok=True)
        paths = {s: os.path.join(song_dir, f"{s}.wav") for s in stems}
        paths["mix"] = os.path.join(song_dir, "mixture.wav")
    for s, audio in {**stems, "mix": mix}.items():
        data = np.stack([audio, audio], axis=1) if stereo else audio
        wavio.write(paths[s], data.astype(np.float32), sr)
    return {**stems, "mix": mix}


@pytest.fixture(scope="module")
def medley_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("medley"))
    make_song(base, "SongA", 4.0, seed=1)
    make_song(base, "SongB", 6.5, seed=2)
    return base


class TestWavio:
    @pytest.mark.parametrize("subtype,tol", [
        ("FLOAT", 1e-7), ("PCM_16", 1e-4), ("PCM_24", 3e-7), ("PCM_32", 1e-9),
    ])
    def test_roundtrip(self, tmp_path, subtype, tol):
        rng = np.random.default_rng(0)
        x = np.clip(rng.standard_normal((1000, 2)) * 0.3, -1, 1).astype(np.float32)
        p = str(tmp_path / f"t_{subtype}.wav")
        wavio.write(p, x, SR, subtype=subtype)
        y, sr = wavio.read(p)
        assert sr == SR and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=tol)

    def test_mono_shapes(self, tmp_path):
        x = np.zeros(100, dtype=np.float32)
        p = str(tmp_path / "mono.wav")
        wavio.write(p, x, SR)
        y, _ = wavio.read(p)
        assert y.shape == (100,)
        y2, _ = wavio.read(p, always_2d=True)
        assert y2.shape == (100, 1)

    def test_partial_read(self, tmp_path):
        x = np.arange(1000, dtype=np.float32) / 1000
        p = str(tmp_path / "part.wav")
        wavio.write(p, x, SR)
        y, _ = wavio.read(p, start=100, stop=200)
        np.testing.assert_allclose(y, x[100:200], atol=1e-7)
        # out-of-range clamping
        y2, _ = wavio.read(p, start=900, stop=5000)
        assert y2.shape == (100,)

    def test_info(self, tmp_path):
        x = np.zeros((2 * SR, 2), dtype=np.float32)
        p = str(tmp_path / "info.wav")
        wavio.write(p, x, SR)
        meta = wavio.info(p)
        assert meta.frames == 2 * SR
        assert meta.channels == 2
        assert abs(meta.duration - 2.0) < 1e-9

    def test_resample(self):
        t = np.arange(48000) / 48000
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = wavio.resample_poly(x, 48000, 44100, axis=-1)
        assert abs(len(y) - 44100) <= 1


class TestSonglists:
    def test_registry_matches_reference(self):
        """Verbatim data parity with reference data/songlists.py constants."""
        spec = importlib.util.spec_from_file_location(
            "ref_songlists", "/root/reference/data/songlists.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        for key in songlists.available_songlists():
            assert list(getattr(ref, key)) == songlists.get_songlist(key), key

    def test_get_songlist_returns_copy(self):
        a = songlists.get_songlist("musdb18_test")
        a.append("mutation")
        assert "mutation" not in songlists.get_songlist("musdb18_test")

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            songlists.get_songlist("nope")


class TestLoaders:
    def test_load_tracks_medleydb(self, medley_dir):
        tracks = load_tracks(medley_dir, "SongA")
        assert set(tracks) == {"bass", "drums", "vocals", "other", "mix"}
        assert tracks["bass"].shape == (2, 4 * SR)

    def test_load_tracks_musdb18(self, tmp_path):
        base = str(tmp_path)
        make_song(base, "M1", 2.0, layout="musdb18")
        tracks = load_tracks_musdb18(base, "M1", tracklist=("bass", "drums", "vocals", "other"))
        assert set(tracks) == {"bass", "drums", "vocals", "other"}
        assert tracks["drums"].shape == (2, 2 * SR)

    def test_split(self):
        songs = [f"s{i}" for i in range(10)]
        tr, va, te = split_songlist(songs, (0.6, 0.2, 0.2), seed=0)
        assert len(tr) == 6 and len(va) == 2 and len(te) == 2
        assert sorted(tr + va + te) == sorted(songs)
        tr2, _, _ = split_songlist(songs, (0.6, 0.2, 0.2), seed=0)
        assert tr == tr2  # deterministic under seed


class TestDataset:
    def test_length_and_indexing(self, medley_dir):
        d = MultitrackAudioDataset(medley_dir, chunk_length=2.0, seed=3)
        # SongA 4s -> 2 chunks; SongB 6.5s -> 3 chunks
        assert len(d) == 5
        seen = set()
        for i in range(len(d)):
            song_i, chunk_i = d.song_and_chunk(i)
            seen.add((d.songlist[song_i], chunk_i))
        assert seen == {("SongA", 0), ("SongA", 1), ("SongB", 0), ("SongB", 1), ("SongB", 2)}

    def test_audio_items(self, medley_dir):
        d = MultitrackAudioDataset(medley_dir, chunk_length=1.0, seed=3)
        stems, mix = d[0]
        assert stems.shape == (4, SR)
        assert mix.shape == (SR,)
        assert stems.dtype == np.float32

    def test_feature_items_reference_shape(self, medley_dir):
        d = MultitrackAudioDataset(
            medley_dir, chunk_length=1.0, seed=3, return_features=True, hop_length=512
        )
        train, gt = d[0]
        assert train.shape == (4, 1025, 87)
        assert gt.shape == (1025, 87)

    def test_features_match_device_frontend(self, medley_dir):
        import jax.numpy as jnp

        from tpumix.config import FrontendConfig
        from tpumix.ops.stft import spectrogram_features

        d = MultitrackAudioDataset(medley_dir, chunk_length=1.0, seed=3)
        stems, _ = d[1]
        host = d.compute_features(stems[0])
        dev = np.asarray(
            spectrogram_features(jnp.asarray(stems[0]), FrontendConfig(hop_length=1024))
        )
        # host path uses f64 FFT, device f32: near-silent bins of the tonal
        # test signal deviate in dB; the spectrum bulk and all loud bins agree
        # f32 FFT error scales with total frame energy, so bins far below the
        # frame peak carry proportionally more dB-domain noise; bins within
        # ~40 dB of full scale (the ones that drive gains) agree tightly
        diff = np.abs(host - dev)
        assert np.median(diff) < 1e-3
        loud = host > -40.0
        assert np.max(diff[loud]) < 2e-2

    def test_augmentation_bounds(self, medley_dir):
        d0 = MultitrackAudioDataset(medley_dir, chunk_length=1.0, seed=3)
        d1 = MultitrackAudioDataset(medley_dir, chunk_length=1.0, seed=3, augment_data=True)
        s0, m0 = d0[0]
        s1, m1 = d1[0]
        for k in range(4):
            nz = np.abs(s0[k]) > 1e-6
            if nz.any():
                g = (s1[k][nz] / s0[k][nz]).mean()
                assert 0.6 - 1e-3 <= g <= 1.4 + 1e-3
        # reference parity: the MIX track is augmented too (the reference's
        # per-track loop covers 'mix', data/dataset.py:185-199)
        nz = np.abs(m0) > 1e-6
        gm = (m1[nz] / m0[nz]).mean()
        assert 0.6 - 1e-3 <= gm <= 1.4 + 1e-3
        assert np.allclose(m1[nz] / m0[nz], gm, atol=1e-4)  # one scalar gain

    def test_normalize_option(self, medley_dir, tmp_path):
        d = MultitrackAudioDataset(
            medley_dir, chunk_length=1.0, seed=3, normalize=True,
            cache_dir=str(tmp_path),
        )
        stems, mix = d[0]
        for k in range(4):
            if np.abs(stems[k]).max() > 0:
                np.testing.assert_allclose(np.abs(stems[k]).max(), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.abs(mix).max(), 1.0, rtol=1e-5)
        # normalised caches carry the _norm tag (reference cache suffix,
        # data/dataset.py:253-263)
        assert "_norm" in d._cache_path(d.songlist[0])

    def test_precompute_cache_roundtrip(self, medley_dir, tmp_path):
        cache = str(tmp_path / "cache")
        d = MultitrackAudioDataset(
            medley_dir, chunk_length=1.0, seed=3, return_features=True,
            hop_length=512, cache_dir=cache,
        )
        direct = d[2]
        d.precompute_features()
        cached = d[2]
        np.testing.assert_allclose(cached[0], direct[0], atol=1e-6)
        np.testing.assert_allclose(cached[1], direct[1], atol=1e-6)

    def test_mean_loudness(self, medley_dir):
        d = MultitrackAudioDataset(medley_dir, chunk_length=2.0, seed=3)
        ml = d.compute_mean_loudness()
        assert set(ml) == {"bass", "drums", "vocals", "other", "mix"}
        assert all(np.isfinite(v) for v in ml.values())
        assert ml["mix"] > ml["other"]  # mix is louder than any single stem


class TestBatching:
    def test_batch_iterator(self, medley_dir):
        d = MultitrackAudioDataset(medley_dir, chunk_length=1.0, seed=3)
        it = BatchIterator(d, batch_size=4, seed=0)
        batches = list(it)
        assert len(batches) == len(d) // 4
        stems, mix = batches[0]
        assert stems.shape == (4, 4, SR)
        assert mix.shape == (4, SR)

    def test_prefetch_to_device(self, medley_dir):
        d = MultitrackAudioDataset(medley_dir, chunk_length=1.0, seed=3)
        it = BatchIterator(d, batch_size=2, seed=0)
        n = 0
        for stems, mix in prefetch_to_device(iter(it), size=2):
            assert stems.shape[0] == 2
            n += 1
        assert n == len(it)


def test_align_track_lengths():
    from tpumix.data.loaders import align_track_lengths

    tracks = {"a": np.zeros((2, 100)), "b": np.zeros((2, 97)), "c": np.zeros(99)}
    out = align_track_lengths(tracks)
    assert all(v.shape[-1] == 97 for v in out.values())


def test_cached_feature_augmentation(medley_dir, tmp_path):
    """Feature-domain augmentation applies on the precompute-cache path
    (reference data/dataset.py:265-266)."""
    cache = str(tmp_path / "aug_cache")
    d0 = MultitrackAudioDataset(
        medley_dir, chunk_length=1.0, seed=3, return_features=True,
        hop_length=512, cache_dir=cache,
    )
    d0.precompute_features()
    base, _ = d0[0]
    d1 = MultitrackAudioDataset(
        medley_dir, chunk_length=1.0, seed=3, return_features=True,
        hop_length=512, cache_dir=cache, augment_data=True,
    )
    aug, _ = d1[0]
    # per-stem constant dB offsets within [20log10(0.6), 20log10(1.4)]
    offsets = (aug - base).reshape(4, -1)
    assert np.allclose(offsets.std(axis=1), 0, atol=1e-5)
    assert np.all(offsets[:, 0] >= 20 * np.log10(0.6) - 1e-5)
    assert np.all(offsets[:, 0] <= 20 * np.log10(1.4) + 1e-5)


class TestWavioRobustness:
    def test_nan_inf_sanitised_on_pcm_write(self, tmp_path):
        """NaN/Inf samples must not cast to INT_MIN full-scale noise
        (VERDICT r1: RuntimeWarning 'invalid value encountered in cast')."""
        import warnings

        x = np.array([0.5, np.nan, -np.inf, np.inf, -0.25], dtype=np.float32)
        for sub in ("PCM_16", "PCM_24", "PCM_32"):
            p = str(tmp_path / f"nan_{sub}.wav")
            with warnings.catch_warnings():
                warnings.simplefilter("error")  # any RuntimeWarning -> fail
                wavio.write(p, x, 44100, subtype=sub)
            y, _ = wavio.read(p)
            np.testing.assert_allclose(y[1], 0.0, atol=1e-4)  # NaN -> silence
            assert y[2] <= -0.999 and y[3] >= 0.999  # inf -> clipped full scale
            np.testing.assert_allclose(y[0], 0.5, atol=1e-4)

    def test_block_align_mismatch_rejected_by_both_parsers(self, tmp_path):
        """A stereo PCM16 file claiming block_align=1 must not drive the
        native reader into a heap overread (ADVICE r1) NOR give the numpy
        parser a wrong frame size (frames 4x off, partial-read seeks landing
        mid-frame): both decoders reject it identically."""
        import struct

        from tpumix.data import _native

        payload = np.arange(400, dtype="<i2").tobytes()
        p = str(tmp_path / "evil.wav")
        with open(p, "wb") as f:
            f.write(b"RIFF"); f.write(struct.pack("<I", 36 + len(payload))); f.write(b"WAVE")
            f.write(b"fmt "); f.write(struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100, 1, 16))
            f.write(b"data"); f.write(struct.pack("<I", len(payload))); f.write(payload)
        if _native.get_lib() is not None:
            assert _native.info(p) is None
        with pytest.raises(ValueError, match="block_align"):
            wavio.info(p)
        with pytest.raises(ValueError, match="block_align"):
            wavio.read(p)

    def test_not_a_wav(self, tmp_path):
        p = str(tmp_path / "bad.wav")
        with open(p, "wb") as f:
            f.write(b"NOT A WAVE FILE AT ALL")
        with pytest.raises(ValueError):
            wavio.info(p)

    def test_truncated_payload_clamped(self, tmp_path):
        # data chunk header claims more frames than the file holds
        x = np.zeros(1000, dtype=np.float32)
        p = str(tmp_path / "trunc.wav")
        wavio.write(p, x, SR)
        with open(p, "r+b") as f:
            f.truncate(44 + 400 * 4)  # keep only 400 frames
        meta = wavio.info(p)
        assert meta.frames == 400
        y, _ = wavio.read(p)
        assert y.shape == (400,)

    def test_extra_chunks_skipped(self, tmp_path):
        # LIST chunk between fmt and data (common in the wild)
        import struct

        x = (np.arange(100) / 100).astype(np.float32)
        p0 = str(tmp_path / "base.wav")
        wavio.write(p0, x, SR)
        raw = open(p0, "rb").read()
        head, payload = raw[:36], raw[36:]
        extra = b"LIST" + struct.pack("<I", 10) + b"INFOhello\x00"
        patched = head + extra + payload
        patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
        p1 = str(tmp_path / "extra.wav")
        open(p1, "wb").write(patched)
        y, sr = wavio.read(p1)
        np.testing.assert_allclose(y, x, atol=1e-7)

    def test_extensible_format(self, tmp_path):
        # WAVE_FORMAT_EXTENSIBLE wrapper around PCM16
        import struct

        x = np.clip(np.sin(np.arange(500) / 10), -1, 1).astype(np.float32)
        pcm = np.round(x * 32768).clip(-32768, 32767).astype("<i2").tobytes()
        # base(16) + cbSize(2) + validBits(2) + channelMask(4) + GUID(16)
        fmt = (
            struct.pack("<HHIIHH", 0xFFFE, 1, SR, SR * 2, 2, 16)
            + struct.pack("<HHI", 22, 16, 0x4)
            + struct.pack("<H", 0x0001) + b"\x00" * 14
        )
        p = str(tmp_path / "ext.wav")
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE")
            f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
            f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
        meta = wavio.info(p)
        assert meta.format == "PCM_16"
        y, _ = wavio.read(p)
        np.testing.assert_allclose(y, x, atol=1e-4)


def test_wavio_fuzz_truncations(tmp_path):
    """The parser must never crash on arbitrarily truncated/corrupted files —
    it either parses (clamping) or raises ValueError."""
    rng = np.random.default_rng(0)
    x = (0.2 * rng.standard_normal((500, 2))).astype(np.float32)
    p0 = str(tmp_path / "base.wav")
    wavio.write(p0, x, SR, subtype="PCM_16")
    raw = open(p0, "rb").read()
    for seed in range(40):
        r = np.random.default_rng(seed)
        cut = int(r.integers(0, len(raw)))
        mutated = bytearray(raw[:cut] if r.random() < 0.7 else raw)
        if len(mutated) > 12 and r.random() < 0.5:
            # flip a few random bytes
            for _ in range(3):
                mutated[int(r.integers(0, len(mutated)))] = int(r.integers(0, 256))
        p = str(tmp_path / f"fuzz_{seed}.wav")
        open(p, "wb").write(bytes(mutated))
        try:
            meta = wavio.info(p)
            assert meta.frames >= 0
            y, _ = wavio.read(p)
            assert y.shape[0] == meta.frames
        except (ValueError, struct_error):
            pass


def test_wavio_bytesio_roundtrip(tmp_path):
    """read/info accept in-memory streams (the HTTP service's request-body
    path — no temp-file round trip)."""
    import io

    from tpumix.data import wavio as w

    rng = np.random.default_rng(3)
    data = rng.uniform(-0.5, 0.5, size=(256, 2)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    w.write(path, data, 44100, subtype="FLOAT")
    blob = open(path, "rb").read()

    buf = io.BytesIO(blob)
    meta = w.info(buf)
    assert (meta.frames, meta.channels) == data.shape
    audio, sr = w.read(io.BytesIO(blob), always_2d=True)
    np.testing.assert_array_equal(audio, data)
    # partial reads work on streams too
    part, _ = w.read(io.BytesIO(blob), start=10, stop=20, always_2d=True)
    np.testing.assert_array_equal(part, data[10:20])
