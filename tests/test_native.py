"""Native I/O runtime (libtpumixio.so via ctypes) vs the numpy fallback."""

import os

import numpy as np
import pytest

from tpumix.data import _native, wavio

SR = 44100


@pytest.fixture(scope="module")
def lib():
    lib = _native.get_lib()
    if lib is None:
        pytest.skip("native runtime unavailable (no compiler)")
    return lib


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    base = tmp_path_factory.mktemp("nat")
    rng = np.random.default_rng(0)
    x = np.clip(0.3 * rng.standard_normal((SR, 2)), -1, 1).astype(np.float32)
    paths = {}
    for sub in ("FLOAT", "PCM_16", "PCM_24", "PCM_32"):
        p = str(base / f"t_{sub}.wav")
        wavio.write(p, x, SR, subtype=sub)
        paths[sub] = p
    return x, paths


class TestNative:
    @pytest.mark.parametrize("sub", ["FLOAT", "PCM_16", "PCM_24", "PCM_32"])
    def test_info_matches(self, lib, wav_files, sub):
        _, paths = wav_files
        sr, ch, frames, fmt = _native.info(paths[sub])
        meta = wavio.info(paths[sub])
        assert (sr, ch, frames, fmt) == (
            meta.samplerate, meta.channels, meta.frames, meta.format,
        )

    @pytest.mark.parametrize("sub", ["FLOAT", "PCM_16", "PCM_24", "PCM_32"])
    def test_read_bitexact_vs_numpy(self, lib, wav_files, sub):
        _, paths = wav_files
        nat = _native.read_f32(paths[sub], 137, 5000, 2)
        ref, _ = wavio.read(paths[sub], start=137, stop=137 + 5000, always_2d=True)
        np.testing.assert_array_equal(nat, ref)

    def test_mono_downmix(self, lib, wav_files):
        _, paths = wav_files
        nat = _native.read_mono_f32(paths["FLOAT"], 0, SR)
        ref, _ = wavio.read(paths["FLOAT"], always_2d=True)
        np.testing.assert_allclose(nat, ref.mean(axis=1), atol=1e-7)

    def test_chunked_read_pads_tail(self, lib, wav_files):
        _, paths = wav_files
        chunks = _native.read_chunks_mono_f32(paths["FLOAT"], 10000, 5)
        assert chunks.shape == (5, 10000)
        assert np.all(chunks[4, 4100:] == 0)  # 44100 = 4*10000 + 4100

    def test_native_write_roundtrip(self, lib, wav_files, tmp_path):
        x, _ = wav_files
        p = str(tmp_path / "w.wav")
        assert _native.write(p, x, SR, "FLOAT")
        y, sr = wavio.read(p)
        assert sr == SR
        np.testing.assert_array_equal(y, x)

    def test_read_mono_helper_uses_native(self, lib, wav_files):
        _, paths = wav_files
        out = wavio.read_mono(paths["PCM_16"], start=100, count=1000)
        ref, _ = wavio.read(paths["PCM_16"], start=100, stop=1100, always_2d=True)
        np.testing.assert_allclose(out, ref.mean(axis=1), atol=1e-7)

    def test_fallback_when_disabled(self, wav_files, monkeypatch):
        _, paths = wav_files
        import tpumix.data._native as nat

        monkeypatch.setattr(nat, "_lib", None)
        monkeypatch.setattr(nat, "_tried", True)
        out = wavio.read_mono(paths["FLOAT"], start=0, count=1000)
        assert out.shape == (1000,)
