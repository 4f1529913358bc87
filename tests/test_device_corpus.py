"""HBM-resident corpus training (tpumix/data/device_corpus.py).

The round-4 answer to two measured host-path limits (docs/PERF.md): the
per-step host->device link bound (~42 MB per batch-48 step) and the axon
client's host-copy retention of every distinct upload (a 100-epoch
file-corpus run accumulates ~130 GB of host RSS and gets OOM-killed).  One
corpus upload + on-device gather/slice batching removes both.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.data import wavio
from tpumix.data.dataset import STEMS, TRACKLIST, MultitrackAudioDataset
from tpumix.data.device_corpus import DeviceCorpus, DeviceCorpusIterator

SR = 8000
CHUNK = 6000  # 0.75 s -> 47 frames at hop 128 (the tiny-train shape)


def _write_corpus(root, n_songs=3, dur_s=3.0, seed=0):
    """Tiny musdb18-layout corpus; returns the songlist.  Whole-second song
    lengths keep the host dataset's chunk count (which floors durations to
    whole seconds, reference parity) equal to the device corpus's exact
    ``n // chunk_samples``."""
    rng = np.random.default_rng(seed)
    songs = []
    for i in range(n_songs):
        name = f"song_{i}"
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        n = int(dur_s * SR) + SR * i  # ragged (whole-second) lengths
        # 0.08 keeps the 4-stem mix inside [-1, 1]: int16 storage clips
        # beyond full scale (exactly like the int16 wire path), which would
        # make the float32-WAV comparison diverge at clipped peaks
        stems = {
            s: (0.08 * rng.standard_normal(n)).astype(np.float32) for s in STEMS
        }
        mix = sum(stems.values()).astype(np.float32)
        for s, x in stems.items():
            wavio.write(os.path.join(d, f"{s}.wav"), x, SR)
        wavio.write(os.path.join(d, "mixture.wav"), mix, SR)
        songs.append(name)
    return songs


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("dcorpus")
    songs = _write_corpus(str(root))
    return str(root), songs


class TestDeviceCorpus:
    def test_matches_host_dataset_chunks(self, corpus_dir):
        """Every device-gathered chunk equals the host dataset's read of the
        same (song, chunk) up to int16 quantisation."""
        root, songs = corpus_dir
        dc = DeviceCorpus(root, songs, CHUNK, layout="musdb18")
        ds = MultitrackAudioDataset(
            root, songlist=songs, chunk_length=CHUNK / SR, sr=SR, layout="musdb18"
        )
        table = dc.index_table()
        assert dc.num_chunks == len(ds) == len(table)
        # the dataset shuffles its songlist copy; map names -> its indices
        ds_order = {s: i for i, s in enumerate(ds.songlist)}
        for gi in range(dc.num_chunks):
            s_i, c_i = table[gi]
            stems_d, mix_d = dc.batch(np.array([s_i]), np.array([c_i]))
            stems_d = np.asarray(stems_d)[0].astype(np.float32) / 32768.0
            mix_d = np.asarray(mix_d)[0].astype(np.float32) / 32768.0
            # host read of the same chunk
            song = dc.songlist[s_i]
            host_gi = int(ds._cum_chunks[ds_order[song]]) + int(c_i)
            stems_h, mix_h = ds.load_audio_chunk(host_gi)
            np.testing.assert_allclose(stems_d, stems_h, atol=1 / 32768.0)
            np.testing.assert_allclose(mix_d, mix_h, atol=1 / 32768.0)

    def test_iterator_covers_epoch_once(self, corpus_dir):
        root, songs = corpus_dir
        dc = DeviceCorpus(root, songs, CHUNK, layout="musdb18")
        it = DeviceCorpusIterator(dc, batch_size=2, shuffle=True, seed=3)
        batches = list(it)
        assert len(batches) == len(it) == dc.num_chunks // 2
        for stems, mix in batches:
            assert stems.shape == (2, 4, CHUNK) and stems.dtype == jnp.int16
            assert mix.shape == (2, CHUNK) and mix.dtype == jnp.int16
        # two epochs shuffle differently (owned RNG advances)
        flat1 = np.concatenate([np.asarray(m).ravel() for _, m in batches])
        flat2 = np.concatenate([np.asarray(m).ravel() for _, m in list(it)])
        assert not np.array_equal(flat1, flat2)

    def test_flat_pack_footprint(self, corpus_dir):
        """Round-4 advisor finding: the corpus must store exactly the sum of
        (aligned) song lengths — no zero-padding of every song to the longest
        one (which on ragged corpora like MUSDB18 can double the HBM/upload
        footprint)."""
        root, songs = corpus_dir
        dc = DeviceCorpus(root, songs, CHUNK, layout="musdb18")
        from tpumix.data.loaders import track_path

        total = 0
        for s in songs:
            lens = [
                wavio.read_mono(track_path(root, s, t, "musdb18")).shape[0]
                for t in TRACKLIST
            ]
            total += min(lens)
        assert dc.corpus.shape == (len(TRACKLIST), total)
        assert dc.corpus.dtype == jnp.int16

    def test_empty_songlist_rejected(self, corpus_dir):
        root, _ = corpus_dir
        with pytest.raises(ValueError, match="non-empty"):
            DeviceCorpus(root, [], CHUNK, layout="musdb18")

    def test_trainer_fit_runs_on_device_batches(self, corpus_dir, tmp_path):
        """One tiny epoch of Trainer.fit straight off device int16 batches
        (the step dequantises by dtype; no host transform in the loop)."""
        from tpumix.config import FrontendConfig, TrainConfig
        from tpumix.models import MixingModelScalar1s
        from tpumix.train.trainer import Trainer

        root, songs = corpus_dir
        dc = DeviceCorpus(root, songs, CHUNK, layout="musdb18")
        fe = FrontendConfig(n_fft=256, hop_length=128, sample_rate=SR)
        model = MixingModelScalar1s(bn_momentum=0.99)
        cfg = TrainConfig(
            batch_size=2, num_epochs=1, checkpoint_dir=str(tmp_path),
            loss="lstsq", augment=True,
        )
        tr = Trainer(model, fe, cfg, (1, 4, fe.num_bins, 47), run_name="dc")
        loader = DeviceCorpusIterator(dc, 2, seed=0)
        val = DeviceCorpusIterator(dc, 2, shuffle=False, seed=0)
        result = tr.fit(loader, val, 0, 1)
        assert np.isfinite(result.best_val_loss)
