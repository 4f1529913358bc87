"""Evaluation layer: xlsx writer, LoudnessEvaluator end-to-end on a synthetic
MUSDB18-layout corpus, listening-test prep + JSON parsing."""

import json
import os
import zipfile

import numpy as np
import pytest

import jax

from tpumix.config import ModelConfig
from tpumix.data import wavio
from tpumix.eval.evaluator import LoudnessEvaluator
from tpumix.eval import listening
from tpumix.infer.mixer import SongMixer
from tpumix.models import MixingModelScalar1s
from tpumix.utils.xlsx import write_xlsx

from test_data import make_song

SR = 44100
SONGS = ["TestSong1", "TestSong2"]


@pytest.fixture(scope="module")
def musdb_root(tmp_path_factory):
    """MUSDB18-HQ-style root: test/ + manual_gain_mixes/ per song."""
    base = str(tmp_path_factory.mktemp("musdb"))
    for sub in ("test", "manual_gain_mixes"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
        for i, song in enumerate(SONGS):
            make_song(os.path.join(base, sub), song, 6.0, layout="musdb18", seed=i + (0 if sub == "test" else 7))
    return base


@pytest.fixture(scope="module")
def mixer():
    model = MixingModelScalar1s()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 4, 1025, 87), np.float32), train=False
    )
    cfg = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)
    return SongMixer(model, variables, cfg)


class TestXlsx:
    def test_roundtrip_via_xml(self, tmp_path):
        import xml.etree.ElementTree as ET

        path = str(tmp_path / "t.xlsx")
        write_xlsx(path, [["name", "x"], ["a", 1.5], ["b", 2]])
        ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        with zipfile.ZipFile(path) as z:
            root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = root.findall(f"{ns}sheetData/{ns}row")
        assert len(rows) == 3
        texts = [c.find(f"{ns}is/{ns}t").text for c in rows[0]]
        assert texts == ["name", "x"]
        vals = [rows[1][1].find(f"{ns}v").text, rows[2][1].find(f"{ns}v").text]
        assert [float(v) for v in vals] == [1.5, 2.0]

    def test_is_valid_zip(self, tmp_path):
        path = str(tmp_path / "t2.xlsx")
        write_xlsx(path, [["only", "header"]])
        with zipfile.ZipFile(path) as z:
            assert "xl/worksheets/sheet1.xml" in z.namelist()


@pytest.mark.heavy
class TestEvaluator:
    def test_process_songlist(self, musdb_root, mixer, tmp_path):
        mean_loudness = {t: -20.0 for t in ("bass", "drums", "vocals", "other")}
        ev = LoudnessEvaluator(
            mixer, mean_loudness, seed=0, results_dir=str(tmp_path / "exp")
        )
        out = str(tmp_path / "stats.xlsx")
        stats = ev.process_songlist(musdb_root, SONGS, out_path=out)
        assert len(stats) == 2
        for s in stats:
            for key in ("sum_error", "random_error", "loudnorm_error", "mix_error"):
                assert np.isfinite(s[key]), (key, s)
                assert s[key] >= 0
        assert os.path.exists(out)
        assert os.path.exists(str(tmp_path / "stats.csv"))

    def test_wav_export(self, musdb_root, mixer, tmp_path):
        mean_loudness = {t: -20.0 for t in ("bass", "drums", "vocals", "other")}
        ev = LoudnessEvaluator(
            mixer, mean_loudness, seed=0, results_dir=str(tmp_path / "exp2")
        )
        ev.process_song(musdb_root, SONGS[0], n_random_samples=1, write_wavs_to_disk=True)
        exported = os.listdir(str(tmp_path / "exp2"))
        assert any("reference" in f for f in exported)
        assert any("mix" in f for f in exported)

    def test_drifted_track_lengths_aligned(self, mixer, tmp_path):
        """Manual-mix wavs drifting a few hundred samples from the stems must
        not crash or skew the sweep — the evaluator trims each track dict to
        its shortest member (reference fixed this offline, experiments.ipynb
        cell 57)."""
        base = str(tmp_path / "drifted")
        for sub in ("test", "manual_gain_mixes"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
            make_song(os.path.join(base, sub), "DriftSong", 6.0, layout="musdb18", seed=3)
        # drift: truncate one manual stem by 300 samples and one test stem by 150
        for sub, stem, cut in (("manual_gain_mixes", "vocals", 300), ("test", "drums", 150)):
            p = os.path.join(base, sub, "DriftSong", f"{stem}.wav")
            audio, sr = wavio.read(p)
            wavio.write(p, audio[:-cut], sr)
        mean_loudness = {t: -20.0 for t in ("bass", "drums", "vocals", "other")}
        ev = LoudnessEvaluator(mixer, mean_loudness, seed=0, results_dir=str(tmp_path / "out"))
        stats = ev.process_song(base, "DriftSong")
        for k in ("sum_error", "loudnorm_error", "mix_error", "random_error"):
            assert np.isfinite(stats[k])

    def test_device_meter_matches_host(self, musdb_root, mixer, tmp_path):
        """The batched on-device BS.1770 path agrees with the host meter
        within 0.1 LU on every per-system error of a full sweep."""
        mean_loudness = {t: -20.0 for t in ("bass", "drums", "vocals", "other")}
        host = LoudnessEvaluator(None, mean_loudness, seed=0,
                                 results_dir=str(tmp_path / "h"))
        dev = LoudnessEvaluator(None, mean_loudness, seed=0,
                                results_dir=str(tmp_path / "d"), device_meter=True)
        s_host = host.process_song(musdb_root, SONGS[0])
        s_dev = dev.process_song(musdb_root, SONGS[0])
        for k in ("sum_error", "loudnorm_error", "random_error"):
            assert abs(s_host[k] - s_dev[k]) <= 0.1, (k, s_host[k], s_dev[k])

    def test_identical_tracks_zero_error(self, mixer):
        mean_loudness = {t: -20.0 for t in ("bass", "drums", "vocals", "other")}
        ev = LoudnessEvaluator(mixer, mean_loudness, results_dir="/tmp/_eval_t")
        rng = np.random.default_rng(0)
        tracks = {t: 0.1 * rng.standard_normal((2, 2 * SR)).astype(np.float32)
                  for t in ("bass", "drums", "vocals", "other")}
        ld1 = ev.evaluate_loudness(tracks)
        from collections import OrderedDict

        d = OrderedDict(zip(("bass", "drums", "vocals", "other"), ld1))
        assert ev.loudness_dict_diff(d, d) == 0.0


@pytest.mark.heavy
class TestListening:
    def test_prep_and_parse(self, musdb_root, mixer, tmp_path):
        from tpumix.models.baselines import RandomModel

        save_dir = str(tmp_path / "lt")
        models = {"random": RandomModel(rng=np.random.default_rng(0)), "mix": mixer}
        intervals = {s: (1, 4) for s in SONGS}
        listening.process_songlist(
            musdb_root, SONGS, models, save_dir=save_dir, time_intervals=intervals
        )
        files = os.listdir(save_dir)
        # reference + sum + 2 systems per song
        assert len(files) == len(SONGS) * 4

    def test_json_parser(self, tmp_path):
        payload = {
            "pages": [
                {
                    "id": "SongX",
                    "elements": [
                        {"id": "SongX_mix", "axis": [{"values": [80, 75]}]},
                        {"id": "SongX_sum", "axis": [{"values": [40, 50]}]},
                    ],
                }
            ]
        }
        p = str(tmp_path / "scores.json")
        with open(p, "w") as f:
            json.dump(payload, f)
        by_model, by_song = listening.parse_json(p)
        assert by_model["mix"] == [[80, 75]]
        assert by_song["SongX"]["sum"] == [40, 50]
        g = listening.global_scores(by_model)
        assert g["mix"] == [80, 75]

    def test_boxplot_writes_png(self, tmp_path):
        out = str(tmp_path / "figs" / "global.png")
        listening.produce_boxplot([[1, 2, 3], [2, 3, 4]], ["mix", "sum"], out)
        assert os.path.exists(out)


def test_device_meter_bucketing(tmp_path):
    """Different song lengths within one power-of-two bucket share a single
    compiled meter program (each distinct shape would otherwise be a fresh
    remote compile per song), and padding stays metrically transparent."""
    from tpumix.eval.evaluator import LoudnessEvaluator
    from tpumix.ops.loudness import integrated_loudness

    mean_loudness = {t: -20.0 for t in ("bass", "drums", "vocals", "other")}
    ev = LoudnessEvaluator(None, mean_loudness, seed=0,
                           results_dir=str(tmp_path), device_meter=True)
    rng = np.random.default_rng(0)
    for n in (100_000, 117_001):  # both bucket to 2**17
        tracks = {t: 0.1 * rng.standard_normal(n).astype(np.float32)
                  for t in ("bass", "drums", "vocals", "other")}
        rel = ev.evaluate_loudness(tracks)
        per = [integrated_loudness(np.asarray(tracks[t]), ev.sr)
               for t in ("bass", "drums", "vocals", "other")]
        host_rel = [p - float(np.mean(per)) for p in per]
        np.testing.assert_allclose(rel, host_rel, atol=0.1)
    assert ev._meter_fn._cache_size() == 1
