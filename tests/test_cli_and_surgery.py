"""CLI workflows and the MedleyDB data-surgery tool."""

import json
import os

import numpy as np
import pytest

from tpumix.cli import main
from tpumix.data import wavio
from tpumix.data.surgery import (
    CATEGORIES,
    classify_instrument,
    group_stem_ids,
    process_song,
    write_naive_sum,
)

from test_data import make_song

SR = 44100


@pytest.fixture()
def raw_medleydb_song(tmp_path):
    """Raw MedleyDB layout: METADATA.yaml + per-instrument stems + mix."""
    import yaml

    name = "FakeBand_FakeSong"
    song = tmp_path / name
    stems_dir = song / f"{name}_STEMS"
    stems_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = SR  # 1 s
    instruments = {
        "S01": ("electric bass", "bass"),
        "S02": ("drum set", ""),
        "S03": ("male singer", ""),
        "S04": ("clean electric guitar", ""),
        "S05": ("tambourine", ""),
    }
    stems_audio = {}
    for sid in instruments:
        audio = 0.1 * rng.standard_normal(n).astype(np.float32)
        stems_audio[sid] = audio
        wavio.write(str(stems_dir / f"{name}_STEM_{sid[1:]}.wav"), audio, SR)
    mix = sum(stems_audio.values())
    wavio.write(str(song / f"{name}_MIX.wav"), mix, SR)
    meta = {
        "origin": "Independent Artist",
        "stems": {
            sid: {"instrument": inst, "component": comp}
            for sid, (inst, comp) in instruments.items()
        },
    }
    with open(song / f"{name}_METADATA.yaml", "w") as f:
        yaml.safe_dump(meta, f)
    return str(song), stems_audio


class TestSurgery:
    def test_classify(self):
        assert classify_instrument("drum set") == "drums"
        assert classify_instrument("electric bass") == "bass"
        assert classify_instrument("piano", component="bass") == "bass"
        assert classify_instrument("female singer") == "vocals"
        assert classify_instrument("clean electric guitar") == "other"

    def test_group_stem_ids(self, raw_medleydb_song):
        song_path, _ = raw_medleydb_song
        groups = group_stem_ids(song_path)
        assert groups["bass"] == ["01"]
        assert sorted(groups["drums"]) == ["02", "05"]
        assert groups["vocals"] == ["03"]
        assert groups["other"] == ["04"]

    def test_process_song_sums_stems(self, raw_medleydb_song):
        song_path, stems_audio = raw_medleydb_song
        process_song(song_path)
        name = os.path.basename(song_path)
        joined = os.path.join(song_path, f"{name}_STEMS_JOINED")
        drums, _ = wavio.read(os.path.join(joined, f"{name}_STEM_DRUMS.wav"))
        expected = stems_audio["S02"] + stems_audio["S05"]
        np.testing.assert_allclose(drums, expected, atol=1e-6)
        # every category exists
        for cat in CATEGORIES:
            assert os.path.exists(os.path.join(joined, f"{name}_STEM_{cat.upper()}.wav"))

    def test_naive_sum(self, raw_medleydb_song):
        song_path, stems_audio = raw_medleydb_song
        process_song(song_path)
        out = write_naive_sum(song_path)
        total, _ = wavio.read(out)
        expected = sum(stems_audio.values())
        np.testing.assert_allclose(total, expected, atol=1e-5)

    def test_process_root_applies_manual_overrides(self, raw_medleydb_song, capsys):
        """A song registered in MANUAL_OVERRIDES uses the hand-fixed buckets
        instead of the (deliberately mis-bucketing) metadata sweep; songs on
        the needs-review list warn (reference surgery notebook cells 11-12)."""
        from tpumix.data import surgery

        song_path, stems_audio = raw_medleydb_song
        root = os.path.dirname(song_path)
        name = os.path.basename(song_path)
        # metadata says S01 is bass; the "engineer" knows it's actually drums
        overrides = {name: {"drums": ["01", "02", "05"], "bass": [],
                            "vocals": ["03"], "other": ["04"]}}
        surgery.process_root(root, manual_overrides=overrides)
        joined = os.path.join(song_path, f"{name}_STEMS_JOINED")
        drums, _ = wavio.read(os.path.join(joined, f"{name}_STEM_DRUMS.wav"))
        expected = stems_audio["S01"] + stems_audio["S02"] + stems_audio["S05"]
        np.testing.assert_allclose(drums, expected, atol=1e-6)
        bass, _ = wavio.read(os.path.join(joined, f"{name}_STEM_BASS.wav"))
        np.testing.assert_allclose(bass, 0.0, atol=1e-7)  # empty bucket

    def test_process_root_warns_on_unfixed_review_songs(self, raw_medleydb_song,
                                                        monkeypatch, capsys):
        from tpumix.data import surgery

        song_path, _ = raw_medleydb_song
        root = os.path.dirname(song_path)
        name = os.path.basename(song_path)
        monkeypatch.setattr(surgery, "NEEDS_MANUAL_REVIEW", (name,))
        surgery.process_root(root, manual_overrides={})
        assert "WARNING" in capsys.readouterr().out

    def test_reference_override_table_shape(self):
        """The recorded reference fix (surgery notebook cell 12) is shipped."""
        from tpumix.data.surgery import CATEGORIES, MANUAL_OVERRIDES

        fix = MANUAL_OVERRIDES["TheSoSoGlos_Emergency"]
        assert set(fix) == set(CATEGORIES)
        assert fix["bass"] == ["01", "08"]
        all_ids = sorted(i for ids in fix.values() for i in ids)
        assert all_ids == [f"{i:02d}" for i in range(1, 11)]  # a partition


@pytest.mark.heavy
class TestCLI:
    def test_help_all_subcommands(self, capsys):
        for cmd in ["train", "mix", "evaluate", "mean-loudness", "precompute",
                    "surgery", "listening-prep", "listening-parse", "bench", "serve"]:
            with pytest.raises(SystemExit) as e:
                main([cmd, "--help"])
            assert e.value.code == 0

    def test_mean_loudness_command(self, tmp_path):
        base = str(tmp_path / "data")
        os.makedirs(base)
        make_song(base, "S1", 2.0, seed=1)
        out = str(tmp_path / "ml.json")
        rc = main(["mean-loudness", "--data", base, "--out", out])
        assert rc == 0
        ml = json.load(open(out))
        assert set(ml) == {"bass", "drums", "vocals", "other", "mix"}

    def test_mix_command(self, tmp_path):
        base = str(tmp_path / "data")
        os.makedirs(base)
        make_song(base, "S1", 4.0, seed=2)
        out = str(tmp_path / "mixed")
        rc = main([
            "mix", "--data", base, "--song", "S1", "--model", "scalar1s",
            "--out", out, "--naive-sum",
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "S1_mixed.wav"))
        assert os.path.exists(os.path.join(out, "S1_sum.wav"))
        y, sr = wavio.read(os.path.join(out, "S1_mixed.wav"))
        assert sr == SR and y.shape[0] == 4 * SR

    def test_checkpoint_resolves_shipped_artifact_names(self):
        """--checkpoint accepts a bare shipped-artifact name (no path, no
        .npz) and resolves it through tpumix.assets.checkpoint_path."""
        from tpumix.cli import _load_variables

        variables = _load_variables("scalar1sL_synth")
        assert set(variables) >= {"params", "batch_stats"}
        # unknown bare names fall through to the Orbax path error, not a
        # silent random-weights mix
        with pytest.raises(Exception):
            _load_variables("no_such_artifact")

    def test_surgery_command(self, raw_medleydb_song, tmp_path):
        song_path, _ = raw_medleydb_song
        root = os.path.dirname(song_path)
        rc = main(["surgery", "--data", root])
        assert rc == 0

    def test_listening_parse_command(self, tmp_path):
        payload = {"pages": [{"id": "X", "elements": [
            {"id": "X_mix", "axis": [{"values": [70, 80]}]},
            {"id": "X_sum", "axis": [{"values": [30, 40]}]},
        ]}]}
        scores = str(tmp_path / "s.json")
        json.dump(payload, open(scores, "w"))
        out = str(tmp_path / "figs" / "g.png")
        rc = main(["listening-parse", "--scores", scores, "--out", out])
        assert rc == 0
        assert os.path.exists(out)


@pytest.mark.heavy
class TestCLITrain:
    def test_train_command_end_to_end(self, tmp_path):
        """Full CLI train on a tiny synthetic corpus (production shapes,
        scalar1s, 1 epoch)."""
        base = str(tmp_path / "data")
        os.makedirs(base)
        for i in range(2):
            make_song(base, f"T{i}", 4.0, seed=i)
        ckpt = str(tmp_path / "ckpts")
        rc = main([
            "train", "--data", base, "--model", "scalar1s", "--epochs", "1",
            "--batch-size", "4", "--checkpoint-dir", ckpt, "--run-name", "cli_e2e",
            "--augment",
        ])
        assert rc == 0
        run_dir = os.path.join(ckpt, "cli_e2e")
        assert os.path.exists(os.path.join(run_dir, "epoch_0000"))
        assert os.path.exists(os.path.join(run_dir, "metrics.csv"))


class TestRunDirCheckpointResolution:
    """evaluate/mix/serve --checkpoint accepts a trainer RUN directory and
    resolves it to the best-scored KEPT epoch via scores.json (users were
    reading the ledger by hand; entries whose dirs were pruned by
    keep-best-k must not win)."""

    def test_picks_best_kept_epoch(self, tmp_path, capsys):
        import json as _json

        from tpumix.cli import _resolve_run_dir

        run = tmp_path / "run"
        run.mkdir()
        # epoch 7 scores best but was pruned; 5 is the best KEPT
        (run / "scores.json").write_text(
            _json.dumps({"3": -0.5, "5": -0.1, "7": -0.05})
        )
        (run / "epoch_0003").mkdir()
        (run / "epoch_0005").mkdir()
        assert _resolve_run_dir(str(run)) == str(run / "epoch_0005")

    def test_passthrough_without_ledger(self, tmp_path):
        from tpumix.cli import _resolve_run_dir

        d = tmp_path / "epoch_0004"
        d.mkdir()
        assert _resolve_run_dir(str(d)) == str(d)


class TestLstsqDegenerateGuard:
    """cmd_train's loud warning for lstsq-family supervision on corpora
    whose mixture.wav is the plain stem sum (closed-form targets ~= 0 ->
    the objective learns the constant unity-gain predictor; measured live
    round 5 on an engineer-scaled corpus: best val 1e-6 at epoch 1)."""

    def _loader(self, scale):
        import numpy as np

        rng = np.random.default_rng(5)
        stems = (0.1 * rng.standard_normal((4, 4, 8192))).astype(np.float32)
        return [(stems, scale * stems.sum(axis=1))]

    def test_warns_on_plain_sum_mixture(self, capsys):
        from tpumix.cli import _warn_if_lstsq_degenerate

        _warn_if_lstsq_degenerate(self._loader(1.0))
        assert "DEGENERATE" in capsys.readouterr().out

    def test_silent_when_gains_are_real(self, capsys):
        from tpumix.cli import _warn_if_lstsq_degenerate

        _warn_if_lstsq_degenerate(self._loader(2.0))
        assert capsys.readouterr().out == ""


def test_platform_cpu_disables_compile_cache(tmp_path):
    """--platform cpu must clear the persistent compile cache the package
    enables for TPU backends at import time: CPU AOT executables are
    machine-feature-sensitive (SIGILL risk when the cache travels across
    machine profiles)."""
    import jax

    import tpumix.cli as cli

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cache"))
        rc = cli.main([
            "--platform", "cpu", "synth-data", "--out", str(tmp_path / "ds"),
            "--n-train", "0", "--n-test", "0", "--duration", "0.1",
        ])
        assert rc == 0
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
