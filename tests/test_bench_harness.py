"""The bench.py scoreboard harness: tunnel-free phase 0, incremental state
mirroring, verdict adjudication, and (heavy) the full parent/child run.

Round-4 postmortem: BENCH_r04.json was `{"value": 0.0, "stalled": true}` with
no other field because bench phase 0 ("CPU baseline, needs no tunnel") in
fact ran ``model.init`` on the axon backend and fetched the params back
through the relay to build the torch twin — one stall at session start
starved every phase.  These tests pin the fix: host-side init, a torch twin
built without any device fetch, a state file that preserves completed phases
across a child kill, and a self-adjudicating emit that still renders a
verdict from partial state.
"""
import importlib.util
import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

_REPO = pathlib.Path(__file__).resolve().parent.parent
_spec = importlib.util.spec_from_file_location("bench", _REPO / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


class TestStallBudget:
    def test_warmup_gets_the_long_budget(self):
        """Round-5 finding: a cold remote compile (minutes) in the warmup
        phase must not be killed by the tight measurement budget — a kill
        mid-compile never reaches the persistent cache, so the retry
        restarts cold and loses too."""
        assert bench._stall_budget({"phase": "warmup"}, 300.0, 600.0) == 600.0
        assert bench._stall_budget({"phase": "resident"}, 300.0, 600.0) == 300.0
        assert bench._stall_budget({"phase": "e2e"}, 300.0, 600.0) == 300.0
        # child not started yet / no phase written: tight budget
        assert bench._stall_budget({}, 300.0, 600.0) == 300.0


class TestHostInit:
    def test_host_numpy_tree_matching_device_init_structure(self):
        import jax

        model = bench._build_model()
        variables = bench.host_init(model)
        leaves = jax.tree_util.tree_leaves(variables)
        assert all(type(l) is np.ndarray for l in leaves)
        assert set(variables) == {"params", "batch_stats"}
        # identical treedef + shapes as a real on-device init
        real = model.init(
            jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
        )
        ref_shapes = jax.tree.map(lambda x: x.shape, real)
        got_shapes = jax.tree.map(lambda x: x.shape, variables)
        assert ref_shapes == got_shapes

    def test_torch_twin_builds_without_device(self):
        # the whole point of host_init: the 1x denominator must not need the
        # tunnel.  Twin construction from the numpy tree touches no jax array.
        from tpumix.utils.reference_pipeline import build_torch_twin

        variables = bench.host_init(bench._build_model())
        twin = build_torch_twin(
            variables["params"], variables["batch_stats"], block1_dilation=2
        )
        import torch

        masked, gains = twin(torch.zeros(1, 4, 1025, 173))
        assert masked.shape == (1, 1025, 173) and len(gains) == 4

    def test_deterministic_across_processes(self):
        # parent (twin) and child (TPU phases) rebuild the same tree from the
        # same seed — nothing crosses the process boundary
        a = bench.host_init(bench._build_model())
        b = bench.host_init(bench._build_model())
        import jax

        assert all(
            np.array_equal(x, y)
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )


class TestStateFile:
    def test_every_write_is_mirrored(self, tmp_path):
        path = str(tmp_path / "state.json")
        st = bench._StateFile(path)
        st["device_resident"] = 123.0
        assert json.load(open(path)) == {"device_resident": 123.0}
        st.update(value=4.5, e2e_reps=2)
        assert json.load(open(path))["value"] == 4.5
        # a later reader (the parent after killing the child) sees everything
        assert bench._read_state(path) == dict(st)

    def test_read_missing_or_garbage_is_empty(self, tmp_path):
        assert bench._read_state(str(tmp_path / "nope.json")) == {}
        p = tmp_path / "bad.json"
        p.write_text("{truncated")
        assert bench._read_state(str(p)) == {}


class TestEmitVerdicts:
    def _emit(self, state, capsys):
        bench._emit(dict(state))
        return json.loads(capsys.readouterr().out.strip())

    def test_met_resident(self, capsys):
        out = self._emit(
            {"baseline_cpu_rate": 4.0, "value": 100.0, "device_resident": 1300.0,
             "link_roofline_audio_s": 110.0, "mfu": 0.58},
            capsys,
        )
        assert out["verdict"] == "met_resident"
        assert out["target"] == 200.0
        assert out["vs_baseline_resident"] == 325.0
        assert out["mfu"] == 0.58

    def test_link_bound(self, capsys):
        out = self._emit(
            {"baseline_cpu_rate": 4.0, "value": 100.0, "device_resident": 150.0,
             "link_roofline_audio_s": 110.0},
            capsys,
        )
        assert out["verdict"] == "link_bound"

    def test_stall_with_no_device_number_is_weather_not_a_miss(self, capsys):
        out = self._emit({"baseline_cpu_rate": 4.0, "stalled": True}, capsys)
        assert out["verdict"] == "stalled"
        assert out["baseline_cpu_rate"] == 4.0
        # an unmeasured ratio must not be claimed as a measured 0x
        assert "vs_baseline" not in out

    def test_partial_stall_with_resident_still_adjudicates(self, capsys):
        # the round-5 "bad-weather day" contract: resident landed, e2e stalled
        out = self._emit(
            {"baseline_cpu_rate": 4.0, "device_resident": 1300.0, "stalled": True},
            capsys,
        )
        assert out["verdict"] == "met_resident"
        assert out["stalled"] is True

    def test_phase_heartbeat_never_leaks_into_the_scoreboard(self, capsys):
        out = self._emit(
            {"baseline_cpu_rate": 4.0, "phase": "resident", "value": 1.0}, capsys
        )
        assert "phase" not in out


@pytest.mark.heavy
class TestFullHarness:
    def test_parent_child_roundtrip_on_cpu(self):
        """The real entry point, end-to-end: parent computes the torch
        baseline, spawns the TPU child (forced to the CPU backend), merges
        its incremental state, emits one adjudicated JSON line."""
        env = dict(
            os.environ,
            BENCH_FORCE_PLATFORM="cpu",
            BENCH_SEG="4",
            BENCH_SONG_SECONDS="12",
            BENCH_BUDGET_SECONDS="15",
            BENCH_DEADLINE_SECONDS="420",
            BENCH_PHASE_STALL_SECONDS="240",
        )
        proc = subprocess.run(
            [sys.executable, str(_REPO / "bench.py")],
            env=env, capture_output=True, text=True, timeout=450,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        out = json.loads(proc.stdout.strip())
        assert out["metric"] == "audio_seconds_mixed_per_sec_per_chip"
        for key in ("baseline_cpu_rate", "device_resident", "mfu", "value",
                    "verdict", "target"):
            assert key in out, f"missing {key}: {out}"
        assert out["baseline_cpu_rate"] > 0 and out["device_resident"] > 0
