"""Benchmark: full-song 5-stem mixing throughput (audio-seconds mixed per
wall-clock second per chip) vs the reference-equivalent CPU pipeline.

The reference publishes no throughput numbers (BASELINE.md), so the 1x
denominator is measured here: the reference's own control flow — sequential
per-chunk host torch.stft + batch-of-1 torch CNN calls + scipy smoothing
(tpumix/utils/reference_pipeline.py, mirroring reference
inference_utils.py:105-145) — run on the host CPU with a numerically
equivalent torch twin of the same model.

The tpumix numerator is the production path: one XLA program computing the
frontend + CNN gains for ALL chunks of a song at once (tpumix/infer/mixer.py)
plus the host smoothing epilogue — i.e. end-to-end ``mix_song_smooth``
wall-clock, not just the device kernel.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# v5e chip matmul peak: 197 TFLOP/s bf16; f32 matmuls run as 3-pass bf16
# (the "bf16x3" roofline measured per-layer in docs/PERF.md — conv5 61.9
# TF/s f32 ~ 94% of this peak).  The scoreboard hot path computes in f32,
# so f32 peak is the honest MFU denominator.
CHIP_PEAK_BF16_TFLOPS = 197.0
CHIP_PEAK_F32_TFLOPS = CHIP_PEAK_BF16_TFLOPS / 3.0


def host_init(model, frames: int = 173, seed: int = 0):
    """Build the model variable tree ENTIRELY on the host — no device, no
    tunnel, no compile.

    ``jax.eval_shape`` traces ``model.init`` abstractly (pure tracing: the
    axon tunnel is never touched), then the shapes are filled with numpy:
    He-normal kernels, zero biases, unit BN scales/vars.  Values are
    irrelevant to throughput — what matters is that the SAME host-resident
    tree feeds both the torch twin (so the CPU baseline needs no
    device->host fetch) and the TPU phases (which ``device_put`` lazily on
    first use).  This is what makes bench phase 0 genuinely tunnel-free:
    round 4's empty scoreboard traced to ``model.init`` running on the axon
    backend and the twin fetching params back through a stalled relay.
    """
    import jax

    shapes = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False),
        jax.ShapeDtypeStruct((2,), np.uint32),
        jax.ShapeDtypeStruct((1, 4, 1025, frames), np.float32),
    )
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        if "var" in name or "scale" in name:
            return np.ones(leaf.shape, leaf.dtype)
        if "mean" in name or "bias" in name:
            return np.zeros(leaf.shape, leaf.dtype)
        fan_in = max(1, int(np.prod(leaf.shape[:-1])))
        return (rng.standard_normal(leaf.shape) * np.sqrt(2.0 / fan_in)).astype(
            leaf.dtype
        )

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(fill, shapes)


def make_song(duration_s: float, sr: int = 44100, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = np.arange(n) / sr

    def shaped_noise(scale, smooth):
        x = rng.standard_normal(n)
        k = np.ones(smooth) / smooth
        return scale * np.convolve(x, k, mode="same")

    tracks = {
        "bass": 0.4 * np.sin(2 * np.pi * 80 * t) + shaped_noise(0.08, 64),
        "drums": shaped_noise(0.3, 2) * (np.sin(2 * np.pi * 3 * t) > 0.3),
        "vocals": 0.3 * np.sin(2 * np.pi * 300 * t + np.sin(2 * np.pi * 2 * t))
        + shaped_noise(0.08, 16),
        "other": shaped_noise(0.2, 8),
    }
    # samples on the PCM16 grid, as decoding real 16-bit stems produces —
    # this makes the int16 host->device transfer mode exactly lossless
    return {
        k: (np.round(np.clip(v, -1, 1) * 32768.0).clip(-32768, 32767) / 32768.0).astype(
            np.float32
        )
        for k, v in tracks.items()
    }


def bench_tpu(model, variables, song, state: dict, reps: int = 48, n_songs: int = 2):
    """End-to-end catalogue mixing throughput (audio-seconds/sec) on the
    default backend: ``n_songs`` full songs mixed through the pipelined
    multi-song path (device transfers/computes for later songs overlap the
    host smoothing epilogues of earlier ones — the production steady state).

    Uses int16 host->device transfer — lossless w.r.t. 16-bit PCM source
    material (MUSDB18-HQ stems) and half the bytes of float32; conformance of
    the int16 path is covered by tests/test_infer.py.

    ``state`` is updated INCREMENTALLY as each phase completes (resident rate
    first, then end-to-end best after every rep) so the watchdog in ``main``
    can emit an honest partial scoreboard even if the tunnel stalls a later
    phase indefinitely (multi-minute relay stalls are a measured behaviour of
    this environment).
    """
    import jax

    from tpumix.config import preset
    from tpumix.infer.mixer import SongMixer, STEMS

    from tpumix.config import MixConfig

    cfg = preset("scalar2s")
    transfer = os.environ.get("BENCH_TRANSFER", "int16")
    seg = int(os.environ.get("BENCH_SEG", "64"))
    mixer = SongMixer(
        model, variables, cfg, transfer_dtype=transfer,
        mix_cfg=MixConfig(chunk_length_s=cfg.chunk_length_s, max_chunks=seg),
    )
    conv_impl = getattr(model, "conv_impl", "n/a")
    print(
        f"[bench detail] frontend implementation = "
        f"{mixer.frontend.resolved_implementation()!r}, conv = {conv_impl!r} "
        f"(backend {jax.default_backend()!r}), transfer = {transfer!r}",
        file=sys.stderr,
    )
    dur = len(song["bass"]) / 44100.0
    songs = [song] + [
        make_song(dur, seed=100 + k) for k in range(n_songs - 1)
    ]
    bytes_per_sample = {"float32": 4, "int16": 2, "int12": 1.5, "mulaw8": 1}[transfer]
    wire_mb_per_song = len(STEMS) * len(song["bass"]) * bytes_per_sample / 1e6

    # warm-up compiles the (fixed-shape) segment program with a tiny song —
    # identical executables, 40x fewer bytes through the congestible relay
    state["phase"] = "warmup"  # heartbeat: lets the parent's progress monitor
    # distinguish "in a long compile" from "emitted nothing ever"
    mixer.mix_song_smooth(make_song(6.0, seed=99))
    state["phase"] = "link_probe"

    # raw-link probe, INTERLEAVED with the end-to-end reps below: the tunnel's
    # rate swings 20-40 MB/s (sometimes <15) minute to minute, so a
    # calibration run before/after the reps can sample different link weather
    # than the reps themselves and make utilization meaningless.  Content is
    # varied per probe (runtime memoization); each probe is fenced by a host
    # readback (block_until_ready lies on axon — CLAUDE.md).
    import jax.numpy as jnp

    C = mixer.chunk_samples
    # half a segment's wire bytes per probe: big enough that the ~30 ms tunnel
    # RTT biases the rate <10%, small enough that probing every rep doesn't
    # eat the measuring budget
    seg_bytes = int(len(STEMS) * seg * C * bytes_per_sample) // 2
    raw = np.frombuffer(
        np.random.default_rng(3).integers(0, 255, seg_bytes, np.uint8).tobytes(),
        np.uint8,
    ).reshape(len(STEMS), -1)

    @jax.jit
    def _consume(x):
        return jnp.sum(x.astype(jnp.float32))

    float(_consume(jnp.asarray(raw)))  # warm-up compile
    probe_rates = []

    def probe_link():
        buf = np.roll(raw, 7919 * len(probe_rates) + 13, axis=1)
        tic = time.perf_counter()
        float(_consume(jnp.asarray(buf)))
        probe_rates.append(seg_bytes / 1e6 / (time.perf_counter() - tic))

    # device-compute-only rate (data resident), for the bandwidth-wall record:
    # every call uses a DIFFERENT device-resident buffer (runtime memoization
    # would otherwise fake the number).  Measured in PIPELINED form — K
    # segment programs dispatched asynchronously, forced once — because that
    # is how the production path runs (song_gains_async queues segments
    # back-to-back) and because a single synchronous call through this
    # environment's remote tunnel carries a ~27-37 ms host round-trip that
    # the device never sees (measured round 3, docs/PERF.md).
    state["phase"] = "resident"
    stems = np.stack([song[t] for t in STEMS])
    need = seg * C
    base = np.tile(stems, (1, -(-need // stems.shape[1])))[:, :need].astype(np.float32)
    K = 16  # deeper pipeline amortises the final-fence tunnel RTT better
    # (measured: x8 1195, x16 1220 audio-s/s — the x16 figure is closer to
    # the true device-resident steady state)
    # one upload; the per-dispatch variants are built ON DEVICE (cheap 45 MB
    # rolls) instead of K+1 uploads — saves ~minutes on degraded-link days
    base_dev = jax.device_put(jnp.asarray(base))
    roll_dev = jax.jit(lambda x, s: jnp.roll(x, s, axis=1))
    bufs = [roll_dev(base_dev, 7919 * k + 1) for k in range(K + 1)]
    # force the rolls (one fused readback) so the timed window is gains only
    float(jnp.sum(jnp.stack([b[0, 0] for b in bufs])))
    np.asarray(mixer._gains_fn(bufs[0], seg))  # warm-up; host transfer is the
    # single-call rate (pays the full tunnel RTT)  # only trustworthy fence
    tic = time.perf_counter()
    np.asarray(mixer._gains_fn(bufs[1], seg))
    single = (seg * cfg.chunk_length_s) / (time.perf_counter() - tic)
    # pipelined rate: K async dispatches, one fence
    tic = time.perf_counter()
    handles = [mixer._gains_fn(x, seg) for x in bufs[1:]]
    for h in handles:
        np.asarray(h)
    resident = (K * seg * cfg.chunk_length_s) / (time.perf_counter() - tic)
    print(
        f"[bench detail] device-resident single-call {single:.0f} audio-s/s "
        f"(includes one tunnel round-trip); pipelined x{K} {resident:.0f} audio-s/s",
        file=sys.stderr,
    )
    state["device_resident"] = round(resident, 2)

    # MFU: analytic conv-trunk FLOPs (tpumix/models/flops.py, shape-pinned to
    # the reference flatten dims) over the measured pipelined segment time,
    # against the chip's f32 matmul peak.  Conservative by construction —
    # frontend/BN/ReLU/head work is excluded from the numerator, so the real
    # utilization is slightly higher than emitted.
    from tpumix.models.flops import trunk_flops_per_item

    seg_flops = seg * trunk_flops_per_item(2, 173)
    seg_time_s = (seg * cfg.chunk_length_s) / resident
    eff_tflops = seg_flops / seg_time_s / 1e12
    state["model_tflops"] = round(eff_tflops, 1)
    state["mfu"] = round(eff_tflops / CHIP_PEAK_F32_TFLOPS, 3)
    state["chip_peak_f32_tflops"] = round(CHIP_PEAK_F32_TFLOPS, 1)
    print(
        f"[bench detail] MFU: trunk {seg_flops / 1e12:.2f} TFLOP/segment / "
        f"{seg_time_s * 1e3:.1f} ms = {eff_tflops:.1f} TF/s effective = "
        f"{100 * eff_tflops / CHIP_PEAK_F32_TFLOPS:.0f}% of the {CHIP_PEAK_F32_TFLOPS:.1f} "
        f"TF/s f32 matmul peak ({100 * eff_tflops / CHIP_PEAK_BF16_TFLOPS:.0f}% of "
        f"bf16 peak); per-layer context in docs/PERF.md (conv5 61.9 TF/s measured)",
        file=sys.stderr,
    )

    # device-resident FULL mixing: gains + the entire smoothing epilogue
    # (savgol, mask stretch, per-stem scaling, mixdown, peak normalisation)
    # run as device programs — the host touches only a [4, n_gains] curve
    # fence.  This is the production-deployment number when stems live in
    # device-adjacent storage; the gains-only `device_resident` above remains
    # the series-comparable metric.  Fetching one output of the jitted
    # epilogue forces the whole program, so the tiny curve readback is an
    # honest fence for the 112 MB of mixed audio left in HBM.
    state["phase"] = "full_mix"
    np.asarray(mixer.mix_song_smooth_device(bufs[0])[2])  # warm-up compile
    tic = time.perf_counter()
    outs = [mixer.mix_song_smooth_device(x) for x in bufs[1:]]
    for _t, _m, sm in outs:
        np.asarray(sm)
    full = (K * seg * cfg.chunk_length_s) / (time.perf_counter() - tic)
    state["device_resident_full_mix"] = round(full, 2)
    print(
        f"[bench detail] device-resident FULL mix (incl. on-device smoothing "
        f"epilogue + mixdown) pipelined x{K}: {full:.0f} audio-s/s",
        file=sys.stderr,
    )
    del outs
    del bufs, base_dev  # release ~750 MB of HBM before the e2e phase

    state["phase"] = "e2e"
    best = float("inf")
    # the shared host->device relay in this environment stalls unpredictably
    # AND its rate swings 5-40 MB/s minute to minute (measured round 3); the
    # rep count is set high enough that the BUDGET, not the count, ends the
    # loop — best-of-many-reps is what catches a stable-weather window.  In
    # good weather the e2e path is link-saturated at ~2.3 s/song (90 MB wire
    # at the concurrently-probed raw rate), so `best` converges to the true
    # pipeline rate rather than to a stall artifact.  The loop RETRIES until
    # at least one rep lands inside a stable window — defined as the pipeline
    # reaching >=80% of the link roofline measured by the interleaved probes
    # (PERF.md: stable windows run 100-120 audio-s/s) — or the budget dies.
    budget = float(os.environ.get("BENCH_BUDGET_SECONDS", "420"))
    wire_mb_per_audio_s = wire_mb_per_song / dur
    started = time.perf_counter()
    for rep in range(reps):
        # the axon runtime memoizes identical executions — every rep must see
        # different bytes.  np.roll changes content at negligible host cost
        # while keeping the audio statistics identical.
        rep_songs = [
            {k: np.roll(v, 9973 * (rep * len(songs) + j) + 1) for k, v in s.items()}
            for j, s in enumerate(songs)
        ]
        tic = time.perf_counter()
        mixer.mix_songs_smooth(rep_songs)
        best = min(best, (time.perf_counter() - tic) / n_songs)
        probe_link()  # sample the link in the same weather window as the rep
        roofline = max(probe_rates) / wire_mb_per_audio_s
        state.update(
            value=round(dur / best, 2),
            link_mbps=round(wire_mb_per_song / best, 2),
            raw_link_mbps=round(max(probe_rates), 2),
            link_roofline_audio_s=round(roofline, 2),
            e2e_reps=rep + 1,
        )
        elapsed = time.perf_counter() - started
        stable = dur / best >= 0.8 * roofline
        if rep >= 2 and stable:
            break  # a rep landed in a stable window — the number is real
        if rep >= 1 and elapsed > budget:
            break

    raw_rate = max(probe_rates)
    link_rate = wire_mb_per_song / best
    util = link_rate / raw_rate
    state["link_utilization"] = round(util, 2)
    print(
        f"[bench detail] end-to-end {dur / best:.1f} audio-s/s; "
        f"device-resident compute {resident:.0f} audio-s/s; "
        f"pipeline link throughput {link_rate:.1f} MB/s = {100 * util:.0f}% of "
        f"the raw link rate ({raw_rate:.1f} MB/s, best of {len(probe_rates)} "
        f"push+fence probes INTERLEAVED with the reps: "
        f"{', '.join(f'{r:.1f}' for r in probe_rates)}).  The tunnel swings "
        f"20-40 MB/s minute to minute; utilization near or above 100% proves "
        f"the link itself, not host packing, bounds the end-to-end rate",
        file=sys.stderr,
    )


def bench_cpu_reference(model, variables, song_s: float = 16.0) -> float:
    """Reference-pipeline audio-seconds/sec on the host CPU.

    Best of 3 timed passes: the 1x denominator otherwise swings ~2x with
    ambient host load (observed 3.1-5.6 across bench runs), which whipsaws
    ``vs_baseline`` for reasons that have nothing to do with either pipeline.
    Best-of is the fastest the reference pipeline actually goes on this host
    — the conservative choice for the ratio."""
    import torch

    from tpumix.utils.reference_pipeline import (
        build_torch_twin,
        reference_mix_song_smooth,
    )

    torch.set_num_threads(os.cpu_count() or 1)
    twin = build_torch_twin(
        variables["params"], variables["batch_stats"], block1_dilation=2
    )
    song = make_song(song_s, seed=1)

    # warm-up a couple of chunks, then time the full song
    reference_mix_song_smooth(twin, {k: v[: 3 * 88200] for k, v in song.items()},
                              chunk_length=2.0, hop=512)
    best = float("inf")
    for _ in range(3):
        tic = time.perf_counter()
        reference_mix_song_smooth(twin, song, chunk_length=2.0, hop=512)
        best = min(best, time.perf_counter() - tic)
    return song_s / best


def _emit(state: dict) -> dict:
    """Assemble and print the ONE scoreboard JSON line from whatever phases
    have completed.  ``vs_baseline``, ``target`` and ``verdict`` are derived
    here so a watchdog emit sees them too.

    The line is SELF-ADJUDICATING against BASELINE.md's >=50x-per-chip north
    star: ``target`` = 50x the measured CPU reference rate,
    ``link_roofline_audio_s`` = the concurrently-probed raw tunnel rate
    divided by the wire bytes per audio-second (the physical ceiling of any
    end-to-end number in THIS environment), ``mfu`` = analytic trunk
    TFLOP/segment over measured segment time over the chip's f32 matmul
    peak, and ``verdict`` states which form of the claim the run proved:

    * ``met_e2e``       — end-to-end >= target (needs a link >17.6 MB/s
      sustained x50-baseline wire math; unreachable through this tunnel),
    * ``met_resident``  — the chip-reflecting rate >= target; the e2e
      shortfall is the host->device link (compare ``value`` against
      ``link_roofline_audio_s``),
    * ``link_bound``    — e2e saturates the link but the resident rate does
      not clear the target,
    * ``missed``        — none of the above held.
    """
    cpu = state.get("baseline_cpu_rate")
    result = {
        "metric": "audio_seconds_mixed_per_sec_per_chip",
        "value": state.get("value", 0.0),
        "unit": "audio_s/s",
    }
    # derive the ratio only from a MEASURED value: a watchdog emit before any
    # e2e rep completed must not claim a measured 0x baseline ratio (the
    # `stalled` flag plus the missing vs_baseline says "unmeasured", not "0")
    if cpu and "value" in state:
        result["vs_baseline"] = round(result["value"] / cpu, 2)
    if "device_resident" in state:
        result["device_resident"] = state["device_resident"]
        if cpu:
            result["vs_baseline_resident"] = round(state["device_resident"] / cpu, 2)
    for k in (
        "device_resident_full_mix",
        "baseline_cpu_rate",
        "link_mbps",
        "raw_link_mbps",
        "link_utilization",
        "link_roofline_audio_s",
        "model_tflops",
        "mfu",
        "chip_peak_f32_tflops",
        "e2e_reps",
        "stalled",
    ):
        if k in state:
            result[k] = state[k]
    if cpu:
        target = 50.0 * cpu
        result["target"] = round(target, 2)
        value = state.get("value", 0.0)
        resident = state.get("device_resident", 0.0)
        roofline = state.get("link_roofline_audio_s", 0.0)
        if value >= target:
            result["verdict"] = "met_e2e"
        elif resident >= target:
            result["verdict"] = "met_resident"
        elif roofline and value >= 0.8 * roofline:
            result["verdict"] = "link_bound"
        elif state.get("stalled") and not resident and not value:
            # the tunnel never yielded a single device number: that is a
            # weather fact about the relay, not a perf verdict on the chip
            result["verdict"] = "stalled"
        else:
            result["verdict"] = "missed"
    print(json.dumps(result), flush=True)
    return result


class _StateFile(dict):
    """Dict that atomically mirrors itself to a JSON file on every write,
    so the parent process sees each completed bench phase the moment it
    lands (and a killed child loses nothing already measured)."""

    def __init__(self, path: str):
        super().__init__()
        self._path = path

    def _flush(self) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dict(self), f)
        os.replace(tmp, self._path)

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self._flush()

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        self._flush()


def _build_model():
    from tpumix.config import preset
    from tpumix.models.registry import build_model

    # registry resolution gives the production hot path (conv_impl="auto"
    # -> khgemm on TPU backends)
    return build_model(preset("scalar2s"))


def _maybe_force_platform() -> None:
    # testing hook: the session's sitecustomize pins the axon platform before
    # env vars can act, so plumbing tests (tests/test_bench_harness.py) force
    # the CPU backend via config — which works until first device use
    plat = os.environ.get("BENCH_FORCE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def tpu_child(state_path: str) -> None:
    """Child-process entry: run every TPU phase, mirroring incremental state
    to ``state_path``.  Parameters are rebuilt deterministically via
    :func:`host_init` (same seed as the parent's twin), so nothing needs to
    cross the process boundary."""
    _maybe_force_platform()
    state = _StateFile(state_path)
    model = _build_model()
    variables = host_init(model)
    song = make_song(float(os.environ.get("BENCH_SONG_SECONDS", "240")))
    bench_tpu(model, variables, song, state)


def _read_state(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


_child_proc = None  # killed by the watchdog so a stalled child never outlives us


def _stall_budget(snapshot: dict, phase_stall: float, warmup_stall: float) -> float:
    """Per-phase no-progress budget for the TPU-child monitor.

    Cold remote compiles happen in the warmup phase and are MINUTES by
    documented behaviour (CLAUDE.md); a kill mid-compile never reaches the
    persistent cache, so the retry restarts cold and loses too (measured:
    two 300 s warmup kills on a fresh machine, round 5).  Warmup therefore
    gets the longer budget; measurement phases keep the tight one so a
    stalled fence there still dies fast."""
    return warmup_stall if snapshot.get("phase") == "warmup" else phase_stall


def run_tpu_phases(state: dict, deadline_at: float) -> None:
    """Run the TPU phases in a KILLABLE child process, monitored for
    progress, with one retry.

    Rationale (round-4 postmortem): the axon relay exhibits multi-minute
    stalls that block a fence indefinitely.  A stalled fence cannot be
    interrupted in-process — a thread blocked in the runtime stays blocked —
    so robustness requires a process boundary: the parent watches the state
    file, kills the child when it stops making progress (per-phase deadline,
    shorter than the global one), and retries once.  Stalls are weather;
    the retry usually lands in a better window, and everything the first
    attempt measured is preserved (the child flushes state incrementally).
    """
    import subprocess
    import tempfile

    global _child_proc
    phase_stall = float(os.environ.get("BENCH_PHASE_STALL_SECONDS", "300"))
    # warmup gets its own, longer budget (_stall_budget docstring); the
    # global deadline still caps everything
    warmup_stall = float(os.environ.get("BENCH_WARMUP_STALL_SECONDS", "600"))
    fd, state_path = tempfile.mkstemp(prefix="bench_state_", suffix=".json")
    os.close(fd)
    for attempt in range(2):
        if time.monotonic() > deadline_at - 30:
            break
        try:
            os.remove(state_path)
        except OSError:
            pass
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--tpu-child", state_path],
            stdout=sys.stderr,
            stderr=sys.stderr,
        )
        _child_proc = proc
        last_snapshot: dict = {}
        last_progress = time.monotonic()
        killed = False
        while True:
            ret = proc.poll()
            snap = _read_state(state_path)
            if snap != last_snapshot:
                state.update(snap)
                last_snapshot = snap
                last_progress = time.monotonic()
            if ret is not None:
                break
            now = time.monotonic()
            budget = _stall_budget(last_snapshot, phase_stall, warmup_stall)
            if now > deadline_at - 20 or now - last_progress > budget:
                why = (
                    "global deadline"
                    if now > deadline_at - 20
                    else f"stall budget {budget:.0f}s"
                    f" (phase {last_snapshot.get('phase')!r})"
                )
                print(
                    f"[bench detail] TPU child made no progress for "
                    f"{now - last_progress:.0f}s, {why} exceeded "
                    f"(attempt {attempt + 1}) — killing",
                    file=sys.stderr,
                )
                proc.kill()
                proc.wait()
                killed = True
                break
            time.sleep(2)
        _child_proc = None
        state.update(_read_state(state_path))
        if not killed and proc.returncode == 0 and "value" in state:
            state.pop("stalled", None)  # a clean retry clears attempt-1's flag
            try:
                os.remove(state_path)
            except OSError:
                pass
            return  # clean complete
        state["stalled"] = True
        print(
            f"[bench detail] TPU attempt {attempt + 1} "
            f"{'stalled' if killed else f'exited {proc.returncode}'}; "
            f"phases landed so far: {sorted(state)}",
            file=sys.stderr,
        )
    try:
        os.remove(state_path)
    except OSError:
        pass


def main() -> None:
    import threading

    _maybe_force_platform()
    model = _build_model()
    # host-side init: NO tunnel involvement — see host_init's docstring
    variables = host_init(model)

    # `value` is honest end-to-end wall-clock through this environment's
    # ~40 MB/s host->device tunnel (the binding constraint; see docs/PERF.md);
    # `device_resident` is the same program with data already on-chip — the
    # number that reflects the chip and survives to production deployments
    # where stems live in device-adjacent storage.
    state: dict = {}

    # Global watchdog backstop: emits whatever landed and hard-exits, so the
    # driver ALWAYS records a JSON line even if this process itself wedges.
    deadline = float(os.environ.get("BENCH_DEADLINE_SECONDS", "780"))
    deadline_at = time.monotonic() + deadline
    lock = threading.Lock()
    done = [False]

    def emit_once(stalled: bool) -> None:
        with lock:
            if done[0]:
                return
            done[0] = True
        if stalled:
            state["stalled"] = True
        _emit(state)
        sys.stdout.flush()
        sys.stderr.flush()

    def _watchdog():
        if _child_proc is not None:
            try:
                _child_proc.kill()
            except OSError:
                pass
        emit_once(stalled=True)
        os._exit(0)

    timer = threading.Timer(deadline, _watchdog)
    timer.daemon = True
    timer.start()

    # CPU reference first — now TRULY tunnel-free: params are host numpy
    # (host_init) and the torch twin is built from them without any
    # device->host fetch, so the 1x denominator exists even if the relay is
    # down all day.  Nothing runs concurrently with the torch baseline (the
    # TPU child starts after), per the idle-host measurement rule in
    # CLAUDE.md.
    state["baseline_cpu_rate"] = round(bench_cpu_reference(model, variables), 2)

    if os.environ.get("BENCH_NO_SUBPROCESS"):
        song = make_song(float(os.environ.get("BENCH_SONG_SECONDS", "240")))
        bench_tpu(model, variables, song, state)
    else:
        run_tpu_phases(state, deadline_at)
    timer.cancel()
    emit_once(stalled=bool(state.get("stalled")))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--tpu-child":
        tpu_child(sys.argv[2])
    else:
        main()
