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


def bench_tpu(model, variables, song, reps: int = 8, n_songs: int = 2) -> float:
    """End-to-end catalogue mixing throughput (audio-seconds/sec) on the
    default backend: ``n_songs`` full songs mixed through the pipelined
    multi-song path (device transfers/computes for later songs overlap the
    host smoothing epilogues of earlier ones — the production steady state).

    Uses int16 host->device transfer — lossless w.r.t. 16-bit PCM source
    material (MUSDB18-HQ stems) and half the bytes of float32; conformance of
    the int16 path is covered by tests/test_infer.py.
    """
    import jax

    from tpumix.config import preset
    from tpumix.infer.mixer import SongMixer, STEMS

    cfg = preset("scalar2s")
    transfer = os.environ.get("BENCH_TRANSFER", "int16")
    mixer = SongMixer(model, variables, cfg, transfer_dtype=transfer)
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
    mixer.mix_song_smooth(make_song(6.0, seed=99))

    # raw-link probe, INTERLEAVED with the end-to-end reps below: the tunnel's
    # rate swings 20-40 MB/s (sometimes <15) minute to minute, so a
    # calibration run before/after the reps can sample different link weather
    # than the reps themselves and make utilization meaningless.  One
    # segment's wire bytes, content varied per probe (runtime memoization),
    # fenced by a host readback (block_until_ready lies on axon — CLAUDE.md).
    import jax.numpy as jnp

    seg = 64
    C = mixer.chunk_samples
    seg_bytes = int(len(STEMS) * seg * C * bytes_per_sample)
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

    best = float("inf")
    # the shared host->device relay in this environment stalls unpredictably;
    # bound total measuring time while taking the best of whatever completed
    budget = float(os.environ.get("BENCH_BUDGET_SECONDS", "240"))
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
        if rep >= 1 and time.perf_counter() - started > budget:
            break

    # device-compute-only rate (data resident), for the bandwidth-wall record:
    # every call uses a DIFFERENT device-resident buffer (runtime memoization
    # would otherwise fake the number).  Measured in PIPELINED form — K
    # segment programs dispatched asynchronously, forced once — because that
    # is how the production path runs (song_gains_async queues segments
    # back-to-back) and because a single synchronous call through this
    # environment's remote tunnel carries a ~27-37 ms host round-trip that
    # the device never sees (measured round 3, docs/PERF.md).
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
    probe_link()  # one more sample after the resident phase
    raw_rate = max(probe_rates)
    link_rate = wire_mb_per_song / best
    util = link_rate / raw_rate
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
    return dur / best, resident, link_rate, raw_rate


def bench_cpu_reference(model, variables, song_s: float = 16.0) -> float:
    """Reference-pipeline audio-seconds/sec on the host CPU."""
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
    tic = time.perf_counter()
    reference_mix_song_smooth(twin, song, chunk_length=2.0, hop=512)
    dt = time.perf_counter() - tic
    return song_s / dt


def main() -> None:
    import jax

    from tpumix.config import preset
    from tpumix.models.registry import build_model

    # registry resolution gives the production hot path (conv_impl="auto"
    # -> khgemm on TPU backends)
    model = build_model(preset("scalar2s"))
    variables = model.init(
        jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False
    )

    song = make_song(float(os.environ.get("BENCH_SONG_SECONDS", "240")))
    tpu_rate, resident_rate, link_rate, raw_link_rate = bench_tpu(
        model, variables, song
    )
    cpu_rate = bench_cpu_reference(model, variables)

    # `value` is honest end-to-end wall-clock through this environment's
    # ~40 MB/s host->device tunnel (the binding constraint; see docs/PERF.md);
    # `device_resident` is the same program with data already on-chip — the
    # number that reflects the chip and survives to production deployments
    # where stems live in device-adjacent storage.
    result = {
        "metric": "audio_seconds_mixed_per_sec_per_chip",
        "value": round(tpu_rate, 2),
        "unit": "audio_s/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
        "device_resident": round(resident_rate, 2),
        "vs_baseline_resident": round(resident_rate / cpu_rate, 2),
        "baseline_cpu_rate": round(cpu_rate, 2),
        # saturation proof for the end-to-end `value`: the pipeline's wire
        # throughput vs the raw host->device link rate measured concurrently
        # in this run (the tunnel swings 20-40 MB/s minute to minute)
        "link_mbps": round(link_rate, 2),
        "raw_link_mbps": round(raw_link_rate, 2),
        "link_utilization": round(link_rate / raw_link_rate, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
