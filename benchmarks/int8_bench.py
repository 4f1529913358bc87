"""Round-4 int8 compute study (VERDICT r3 item 5): dynamic-W8A8 khgemm trunk.

Measures the two numbers the adopt-or-close-out decision needs
(docs/PERF.md "int8 compute study"):

1. trained-checkpoint gain deviation — flagship ``scalar2s_lstsq_selfsup``
   weights, REALISTIC synthetic-song features (the dead-input trap: on
   unrealistic inputs the ReLU trunk zeroes out and every impl "matches"),
   khgemm_int8 vs khgemm-f32, against the 1e-3 gain budget that gates the
   khgemm and Pallas paths (tests/test_infer.py);
2. TPU segment time at production batch [64, 4, 88200] (waveform -> fused
   STFT features -> model), khgemm-f32 vs khgemm_int8, same harness as
   benchmarks/conv_impl_matrix.py so rows are comparable.

Run on an idle host: ``timeout 1800 python benchmarks/int8_bench.py``.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpumix.assets import load_checkpoint
from tpumix.config import preset
from tpumix.data.synthetic import make_synth_song
from tpumix.models.registry import build_model
from tpumix.ops.stft import spectrogram_features

STEMS = ("bass", "drums", "vocals", "other")


def fence(v):
    return float(v)


def timeit(f, bufs, label):
    t0 = time.time()
    fence(f(bufs[0]))
    print(f"  [{label}] compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for b in bufs[1:]:
        tic = time.perf_counter()
        fence(f(b))
        best = min(best, time.perf_counter() - tic)
    print(f"  [{label}] best {best*1e3:.1f} ms", flush=True)
    return best


def realistic_batch(batch=64, seg_s=2.0, sr=44100):
    """[batch, 4, seg] engineer-scaled stem segments from synthetic songs."""
    seg = int(seg_s * sr)
    chunks = []
    seed = 100
    while len(chunks) < batch:
        _, engineer, _ = make_synth_song(seed, duration_s=30.0, sr=sr)
        song = np.stack([engineer[s] for s in STEMS])  # [4, n]
        for k in range(song.shape[1] // seg):
            chunks.append(song[:, k * seg : (k + 1) * seg])
            if len(chunks) >= batch:
                break
        seed += 1
    return np.stack(chunks).astype(np.float32)  # [batch, 4, seg]


cfg_f32 = dataclasses.replace(preset("scalar2s"), conv_impl="khgemm")
cfg_i8 = dataclasses.replace(preset("scalar2s"), conv_impl="khgemm_int8")
fe = cfg_f32.frontend()
variables = load_checkpoint("scalar2s_lstsq_selfsup")

print("=== gain deviation, trained flagship weights, realistic features ===",
      flush=True)
wave = realistic_batch()
gains = {}
for name, cfg in (("khgemm", cfg_f32), ("int8", cfg_i8)):
    model = build_model(cfg)

    @jax.jit
    def seg(x, model=model):
        feats = spectrogram_features(x, fe)
        _, g = model.apply(variables, feats, train=False)
        return g

    gains[name] = np.asarray(seg(jnp.asarray(wave)))
dev = np.abs(gains["int8"] - gains["khgemm"])
print(f"gain mean|max deviation int8 vs f32: {dev.mean():.2e} | {dev.max():.2e}"
      f"  (budget 1e-3; f32 gain RMS {np.sqrt((gains['khgemm']**2).mean()):.3f})",
      flush=True)

print("=== segment time [64, 4, 88200] scalar2s ===", flush=True)
rng = np.random.default_rng(0)
base = wave
sbufs = [jax.device_put(jnp.asarray(np.roll(base, 7919 * k + 1, axis=2)))
         for k in range(5)]
for b in sbufs:
    fence(jnp.sum(b))
times = {}
for name, cfg in (("khgemm", cfg_f32), ("int8", cfg_i8)):
    model = build_model(cfg)

    @jax.jit
    def seg(x, model=model):
        feats = spectrogram_features(x, fe)
        _, g = model.apply(variables, feats, train=False)
        return jnp.sum(g)

    times[name] = timeit(seg, sbufs, f"segment {name}")
    print(f"SEGMENT {name}: {times[name]*1e3:.1f} ms -> "
          f"{64*2.0/times[name]:.0f} audio-s/s resident", flush=True)
print(f"speedup int8 vs khgemm-f32: {times['khgemm']/times['int8']:.2f}x",
      flush=True)
print("DONE", flush=True)
