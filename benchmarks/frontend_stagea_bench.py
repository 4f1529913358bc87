"""TPU measurement: DIF frontend stage-A formulations at the segment shape.

Question: does replacing stage A's unrolled direct 16-point DFT (~220 scaled
[T,128] tile accumulations) with a recursive real-input radix-2 FFT16 (~76
tile ops, ``stage_a="r2"``) buy measurable segment time?  Timing rules per
CLAUDE.md: vary input bytes across reps, fence with a host scalar readback,
report single-call best (includes the ~30 ms tunnel RTT) and a pipelined
rate (K dispatches, one fence).
"""
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpumix.config import FrontendConfig, preset
from tpumix.models.registry import build_model
from tpumix.ops.stft import spectrogram_features
from tpumix.ops.stft_dif_pallas import stft_features_dif_pallas_tm


def fence(v):
    return float(v)


SHAPE = (64, 4, 88200)
K = 8

rng = np.random.default_rng(0)
base = np.asarray(rng.standard_normal(SHAPE) * 0.1, np.float32)
base_dev = jax.device_put(base)
fence(jnp.sum(base_dev))
_roll = jax.jit(lambda b, k: jnp.roll(b, k, axis=2))
bufs = [_roll(base_dev, 7919 * k + 1) for k in range(K + 1)]
for b in bufs:
    fence(jnp.sum(b))


def timeit(f, label):
    t0 = time.time()
    fence(f(bufs[0]))
    print(f"[{label}] compile+first {time.time() - t0:.1f}s", flush=True)
    best = 1e9
    for b in bufs[1:4]:
        tic = time.perf_counter()
        fence(f(b))
        best = min(best, time.perf_counter() - tic)
    bestp = 1e9
    for _ in range(3):
        tic = time.perf_counter()
        acc = [f(b) for b in bufs[1:]]
        fence(jnp.sum(jnp.stack(acc)))
        bestp = min(bestp, (time.perf_counter() - tic) / K)
    print(
        f"[{label}] single-call best {best * 1e3:.1f} ms | pipelined {bestp * 1e3:.1f} ms",
        flush=True,
    )
    return bestp


cfg = FrontendConfig(hop_length=512)
print("=== frontend only ([64,4,88200] -> dB features) ===", flush=True)
for sa in ("direct", "r2"):
    f = jax.jit(
        lambda x, sa=sa: jnp.sum(stft_features_dif_pallas_tm(x, cfg, stage_a=sa))
    )
    timeit(f, f"dif stage_a={sa}")

print("=== scalar2s segment (frontend + khgemm trunk -> gains) ===", flush=True)
gref = {}
for sa in ("direct", "r2"):
    os.environ["TPUMIX_DIF_STAGEA"] = sa  # read at trace time
    mcfg = preset("scalar2s")
    fe = dataclasses.replace(mcfg.frontend(), implementation="dif_pallas")
    model = build_model(mcfg)
    v = model.init(
        jax.random.key(0), jnp.zeros((1, 4, 1025, 173), jnp.float32), train=False
    )

    @jax.jit
    def seg(x, model=model, v=v, fe=fe):
        feats = spectrogram_features(x, fe)
        _, gains = model.apply(v, feats, train=False)
        return gains

    gref[sa] = np.asarray(seg(bufs[0]))
    bestp = timeit(jax.jit(lambda x, seg=seg: jnp.sum(seg(x))), f"segment {sa}")
    print(
        f"SEGMENT stage_a={sa}: {bestp * 1e3:.1f} ms -> "
        f"{64 * 2.0 / bestp:.0f} audio-s/s resident",
        flush=True,
    )
dg = np.abs(gref["direct"] - gref["r2"]).max()
print(f"gain delta direct vs r2: {dg:.2e}", flush=True)
print("DONE", flush=True)
