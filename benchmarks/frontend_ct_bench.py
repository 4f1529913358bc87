"""TPU measurement: frontend implementations at the mixing segment shape.

Question: does the Cooley-Tukey factorized DFT (``implementation="ct"``,
~1/12 the MXU MACs) beat the fused Pallas naive-DFT kernel, and what does it
do to the full scalar2s segment time?  Timing rules per CLAUDE.md: vary
input bytes across reps, fence with a host scalar readback, report both a
single-call best (includes the ~30 ms tunnel round trip) and a pipelined
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


def fence(v):
    return float(v)


SHAPE = (64, 4, 88200)  # 64-chunk segment, 4 stems, 2 s @ 44.1 kHz
K = 8

rng = np.random.default_rng(0)
base = np.asarray(rng.standard_normal(SHAPE) * 0.1, np.float32)
base_dev = jax.device_put(base)
fence(jnp.sum(base_dev))
# derive per-rep variants ON DEVICE (one 90 MB upload instead of nine; the
# axon runtime memoizes identical executions, so inputs must still differ)
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


print("=== frontend only ([64,4,88200] -> dB features) ===", flush=True)
feat = {}
ft = {}
for impl in ("ct_pallas", "ct", "pallas", "fft", "matmul"):
    cfg = FrontendConfig(hop_length=512, implementation=impl)
    f = jax.jit(lambda x, cfg=cfg: jnp.sum(spectrogram_features(x, cfg)))
    ft[impl] = timeit(f, f"frontend {impl}")
    full = jax.jit(lambda x, cfg=cfg: spectrogram_features(x[:2], cfg))
    feat[impl] = np.asarray(full(bufs[0]))

for impl in ("ct", "pallas", "fft", "matmul"):
    d = np.abs(feat["ct_pallas"] - feat[impl])
    print(
        f"ct_pallas vs {impl}: max {d.max():.2e} dB, mean {d.mean():.2e} dB", flush=True
    )

print("=== scalar2s segment (frontend + khgemm trunk -> gains) ===", flush=True)
gref = {}
for impl in ("ct_pallas", "ct", "pallas"):
    mcfg = preset("scalar2s")
    fe = dataclasses.replace(mcfg.frontend(), implementation=impl)
    model = build_model(mcfg)
    v = model.init(
        jax.random.key(0), jnp.zeros((1, 4, 1025, 173), jnp.float32), train=False
    )

    @jax.jit
    def seg(x, model=model, v=v, fe=fe):
        feats = spectrogram_features(x, fe)
        _, gains = model.apply(v, feats, train=False)
        return gains

    gref[impl] = np.asarray(seg(bufs[0]))
    bestp = timeit(jax.jit(lambda x, seg=seg: jnp.sum(seg(x))), f"segment {impl}")
    print(
        f"SEGMENT frontend={impl}: {bestp * 1e3:.1f} ms -> {64 * 2.0 / bestp:.0f} audio-s/s resident",
        flush=True,
    )
dg = np.abs(gref["ct"] - gref["pallas"]).max()
print(f"gain delta ct vs pallas: {dg:.2e}", flush=True)
dg = np.abs(gref["ct_pallas"] - gref["pallas"]).max()
print(f"gain delta ct_pallas vs pallas: {dg:.2e}", flush=True)
print("DONE", flush=True)
