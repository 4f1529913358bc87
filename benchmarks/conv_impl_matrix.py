"""Consolidated round-3 TPU measurements: per-layer fused-v2 vs khgemm, and
model-level segment timing for each conv_impl."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time
import numpy as np, jax, jax.numpy as jnp
import dataclasses

def fence(v): return float(v)

def timeit(f, bufs, label):
    t0 = time.time(); fence(f(bufs[0])); print(f"  [{label}] compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for b in bufs[1:]:
        tic = time.perf_counter(); fence(f(b)); best = min(best, time.perf_counter() - tic)
    print(f"  [{label}] best {best*1e3:.1f} ms", flush=True)
    return best

LAYERS = {
  "conv2": ((64, 511, 85, 16), (5, 5, 16, 32)),
  "conv3": ((64, 507, 81, 32), (5, 5, 32, 48)),
  "conv4": ((64, 503, 77, 48), (7, 7, 48, 64)),
  "conv5": ((64, 497, 71, 64), (9, 9, 64, 128)),
}

from tpumix.ops.conv_block_pallas import conv_block_fused_v2, conv_block_fused_khpack_v2
from tpumix.ops.conv_khgemm import conv2d_valid_khgemm

print("=== per-layer ===", flush=True)
rng = np.random.default_rng(0)
for name, (xs, ws) in LAYERS.items():
    Cout = ws[-1]
    x0 = np.asarray(rng.standard_normal(xs), np.float32)
    w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.float32)
    s = jnp.asarray(rng.uniform(0.8, 1.2, Cout), jnp.float32)
    t = jnp.asarray(rng.standard_normal(Cout) * 0.05, jnp.float32)
    bufs = [jax.device_put(jnp.asarray(np.roll(x0, 7919*k+1))) for k in range(4)]
    for b in bufs: fence(jnp.sum(b))
    # correctness vs khgemm once (device-side diff)
    va = "A" if Cout >= 128 else "B"
    fn = conv_block_fused_v2 if Cout >= 128 else conv_block_fused_khpack_v2
    d = float(jax.jit(lambda x: jnp.max(jnp.abs(
        fn(x, w, s, t) - jnp.maximum(conv2d_valid_khgemm(x, w) * s + t, 0.0))))(bufs[0]))
    print(f"{name}: v2-{va} delta vs khgemm {d:.2e}", flush=True)
    timeit(jax.jit(lambda x: jnp.sum(fn(x, w, s, t))), bufs, f"{name} v2-{va}")
    timeit(jax.jit(lambda x: jnp.sum(jnp.maximum(conv2d_valid_khgemm(x, w) * s + t, 0.0))), bufs, f"{name} khgemm")
    del bufs

print("=== model segment [64,4,88200] scalar2s ===", flush=True)
from tpumix.config import preset
from tpumix.models.registry import build_model
from tpumix.ops.stft import spectrogram_features
base = np.asarray(rng.standard_normal((64, 4, 88200)) * 0.1, np.float32)
sbufs = [jax.device_put(jnp.asarray(np.roll(base, 7919*k+1, axis=2))) for k in range(5)]
for b in sbufs: fence(jnp.sum(b))
gref = {}
for impl in ("khgemm", "pallas"):
    cfg = dataclasses.replace(preset("scalar2s"), conv_impl=impl)
    fe = cfg.frontend()
    model = build_model(cfg)
    v = model.init(jax.random.key(0), jnp.zeros((1, 4, 1025, 173), jnp.float32), train=False)
    @jax.jit
    def seg(x, model=model, v=v, fe=fe):
        feats = spectrogram_features(x, fe)
        _, gains = model.apply(v, feats, train=False)
        return gains
    g = np.asarray(seg(sbufs[0])); gref[impl] = g
    best = timeit(jax.jit(lambda x: jnp.sum(seg(x))), sbufs, f"segment {impl}")
    print(f"SEGMENT {impl}: {best*1e3:.1f} ms -> {64*2.0/best:.0f} audio-s/s resident", flush=True)
print("gain delta pallas vs khgemm:", np.abs(gref["pallas"] - gref["khgemm"]).max(), flush=True)
print("DONE", flush=True)
