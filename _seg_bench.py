"""Segment-level conv lowering comparison: [64,4,88200] -> gains on TPU."""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp
import dataclasses
from tpumix.config import preset
from tpumix.models.registry import build_model
from tpumix.ops.stft import spectrogram_features

variant = sys.argv[1]  # "khgemm" | "pallas"
if len(sys.argv) > 2:
    os.environ["TPUMIX_FUSED_MIN_COUT"] = sys.argv[2]

cfg = dataclasses.replace(preset("scalar2s"), conv_impl=variant)
fe = cfg.frontend()
model = build_model(cfg)
v = model.init(jax.random.key(0), jnp.zeros((1, 4, 1025, 173), jnp.float32), train=False)

@jax.jit
def seg(x):
    feats = spectrogram_features(x, fe)
    _, gains = model.apply(v, feats, train=False)
    return gains

rng = np.random.default_rng(0)
base = np.asarray(rng.standard_normal((64, 4, 88200)) * 0.1, np.float32)
bufs = [jax.device_put(jnp.asarray(np.roll(base, 7919 * k + 1, axis=2))) for k in range(5)]
for b in bufs:
    _ = float(jnp.sum(b))
tic = time.time(); g0 = np.asarray(seg(bufs[0])); print(f"compile+first: {time.time()-tic:.1f}s", flush=True)
best = 1e9
for b in bufs[1:]:
    tic = time.perf_counter(); _ = np.asarray(seg(b)); best = min(best, time.perf_counter() - tic)
rate = 64 * 2.0 / best
tag = variant + (f"@{os.environ.get('TPUMIX_FUSED_MIN_COUT','-')}" if variant == "pallas" else "")
print(f"SEGMENT {tag}: {best*1e3:.1f} ms -> {rate:.0f} audio-s/s resident; gains[0]={g0[0]}", flush=True)
