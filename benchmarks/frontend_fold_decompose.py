"""Decompose the ct_pallas frontend's 14.1 ms/segment: how much is the XLA
phase-frame prebuild vs the fused kernel itself?  Decides whether folding the
prebuild into the kernel (halo BlockSpecs) is worth building."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpumix.config import FrontendConfig
from tpumix.ops import stft_ct_pallas as ctp
from tpumix.ops.stft import _CT_N1

SHAPE = (64, 4, 88200)
K = 8
cfg = FrontendConfig(hop_length=512, implementation="ct_pallas")

rng = np.random.default_rng(0)
base_dev = jax.device_put(np.asarray(rng.standard_normal(SHAPE) * 0.1, np.float32))
float(jnp.sum(base_dev))
_roll = jax.jit(lambda b, k: jnp.roll(b, k, axis=2))
bufs = [_roll(base_dev, 7919 * k + 1) for k in range(K + 1)]
for b in bufs:
    float(jnp.sum(b))


def timeit(f, label, inputs):
    t0 = time.time()
    float(jnp.sum(f(inputs[0])))
    print(f"[{label}] compile+first {time.time() - t0:.1f}s", flush=True)
    bestp = 1e9
    for _ in range(3):
        tic = time.perf_counter()
        acc = [f(b) for b in inputs[1:]]
        float(jnp.sum(jnp.stack([jnp.sum(a) for a in acc])))
        bestp = min(bestp, (time.perf_counter() - tic) / (len(inputs) - 1))
    print(f"[{label}] pipelined {bestp * 1e3:.2f} ms", flush=True)
    return bestp


n_fft, hop = cfg.n_fft, cfg.hop_length
n1v = _CT_N1
n2v = n_fft // n1v
hop_ph = hop // n1v
r = n_fft // hop


def prebuild(x):
    lead = x.shape[:-1]
    S = x.shape[-1]
    T = 1 + S // hop
    B = int(np.prod(lead))
    xb = x.reshape(B, S).astype(jnp.float32)
    pad = n_fft // 2
    xp = jnp.pad(xb, ((0, 0), (pad, pad)), mode=cfg.pad_mode)[:, : (T + r - 1) * hop]
    xph = xp.reshape(B, (T + r - 1) * hop // n1v, n1v).transpose(0, 2, 1)
    rows = xph.reshape(B, n1v, T + r - 1, hop_ph)
    return jnp.concatenate([rows[:, :, j : j + T] for j in range(r)], axis=-1)


# 1) prebuild only
timeit(jax.jit(prebuild), "prebuild only", bufs)

# 2) kernel only: frames prebuilt once per buf, kernel timed on them
frames = [jax.jit(prebuild)(b) for b in bufs]
for fb in frames:
    float(jnp.sum(fb))

b1_np, twre_np, twim_np, c3_np, s3_np = ctp._ct_kernel_bases_np(n_fft)
c3 = tuple(tuple(float(v) for v in row) for row in c3_np)
s3 = tuple(tuple(float(v) for v in row) for row in s3_np)
k1u = n1v // 2 + 1
bins_padded = k1u * n2v
T = 1 + SHAPE[-1] // hop
B = SHAPE[0] * SHAPE[1]

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

kernel = functools.partial(
    ctp._ct_kernel, n1v=n1v, n2v=n2v, k1u=k1u, c3=c3, s3=s3,
    amin=cfg.amin, multiplier=cfg.db_multiplier,
)


@jax.jit
def kernel_only(frames_ph):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n1v, T, n2v), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, n2v, 2 * n2v), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, n2v), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1v, n2v), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, bins_padded), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, bins_padded), jnp.float32),
        interpret=False,
    )(frames_ph, jnp.asarray(b1_np), jnp.asarray(twre_np), jnp.asarray(twim_np))


timeit(kernel_only, "kernel only (prebuilt frames)", frames)

# 3) full path
timeit(jax.jit(lambda x: ctp.stft_features_ct_pallas_tm(x, cfg)), "full ct_pallas", bufs)
print("DONE", flush=True)
