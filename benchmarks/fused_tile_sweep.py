import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time
import numpy as np, jax, jax.numpy as jnp
import tpumix.ops.conv_block_pallas as cbp
from tpumix.ops.conv_khgemm import conv2d_valid_khgemm

def timeit(f, bufs, label):
    t0=time.time(); float(f(bufs[0]))
    best = 1e9
    for b in bufs[1:]:
        tic = time.perf_counter(); float(f(b)); best = min(best, time.perf_counter() - tic)
    print(f"[{label}] best {best*1e3:.1f} ms (compile {time.time()-t0:.0f}s)", flush=True)
    return best

rng = np.random.default_rng(0)
xs, ws = (64, 511, 85, 16), (5, 5, 16, 32)   # conv2
x0 = np.asarray(rng.standard_normal(xs), np.float32)
w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.float32)
s = jnp.asarray(rng.uniform(0.8, 1.2, 32), jnp.float32)
t = jnp.asarray(rng.standard_normal(32) * 0.05, jnp.float32)
bufs = [jax.device_put(jnp.asarray(np.roll(x0, 7919*k+1))) for k in range(5)]
for b in bufs: float(jnp.sum(b))

K, Kp, TH = 80, 128, 24
n_tiles = -(-507 // TH)
@jax.jit
def pre(x):
    return jnp.sum(cbp._flat_tiles_nohalo(x, H=511, W=85, kh=5, kw=5, TH=TH,
        n_tiles=n_tiles, Wop=88, K=K, Kp=Kp, patches=True))
timeit(pre, bufs, "conv2 prebuild-only patches")
@jax.jit
def pre0(x):
    return jnp.sum(cbp._flat_tiles_nohalo(x, H=511, W=85, kh=5, kw=5, TH=TH,
        n_tiles=n_tiles, Wop=88, K=K, Kp=Kp, patches=False))
timeit(pre0, bufs, "conv2 prebuild-only concat")
os.environ["TPUMIX_PATCHES_COLS"] = "0"
timeit(jax.jit(lambda x: jnp.sum(cbp.conv_block_fused_khpack_v2(x, w, s, t, tile_rows=24))), bufs, "conv2 v2-B concat tr=24")
os.environ["TPUMIX_PATCHES_COLS"] = "1"
timeit(jax.jit(lambda x: jnp.sum(cbp.conv_block_fused_v2(x, w, s, t, tile_rows=24))), bufs, "conv2 v2-A(N=32) tr=24")
del bufs

xs5, ws5 = (64, 497, 71, 64), (9, 9, 64, 128)
x5 = np.asarray(rng.standard_normal(xs5), np.float32)
w5 = jnp.asarray(rng.standard_normal(ws5) * 0.05, jnp.float32)
s5 = jnp.asarray(rng.uniform(0.8, 1.2, 128), jnp.float32)
t5 = jnp.asarray(rng.standard_normal(128) * 0.05, jnp.float32)
b5 = [jax.device_put(jnp.asarray(np.roll(x5, 7919*k+1))) for k in range(5)]
for b in b5: float(jnp.sum(b))
timeit(jax.jit(lambda x: jnp.sum(x * 1.000001)), b5, "conv5 overhead-baseline")
timeit(jax.jit(lambda x: jnp.sum(jnp.maximum(conv2d_valid_khgemm(x, w5)*s5+t5, 0))), b5, "conv5 khgemm")
for tr in (8, 16):
    timeit(jax.jit(lambda x, tr=tr: jnp.sum(cbp.conv_block_fused_v2(x, w5, s5, t5, tile_rows=tr))), b5, f"conv5 v2-A tr={tr}")
@jax.jit
def pre5(x):
    return jnp.sum(cbp._flat_tiles_nohalo(x, H=497, W=71, kh=9, kw=9, TH=8,
        n_tiles=62, Wop=64, K=576, Kp=640, patches=True))
timeit(pre5, b5, "conv5 prebuild-only patches")
print("DONE", flush=True)
