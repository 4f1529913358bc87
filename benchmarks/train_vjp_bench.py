"""Training-step timing: conv_impl khgemm (custom VJP) vs xla at batch 48 x 2 s."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time, dataclasses
import numpy as np, jax, jax.numpy as jnp
from tpumix.config import preset
from tpumix.models.registry import build_model
from tpumix.train.state import adam_with_l2, create_train_state, make_train_step

rng = np.random.default_rng(0)
stems = np.asarray(rng.standard_normal((48, 4, 88200)) * 0.1, np.float32)
mix = stems.sum(axis=1)
sd, md = jax.device_put(jnp.asarray(stems)), jax.device_put(jnp.asarray(mix))
float(jnp.sum(sd)); float(jnp.sum(md))

for impl in ("xla", "khgemm_hybrid", "khgemm"):
    cfg = dataclasses.replace(preset("scalar2s"), conv_impl=impl, bn_momentum=0.99, use_dropout=False)
    model = build_model(cfg)  # conv_impl explicit -> no auto resolution
    tx = adam_with_l2(1e-3, 1e-5)
    state = create_train_state(model, jax.random.key(0), (1, 4, 1025, 173), tx)
    step = jax.jit(make_train_step(model, cfg.frontend(), tx), donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, sd, md, jax.random.key(1)); lv = float(m["loss"])
    print(f"[{impl}] compile+first {time.time()-t0:.1f}s loss {lv:.3f}", flush=True)
    # pipelined steps: dispatch N, fence once
    N = 6
    tic = time.perf_counter()
    for k in range(N):
        state, m = step(state, sd, md, jax.random.fold_in(jax.random.key(2), k))
    lv = float(m["loss"])
    dt = (time.perf_counter() - tic) / N
    print(f"[{impl}] {dt*1e3:.1f} ms/step (pipelined x{N}), loss {lv:.3f}", flush=True)
print("DONE", flush=True)
