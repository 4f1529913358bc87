"""Training-step timing: compute_dtype f32 vs bf16 at batch 48 x 2 s.

Round-3 measured bf16 thoroughly for INFERENCE (no gain at the khgemm
roofline — docs/PERF.md) but training was only ever timed in f32
(lax.conv, ~150 ms/step pipelined).  The backward's grad convs have
different MXU shapes than the forward, so the inference verdict does not
transfer automatically.  Two hot loops measured:

* the waveform-in reference-objective step (make_train_step, xla conv) —
  the real-corpus training path (reference model_trainer.py:25-44);
* the fused synthetic lstsq step (SyntheticTrainer._fused_step) — the
  shipped-checkpoint recipe's loop (zero host->device transfers).

Run on an IDLE host (CLAUDE.md: concurrent load skews dispatch gaps).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses, time

import jax, jax.numpy as jnp, numpy as np

from tpumix.config import TrainConfig, preset
from tpumix.models.registry import build_model, example_feature_shape
from tpumix.train.state import adam_with_l2, create_train_state, make_train_step
from tpumix.train.trainer import SyntheticTrainer

rng = np.random.default_rng(0)
stems = np.asarray(rng.standard_normal((48, 4, 88200)) * 0.1, np.float32)
mix = stems.sum(axis=1)
sd, md = jax.device_put(jnp.asarray(stems)), jax.device_put(jnp.asarray(mix))
float(jnp.sum(sd)); float(jnp.sum(md))

N = 6
for dtype in ("float32", "bfloat16"):
    cfg = dataclasses.replace(
        preset("scalar2s"), compute_dtype=dtype, bn_momentum=0.99, use_dropout=False
    )
    model = build_model(cfg, for_training=True)
    tx = adam_with_l2(1e-3, 1e-5)

    # --- waveform-in reference-objective step -------------------------------
    state = create_train_state(model, jax.random.key(0), (1, 4, 1025, 173), tx)
    step = jax.jit(make_train_step(model, cfg.frontend(), tx), donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, sd, md, jax.random.key(1)); lv = float(m["loss"])
    print(f"[ref {dtype}] compile+first {time.time()-t0:.1f}s loss {lv:.3f}", flush=True)
    tic = time.perf_counter()
    for k in range(N):
        state, m = step(state, sd, md, jax.random.fold_in(jax.random.key(2), k))
    lv = float(m["loss"])
    dt = (time.perf_counter() - tic) / N
    print(f"[ref {dtype}] {dt*1e3:.1f} ms/step (pipelined x{N}), loss {lv:.3f}", flush=True)

    # --- fused synthetic lstsq step (shipped recipe) -------------------------
    tcfg = TrainConfig(batch_size=48, loss="lstsq", checkpoint_dir="/tmp/bf16bench")
    frontend = cfg.frontend()
    tr = SyntheticTrainer(
        model, frontend, tcfg, example_feature_shape(cfg),
        chunk_samples=frontend.chunk_samples(cfg.chunk_length_s),
    )
    t0 = time.time()
    tr.state, m = tr._fused_step(tr.state, jax.random.key(3)); lv = float(m["loss"])
    print(f"[lstsq {dtype}] compile+first {time.time()-t0:.1f}s loss {lv:.4f}", flush=True)
    tic = time.perf_counter()
    for k in range(N):
        tr.state, m = tr._fused_step(tr.state, jax.random.key(3))
    lv = float(m["loss"])
    dt = (time.perf_counter() - tic) / N
    print(f"[lstsq {dtype}] {dt*1e3:.1f} ms/step (pipelined x{N}), loss {lv:.4f}", flush=True)
print("DONE", flush=True)
