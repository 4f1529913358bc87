"""Where does an end-to-end mixing rep actually spend its time? (1-core host)

Phases timed separately on the bench song; plus a raw-link probe with and
without a concurrent CPU spinner to test whether the tunnel transfer is
CPU-bound on this host.
"""
import os
import sys
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_song
from tpumix.config import preset
from tpumix.infer.mixer import SongMixer, STEMS
from tpumix.models.registry import build_model

model = build_model(preset("scalar2s"))
variables = model.init(jax.random.key(0), np.zeros((1, 4, 1025, 173), np.float32), train=False)
mixer = SongMixer(model, variables, preset("scalar2s"), transfer_dtype="int16")
mixer.mix_song_smooth(make_song(6.0, seed=99))  # warm compile

song = make_song(240.0, seed=7)

# phase 1: mono stack
tic = time.perf_counter()
mono = np.stack([mixer._mono(song[t]) for t in STEMS])
t_mono = time.perf_counter() - tic

# phase 2: int16 pack of both segments (same math as mixer.pack)
C = mixer.chunk_samples
seg = 64
n_gains = mono.shape[1] // C - 1  # 119 for the 240 s song (reference indexing)
tic = time.perf_counter()
packs = []
for lo in range(0, n_gains, seg):
    n = min(seg, n_gains - lo)
    src = mono[:, lo * C : (lo + n) * C]
    flat = np.empty((4, seg * C), np.int16)
    if n < seg:
        flat[:, n * C :] = 0
    flat[:, : n * C] = np.clip(np.rint(src * 32768.0), -32768, 32767)
    packs.append((flat, n))
t_pack = time.perf_counter() - tic

# phase 3: transfers + device compute, fenced
tic = time.perf_counter()
handles = [mixer._gains_fn(jnp.asarray(f), seg) for f, n in packs]
gains = np.concatenate([np.asarray(g)[:n] for g, (f, n) in zip(handles, packs)])
t_xfer = time.perf_counter() - tic

# phase 4: epilogue
tic = time.perf_counter()
mixer._apply_gains(song, mono.shape[1], gains)
t_epi = time.perf_counter() - tic

mb = 4 * seg * C * 2 * len(packs) / 1e6
print(f"mono {t_mono:.2f}s  pack {t_pack:.2f}s  transfer+compute {t_xfer:.2f}s "
      f"({mb / t_xfer:.1f} MB/s)  epilogue {t_epi:.2f}s", flush=True)

# raw probe with/without CPU spinner
raw = np.random.default_rng(3).integers(0, 255, int(4 * seg * C * 2), np.uint8).reshape(4, -1)

@jax.jit
def consume(x):
    return jnp.sum(x.astype(jnp.float32))

float(consume(jnp.asarray(raw)))

def probe(tag):
    best = 0.0
    for k in range(3):
        buf = np.roll(raw, 7919 * k + 13, axis=1)
        tic = time.perf_counter()
        float(consume(jnp.asarray(buf)))
        best = max(best, raw.nbytes / 1e6 / (time.perf_counter() - tic))
    print(f"raw link {tag}: {best:.1f} MB/s", flush=True)

probe("idle host")
stop = threading.Event()

def spin():
    x = np.random.default_rng(0).standard_normal(1 << 20)
    while not stop.is_set():
        x = x * 1.000001 + 0.000001

th = threading.Thread(target=spin, daemon=True)
th.start()
probe("with 1 CPU-spinner thread")
stop.set()
th.join()
print("DONE", flush=True)
