"""Closed-form lstsq target bias under a non-ideal mix bus (round-4 study).

The ``--loss lstsq`` supervision solves ``argmin_a ||sum_s a_s stem_s -
mix||^2`` per chunk (tpumix/train/state.py::_lstsq_gain_targets) — exact
when the mix IS a gain-weighted stem sum (the clean synthetic family), but
the reference's actual corpora supervise with HUMAN mixes that carry bus
processing (reverb/compression/limiting; reference model_trainer.py:25-44).
This script quantifies the resulting TARGET bias directly: per bus kind,
|lstsq target - true engineer gain| over held-out 2 s chunks, in scalar-gain
units (1 scalar-gain unit = 10 dB under the reference map amp = 10**(0.5 g)).

CPU-only (no TPU needed): ``python benchmarks/lstsq_bus_bias.py``.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tpumix.data.synthetic import BUS_KINDS, make_synth_song, mix_bus
from tpumix.train.state import _lstsq_gain_targets, _lstsq_tail_gain_targets

STEMS = ("bass", "drums", "vocals", "other")
SR = 44100
SEG = 2 * SR

plain_fn = jax.jit(_lstsq_gain_targets)
tail_fn = jax.jit(_lstsq_tail_gain_targets)

for kind in (None,) + tuple(BUS_KINDS):
    errs, errs_tail = [], []
    for seed in range(200, 210):
        presented, engineer, gains = make_synth_song(seed, duration_s=30.0, sr=SR)
        mix = engineer["mix"]
        if kind is not None:
            mix = mix_bus(mix, SR, kind)
        stems = np.stack([engineer[s] for s in STEMS])  # engineer-scaled
        # engineer-scaled stems => the true solution is a_s = 1 for every
        # stem (g_true = 0); any deviation is pure bus-induced bias
        for k in range(stems.shape[1] // SEG):
            sl = slice(k * SEG, (k + 1) * SEG)
            s = jnp.asarray(stems[None, :, sl])
            m = jnp.asarray(mix[None, sl])
            errs.append(np.abs(np.asarray(plain_fn(s, m))[0]))
            errs_tail.append(np.abs(np.asarray(tail_fn(s, m))[0]))
    errs, errs_tail = np.stack(errs), np.stack(errs_tail)  # [chunks, 4]
    print(
        f"{kind or 'clean':8s}: lstsq bias mean {10*errs.mean():.2f} dB "
        f"max {10*errs.max():.2f} | lstsq_tail mean {10*errs_tail.mean():.2f} "
        f"max {10*errs_tail.max():.2f}",
        flush=True,
    )
print("DONE", flush=True)
