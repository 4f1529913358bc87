"""Common-mode vs differential split of lstsq/lstsq_tail target bias.

The evaluation metric is RELATIVE loudness (each stem's LUFS minus the
mix's LUFS, compared against the engineer's mix — parity with
/root/reference/evaluation.py:39-53): a per-chunk gain bias that shifts
ALL stems by the same dB moves stem and mix loudness together and cancels
in the metric.  Only the DIFFERENTIAL part (per-stem deviation from the
chunk's mean bias) can hurt mixing quality.  This measures that split per
mix-bus family for the plain and tail closed-form estimators
(tpumix/train/state.py::_lstsq_gain_targets / _lstsq_tail_gain_targets).

Round-5 measured conclusion (10 songs x 15 chunks/family, this script):

    bus      est     |total|  |common|  |diff|   (mean dB)
    reverb   plain    0.717    0.471    0.755
    reverb   tail     0.157    0.156    0.204
    comp     plain    0.315    0.315    0.269
    limiter  plain    0.249    0.249    0.167
    full     plain    1.132    0.632    0.960
    full     tail     0.729    0.729    0.480

comp/limiter bias is predominantly COMMON-MODE (metric-invariant); the
reverb comb is the differential offender, and the tail basis cuts the
full-bus metric-relevant (differential) bias 0.96 -> 0.48 dB.  An
envelope-normalized re-solve (estimate g(t)=env(mix)/env(recon), divide
out, re-solve) was prototyped and measured WORSE on comp (0.32 -> 0.39 dB
mean): the envelope ratio is itself biased by reverb-vs-direct phase, so
the idea is closed out in favour of the tail basis + this invariance
argument.

CPU-only: python benchmarks/lstsq_bias_split.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
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

print(f"{'bus':8s}  {'estimator':6s}  {'|total|':>9s}  {'|common|':>9s}  {'|diff|':>9s}   (mean dB; max in parens)")
for kind in (None,) + tuple(BUS_KINDS):
    rows = {"plain": [], "tail": []}
    for seed in range(200, 210):
        presented, engineer, gains = make_synth_song(seed, duration_s=30.0, sr=SR)
        mix = engineer["mix"]
        if kind is not None:
            mix = mix_bus(mix, SR, kind)
        stems = np.stack([engineer[s] for s in STEMS])
        for k in range(stems.shape[1] // SEG):
            sl = slice(k * SEG, (k + 1) * SEG)
            s = jnp.asarray(stems[None, :, sl])
            m = jnp.asarray(mix[None, sl])
            rows["plain"].append(np.asarray(plain_fn(s, m))[0])
            rows["tail"].append(np.asarray(tail_fn(s, m))[0])
    for name in ("plain", "tail"):
        b = 10.0 * np.stack(rows[name])  # signed per-stem bias, dB (truth=0)
        common = b.mean(axis=1, keepdims=True)
        diff = b - common
        print(
            f"{kind or 'clean':8s}  {name:6s}  "
            f"{np.abs(b).mean():9.3f}  {np.abs(common).mean():9.3f}  {np.abs(diff).mean():9.3f}   "
            f"(max {np.abs(b).max():.2f} / {np.abs(common).max():.2f} / {np.abs(diff).max():.2f})",
            flush=True,
        )
print("DONE", flush=True)
