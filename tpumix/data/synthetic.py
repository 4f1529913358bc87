"""Synthetic multitrack data engine: on-device training batches + host-side
eval datasets.

Why this exists: the reference trains on MedleyDB/MUSDB18 — licensed corpora
that are not shippable with a framework.  tpumix needs an in-repo, end-to-end
demonstration that the train -> checkpoint -> mix -> evaluate loop *learns a
good mixer* (the reference's record is a 2.1715 mean relative-loudness error
vs baselines, reference evaluation.py:197-198).  This module defines a
synthetic mixing task with the same shape as the real one:

* **4 stem families** with distinct spectra (bass: AM sine; drums: periodic
  decaying noise bursts + 60 Hz kick; vocals: vibrato tone with a slow
  envelope; other: band-passed noise) — analogous to the MedleyDB stem
  buckets (reference data/medleydb_data_surgery.ipynb cell 8).
* **Random presentation levels** per (song, stem): each unit-RMS stem is
  scaled to a uniform random RMS level — the "raw session levels" a mixing
  engineer receives.
* **A deterministic "engineer"** who rebalances each stem to a per-class
  target level, with *content-dependent rides*: the vocal target follows the
  drums-vs-bass balance and the 'other' target follows the vocals-vs-drums
  balance.  The rides are the part a loudness-normalisation baseline
  (MeanLoudnessModel) cannot reproduce but a CNN that sees all four stem
  spectrograms can — so a trained model can *beat* the loudnorm baseline,
  not just tie it.

Two implementations of the same generative family:

* :func:`synth_chunk_batch` — jittable jnp generator producing training
  batches ENTIRELY ON DEVICE.  The host->device link in this environment is
  ~40 MB/s; generating `(stems [B,4,C], mix [B,C])` inside the jitted train
  step removes the transfer from the training hot path completely (the
  reference burns its train wall-clock on CPU STFT + PCIe transfer,
  SURVEY.md §3.1).
* :func:`make_synth_song` / :func:`write_synth_dataset` — numpy host twin
  that materialises full songs as PCM16 WAVs in the MUSDB18 layout
  (``test/{song}/{stem}.wav`` presented stems,
  ``manual_gain_mixes/{song}/{stem}.wav`` engineer-scaled stems), consumable
  by the unmodified LoudnessEvaluator / CLI pipeline.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

STEMS: Tuple[str, ...] = ("bass", "drums", "vocals", "other")

# presentation-level range (dB RMS, full scale = 0) for raw session stems.
# The spread (12 dB) and the targets below keep the engineer's amplitude
# gains in ~[0.5, 2.8] — the regime where the reference's dB-domain training
# objective and its 10**(0.5*m) inference map are mutually consistent
# (content spectrogram bins sit around +10 dB at these levels with the
# unnormalised n_fft=2048 STFT, so dm/dG ~ 1/10 matches the 0.5*log10 slope).
PRESENT_DB: Tuple[float, float] = (-26.0, -14.0)
# per-class engineer target levels (dB RMS)
BASE_TARGETS_DB: Dict[str, float] = {
    "bass": -19.0,
    "drums": -18.0,
    "vocals": -17.0,
    "other": -20.0,
}
# broadband noise bed mixed into every stem at this level below the stem RMS:
# keeps all spectrogram bins well above the amin floor (-100 dB), without
# which the dB-domain linear supervision collapses (floor bins dominate the
# regression and the model learns a constant gain)
NOISE_BED_DB = -30.0
# content-dependent rides (dB): vocals follow the drums-vs-bass balance,
# 'other' follows the vocals-vs-drums balance; both saturate at +-1 via
# clip(delta_level / RIDE_SCALE_DB)
RIDE_VOCALS_DB = 3.0
RIDE_OTHER_DB = 2.0
RIDE_SCALE_DB = 10.0

# --- mix-bus perturbation presets -------------------------------------------
# The clean family builds the reference mix as an EXACT gain-weighted stem sum
# — the assumption that makes the closed-form lstsq targets identifiable
# (tpumix/train/state.py::_lstsq_gain_targets).  Real engineer mixes violate
# it: the mix bus carries reverb, compression, and limiting (the reference
# supervises against such human mixes, reference model_trainer.py:25-44 /
# evaluation.py:194-198).  ``mix_bus`` below models those three stages so the
# degradation of the lstsq recipe under a non-ideal bus is measurable in-repo
# (docs/results/synthetic_eval).  Parameters are typical mastering-chain
# settings, deliberately on the heavy side.
BUS_REVERB_TAPS = 8  # sparse multi-tap tail (cheap, jittable)
BUS_REVERB_DELAY_S = 0.009  # per-tap spacing -> ~72 ms tail
BUS_REVERB_GAIN = 0.35  # wet level
BUS_REVERB_DECAY = 0.6  # per-tap decay
BUS_COMP_THRESH_DB = -18.0  # soft-knee RMS compressor
BUS_COMP_RATIO = 3.0
BUS_COMP_KNEE_DB = 6.0
BUS_COMP_WIN_S = 0.02  # envelope window
BUS_LIMIT_DRIVE = 1.6  # tanh soft limiter drive
BUS_KINDS = ("reverb", "comp", "limiter", "full")


def mix_bus(mix, sr: int, kind: str):
    """Non-ideal mix-bus processing for the engineer's mix: a short sparse
    reverb tail, a soft-knee RMS compressor, and a tanh peak limiter —
    ``kind`` selects one stage or ``"full"`` for the whole chain.  Works on
    numpy and jnp arrays (jittable); operates along the last axis.

    Each stage breaks the exact-gain-sum mix model in a distinct way: reverb
    adds a linear but non-instantaneous component (stem-correlated, so lstsq
    absorbs part of it), compression is a time-varying level-dependent gain,
    and the limiter is memoryless but amplitude-nonlinear.
    """
    if kind not in BUS_KINDS:
        raise ValueError(f"unknown mix_bus kind {kind!r}; expected one of {BUS_KINDS}")
    xp = np if isinstance(mix, np.ndarray) else _jnp()

    def movavg(x, k):
        pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
        c = xp.cumsum(xp.pad(x, pad, mode="edge"), axis=-1)
        return (c[..., k:] - c[..., :-k]) / k

    if kind in ("reverb", "full"):
        d = max(int(BUS_REVERB_DELAY_S * sr), 1)
        n = mix.shape[-1]
        wet = xp.zeros_like(mix)
        for k in range(1, BUS_REVERB_TAPS + 1):
            pad = [(0, 0)] * (mix.ndim - 1) + [(k * d, 0)]
            tap = xp.pad(mix, pad)[..., :n]
            wet = wet + (BUS_REVERB_DECAY**k) * tap
        mix = mix + BUS_REVERB_GAIN * wet
    if kind in ("comp", "full"):
        win = max(int(BUS_COMP_WIN_S * sr), 1)
        env_db = 10.0 * xp.log10(movavg(mix * mix, win) + 1e-12)
        over = env_db - BUS_COMP_THRESH_DB
        knee = BUS_COMP_KNEE_DB
        slope = 1.0 - 1.0 / BUS_COMP_RATIO
        # gain reduction in dB: 0 below the knee, slope*over above it,
        # quadratic interpolation inside the knee (standard soft-knee law)
        reduction = xp.where(
            over <= -knee / 2,
            xp.zeros_like(over),
            xp.where(
                over >= knee / 2,
                slope * over,
                slope * (over + knee / 2) ** 2 / (2.0 * knee),
            ),
        )
        mix = mix * 10.0 ** (-reduction / 20.0)
    if kind in ("limiter", "full"):
        # unity small-signal slope; only peaks compress
        mix = xp.tanh(mix * BUS_LIMIT_DRIVE) / BUS_LIMIT_DRIVE
    return mix


def engineer_targets_db(u_db):
    """Per-stem engineer target levels given presented levels ``u_db [..., 4]``
    (stem order = STEMS).  Works for numpy and jnp arrays."""
    xp = np if isinstance(u_db, np.ndarray) else _jnp()
    ride_v = RIDE_VOCALS_DB * xp.clip((u_db[..., 1] - u_db[..., 0]) / RIDE_SCALE_DB, -1.0, 1.0)
    ride_o = RIDE_OTHER_DB * xp.clip((u_db[..., 2] - u_db[..., 1]) / RIDE_SCALE_DB, -1.0, 1.0)
    base = [BASE_TARGETS_DB[s] for s in STEMS]
    zeros = xp.zeros_like(u_db[..., 0])
    return xp.stack(
        [base[0] + zeros, base[1] + zeros, base[2] + ride_v, base[3] + ride_o],
        axis=-1,
    )


def _jnp():
    import jax.numpy as jnp

    return jnp


# --------------------------------------------------------------------------
# Device-side generator (jittable)
# --------------------------------------------------------------------------


def _movavg(x, k: int):
    """Causal moving average along the last axis, same length (edge-padded)."""
    jnp = _jnp()
    c = jnp.cumsum(jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(k, 0)], mode="edge"), axis=-1)
    return (c[..., k:] - c[..., :-k]) / k


def synth_chunk_batch(
    rng,
    batch: int,
    n: int,
    sr: int = 44100,
    return_gains: bool = False,
    context_mult: int = 1,
    level_shift_db: Optional[Tuple[float, float]] = None,
    mix_bus_kind: Optional[str] = None,
):
    """Jittable synthetic training batch: ``(stems [B, 4, n], mix [B, n])``.

    Each item is an independent 4-stem "song chunk" with random presentation
    levels and the engineer's content-dependent reference mix.  All arrays are
    created on device — zero host->device transfer.

    ``return_gains=True`` appends the generator's TRUE engineer gains in the
    model-scalar domain (``g`` such that the reference inference map
    ``10**(0.5*g)`` reproduces the engineer's amplitude gain, i.e.
    ``g = gain_dB / 10``) — the label for ``loss="gain"`` supervision.  The
    reference's self-supervised spectrogram objective has no analogue of this
    (real corpora carry no gain labels); on the synthetic family it is the
    identifiable objective (magnitude spectrograms of overlapping stems add
    incoherently, so the dB-domain mix-MSE optimum is biased several dB below
    the true gains — measured round 2).

    ``context_mult=K>1`` matches the INFERENCE distribution: levels, labels
    and the mix are defined over a K*n-sample context (the way a real song's
    presentation level and the engineer's constant per-song gain are
    song-global, tpumix/data/synthetic.py:make_synth_song), and the returned
    arrays are a random n-sample window of that context.  Window-level RMS
    then fluctuates around the context level exactly as full-song windows do,
    so the model learns the conditional-mean gain given a window instead of
    inverting each window's own RMS (trained at K=1, per-window predictions
    track content modulation and full-song mixes wobble — measured round 2).

    ``level_shift_db=(lo, hi)`` applies a per-item GLOBAL level shift (shared
    across all 4 stems) — scale-robustness training.  Real corpora arrive at
    arbitrary absolute levels (e.g. the PCM16 headroom normalisation in
    write_synth_dataset shifts whole songs -8..-14 dB), and models trained at
    fixed absolute levels lost to every baseline on level-shifted corpora
    (measured round 2).  Labels are SHIFT-COMPENSATED: gains take the stems
    from their OBSERVED levels to the absolute engineer targets, so the
    mapping stays a deterministic function of the input (a label left at the
    pre-shift gain would make the shared shift an unobservable noise term —
    an irreducible common-mode MSE floor).  The engineer's rides depend only
    on level DIFFERENCES (shift-invariant), and the evaluation metric is
    relative loudness, so shift-compensated and pre-shift gains are
    evaluation-equivalent; the compensated form is simply the learnable one.

    ``mix_bus_kind`` applies :func:`mix_bus` to the engineer's reference mix
    over the FULL context (as a real mastering chain processes the whole
    song) — the non-ideal-bus family for stressing the self-supervised
    objectives.  Stems and (with ``return_gains``) the gain labels stay
    clean: the labels remain the engineer's true gains, so label-supervised
    training is bus-invariant by construction while (stems, mix)-derived
    objectives (lstsq/coherent/reference/roundtrip) see the perturbation.
    """
    import jax
    import jax.numpy as jnp

    k = jax.random.split(rng, 15)
    B = batch
    n_win = n
    n = n * max(int(context_mult), 1)
    t = jnp.arange(n, dtype=jnp.float32) / sr  # [n]
    two_pi = 2.0 * jnp.pi

    def u(key, lo, hi, shape=(B, 1)):
        return jax.random.uniform(key, shape, minval=lo, maxval=hi)

    # bass: AM sine + a low rumble component
    f0 = u(k[0], 50.0, 120.0)
    ph = u(k[1], 0.0, two_pi, (B, 3))
    fam = u(k[2], 0.1, 0.5)
    bass = jnp.sin(two_pi * f0 * t + ph[:, 0:1]) * (1.0 + 0.3 * jnp.sin(two_pi * fam * t))

    # drums: periodic exponential-envelope noise bursts + 60 Hz kick
    period = u(k[3], 0.3, 0.7)  # seconds per hit
    decay = u(k[4], 8.0, 20.0)
    off = u(k[5], 0.0, 1.0)
    phase = jnp.mod(t / period + off, 1.0)
    env = jnp.exp(-phase * decay)
    dnoise = jax.random.normal(k[6], (B, n))
    drums = dnoise * env + 0.7 * jnp.sin(two_pi * 60.0 * t + ph[:, 1:2]) * env * env

    # vocals: vibrato tone with a slow amplitude envelope
    fv = u(k[7], 200.0, 500.0)
    fe = u(k[8], 0.2, 0.6)
    vib = 3.0 * jnp.sin(two_pi * 5.5 * t)
    envv = 0.55 + 0.45 * jnp.sin(two_pi * fe * t + ph[:, 2:3])
    vocals = jnp.sin(two_pi * fv * t + vib) * envv

    # other: band-passed noise (difference of moving averages)
    onoise = jax.random.normal(k[9], (B, n))
    other = _movavg(onoise, 8) - _movavg(onoise, 64)

    def unit_rms(x):
        return x / (jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True)) + 1e-8)

    # broadband bed per stem (see NOISE_BED_DB)
    bed_amp = 10.0 ** (NOISE_BED_DB / 20.0)
    beds = jax.random.normal(k[11], (B, len(STEMS), n)) * bed_amp
    stems_unit = jnp.stack(
        [unit_rms(bass), unit_rms(drums), unit_rms(vocals), unit_rms(other)], axis=1
    )
    stems_unit = unit_rms(stems_unit + beds)  # [B, 4, n]

    u_db = jax.random.uniform(
        k[10], (B, len(STEMS)), minval=PRESENT_DB[0], maxval=PRESENT_DB[1]
    )
    if level_shift_db is not None:
        # shared global shift folds into the OBSERVED levels; rides below use
        # level differences, so targets are unaffected by construction
        u_db = u_db + u(k[13], level_shift_db[0], level_shift_db[1])
    presented = stems_unit * (10.0 ** (u_db / 20.0))[..., None]

    targets = engineer_targets_db(u_db)  # [B, 4]
    gains = 10.0 ** ((targets - u_db) / 20.0)
    mix = jnp.sum(presented * gains[..., None], axis=1)  # [B, n]
    if mix_bus_kind is not None:
        mix = mix_bus(mix, sr, mix_bus_kind)

    if n_win < n:
        # random n_win-sample window of the context, per item
        off = jax.random.randint(k[12], (B,), 0, n - n_win + 1)
        presented = jax.vmap(
            lambda x, o: jax.lax.dynamic_slice_in_dim(x, o, n_win, axis=-1)
        )(presented, off)
        mix = jax.vmap(
            lambda x, o: jax.lax.dynamic_slice_in_dim(x, o, n_win, axis=-1)
        )(mix, off)

    if return_gains:
        g_scalar = (targets - u_db) / 10.0  # model-scalar domain, see docstring
        return (
            presented.astype(jnp.float32),
            mix.astype(jnp.float32),
            g_scalar.astype(jnp.float32),
        )
    return presented.astype(jnp.float32), mix.astype(jnp.float32)


# --------------------------------------------------------------------------
# Host-side twin (full songs, WAV datasets)
# --------------------------------------------------------------------------


def _movavg_np(x: np.ndarray, k: int) -> np.ndarray:
    c = np.cumsum(np.pad(x, (k, 0), mode="edge"))
    return (c[k:] - c[:-k]) / k


def make_synth_song(
    seed: int, duration_s: float = 30.0, sr: int = 44100, bus: Optional[str] = None
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], Dict[str, float]]:
    """One full synthetic song.

    :param bus: apply :func:`mix_bus` processing of this kind to
        ``engineer['mix']`` (the stems stay clean) — the non-ideal-bus song
        family.  None (default) keeps the exact gain-sum mix.
    :return: ``(presented, engineer, gains)`` — presented raw-session stems
        (mono ``[n]`` float32), the engineer-scaled stems (same keys), and the
        per-stem engineer amplitude gains.  ``engineer['mix']`` /
        ``presented['mix']`` hold the respective stem sums.
    """
    rng = np.random.default_rng(seed)
    n = int(round(duration_s * sr))
    t = np.arange(n, dtype=np.float64) / sr
    two_pi = 2.0 * np.pi

    bass = np.sin(two_pi * rng.uniform(50, 120) * t + rng.uniform(0, two_pi)) * (
        1.0 + 0.3 * np.sin(two_pi * rng.uniform(0.1, 0.5) * t)
    )

    period = rng.uniform(0.3, 0.7)
    decay = rng.uniform(8.0, 20.0)
    phase = np.mod(t / period + rng.uniform(0, 1), 1.0)
    env = np.exp(-phase * decay)
    drums = rng.standard_normal(n) * env + 0.7 * np.sin(
        two_pi * 60.0 * t + rng.uniform(0, two_pi)
    ) * env * env

    vib = 3.0 * np.sin(two_pi * 5.5 * t)
    envv = 0.55 + 0.45 * np.sin(two_pi * rng.uniform(0.2, 0.6) * t + rng.uniform(0, two_pi))
    vocals = np.sin(two_pi * rng.uniform(200, 500) * t + vib) * envv

    onoise = rng.standard_normal(n)
    other = _movavg_np(onoise, 8) - _movavg_np(onoise, 64)

    def unit_rms(x):
        return x / (np.sqrt(np.mean(x * x)) + 1e-8)

    bed_amp = 10.0 ** (NOISE_BED_DB / 20.0)
    stems_unit = {
        s: unit_rms(unit_rms(x) + rng.standard_normal(n) * bed_amp)
        for s, x in zip(STEMS, (bass, drums, vocals, other))
    }
    u_db = rng.uniform(PRESENT_DB[0], PRESENT_DB[1], size=len(STEMS))
    presented = {
        s: (stems_unit[s] * 10.0 ** (u_db[i] / 20.0)).astype(np.float32)
        for i, s in enumerate(STEMS)
    }
    targets = engineer_targets_db(u_db)
    gains = {s: float(10.0 ** ((targets[i] - u_db[i]) / 20.0)) for i, s in enumerate(STEMS)}
    engineer = {s: (presented[s] * gains[s]).astype(np.float32) for s in STEMS}

    presented["mix"] = np.sum([presented[s] for s in STEMS], axis=0).astype(np.float32)
    engineer["mix"] = np.sum([engineer[s] for s in STEMS], axis=0).astype(np.float32)
    if bus is not None:
        engineer["mix"] = mix_bus(engineer["mix"], sr, bus).astype(np.float32)

    # PCM16 headroom: a single shared scale keeps every relative relationship
    # (and the evaluator's relative-loudness metric) intact
    peak = max(
        float(np.max(np.abs(presented[k2]))) for k2 in presented
    )
    peak = max(peak, max(float(np.max(np.abs(engineer[k2]))) for k2 in engineer))
    if peak > 0.99:
        c = 0.99 / peak
        presented = {k2: (v * c).astype(np.float32) for k2, v in presented.items()}
        engineer = {k2: (v * c).astype(np.float32) for k2, v in engineer.items()}
    return presented, engineer, gains


def synth_songlist(prefix: str, count: int) -> list:
    return [f"{prefix}{i:03d}" for i in range(count)]


def write_synth_dataset(
    root: str,
    n_train: int = 16,
    n_test: int = 8,
    duration_s: float = 30.0,
    sr: int = 44100,
    seed: int = 0,
    train_raw: bool = False,
    bus: Optional[str] = None,
) -> Dict[str, list]:
    """Materialise a synthetic corpus in the MUSDB18 layout:

    * ``train/{song}/{stem}.wav``              — engineer-scaled train stems
      (what "professionally mixed multitracks" look like; the mean-loudness
      scan for the loudnorm baseline runs over these),
    * ``test/{song}/{stem}.wav``               — presented raw-session stems,
    * ``manual_gain_mixes/{song}/{stem}.wav``  — engineer-scaled test stems
      (the evaluation reference, reference evaluation.py:90-97 layout).

    ``train_raw=True`` writes the TRAINING split in the reference's actual
    supervision layout instead (reference model_trainer.py:25-44: raw session
    stems in, the engineer's finished mix as the target): ``train/{song}/
    {stem}.wav`` = presented raw-session stems, ``train/{song}/mixture.wav``
    = the engineer's mix.  This is the corpus the host file-corpus training
    path (``python -m tpumix train``) consumes to learn non-trivial gains.

    ``bus`` applies :func:`mix_bus` processing to every engineer mix (the
    non-ideal-bus corpus family).

    Returns ``{"train": [...], "test": [...]}`` songlists.
    """
    from tpumix.data import wavio

    train_songs = synth_songlist("synth_train_", n_train)
    test_songs = synth_songlist("synth_test_", n_test)

    def dump(dirpath: str, tracks: Dict[str, np.ndarray], mix=None) -> None:
        os.makedirs(dirpath, exist_ok=True)
        for stem in STEMS:
            wavio.write(os.path.join(dirpath, f"{stem}.wav"), tracks[stem], sr)
        wavio.write(
            os.path.join(dirpath, "mixture.wav"),
            tracks["mix"] if mix is None else mix,
            sr,
        )

    for i, song in enumerate(train_songs):
        presented, engineer, _ = make_synth_song(seed + i, duration_s, sr, bus=bus)
        if train_raw:
            dump(os.path.join(root, "train", song), presented, mix=engineer["mix"])
        else:
            dump(os.path.join(root, "train", song), engineer)
    for i, song in enumerate(test_songs):
        presented, engineer, _ = make_synth_song(seed + 10_000 + i, duration_s, sr, bus=bus)
        dump(os.path.join(root, "test", song), presented)
        dump(os.path.join(root, "manual_gain_mixes", song), engineer)
    return {"train": train_songs, "test": test_songs}
