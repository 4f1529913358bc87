"""Shipped artifacts: trained inference checkpoints (compact npz format,
tpumix/models/convert.py save_npz/load_npz).

The reference ships NO weights — its checkpoint paths point at the author's
workstation (reference inference_utils.py:156, evaluation.py:196-199), so a
fresh clone cannot mix anything.  tpumix ships a working mixer:

``scalar2sL_synth.npz`` — MixingModelScalar2sL trained on the synthetic
mixing task (tpumix/data/synthetic.py; gain-label objective, cosine LR,
BN momentum 0.99, no dropout, context_mult=4, level-shift augmentation).
Held-out LoudnessEvaluator record (8 x 90 s synthetic songs,
docs/results/synthetic_eval/): mean relative-loudness error **0.17** vs
sum 1.74 / random 2.92 / loudnorm 0.61 — the repo's analogue of the
reference's 2.1715 record on MUSDB18 (reference evaluation.py:197-198).

``scalar1sL_synth.npz`` — the low-latency companion (MixingModelScalar1sL,
1 s chunks: half the streaming latency), same recipe; held-out record
**0.16** on the same sweep (docs/results/synthetic_eval/stats_scalar1sL.csv).

``scalar2s_synth.npz`` — the EXACT reference architecture
(MixingModelScalar2s, no tpumix extensions; reference model_scalar_2s.py),
same recipe; held-out record **0.24**
(docs/results/synthetic_eval/stats_scalar2s.csv).  Demonstrates that the
reference's own parity model trains to a baseline-beating mixer under the
label-supervised objective — the level-aware variants converge faster and
score better (0.17/0.16) but are not required.

``scalar2s_lstsq_selfsup.npz`` — the parity architecture trained
SELF-SUPERVISED, round 3: no generator labels; supervision is the
closed-form per-item gain projection computed from the (stems, mix) pair
inside the train step (``loss="lstsq"``, tpumix/train/state.py — the only
supervision the reference's corpora offer, cf. reference
model_trainer.py:25-44).  Held-out record **0.14 LU** — the repo's best,
beating the gain-label artifacts and every baseline
(docs/results/synthetic_eval/stats_scalar2s_lstsq.csv).  The reference's own
magnitude-MSE objective measured NON-identifiable on this family: a
roundtrip-trained parity model scored 7.11 (worse than the naive sum;
stats_scalar2s_roundtrip.csv) and the level-aware variant 3.34
(stats_scalar2sL_roundtrip.csv) — see SELF_SUPERVISED_LOSSES in
tpumix/train/state.py for the measured analysis.

``resnet18_synth.npz`` — the third model family: GainResNet (ResNet-18
trunk + 4-gain head, reference models/model_resnet.py:59-126) trained on
the synthetic task (gain-label objective).  Held-out record **0.17 LU**
(docs/results/synthetic_eval/stats_resnet18.csv) — completes the model
matrix; the reference never checkpointed its ResNet.

All names resolve directly at the CLI, e.g.
``python -m tpumix mix --model resnet18 --checkpoint resnet18_synth ...``.

Reproduce with::

    python -m tpumix train-synth --model scalar2sL --loss gain \\
        --epochs 100 --steps-per-epoch 50 --batch-size 48 --seed 0 \\
        --keep-checkpoints 3 --patience 100 --run-name repro
    python -m tpumix export-checkpoint --checkpoint <best epoch dir> --out repro.npz
    python -m tpumix synth-data --out /tmp/corpus --duration 90
    python -m tpumix mean-loudness --data /tmp/corpus/train \\
        --songlist /tmp/corpus/train_songlist.txt --layout musdb18 --out ml.json
    python -m tpumix evaluate --data /tmp/corpus --layout musdb18 \\
        --songlist /tmp/corpus/test_songlist.txt --model scalar2sL \\
        --checkpoint repro.npz --mean-loudness ml.json --out results
"""

from __future__ import annotations

import os

_DIR = os.path.dirname(os.path.abspath(__file__))


def checkpoint_path(name: str = "scalar2sL_synth") -> str:
    """Absolute path of a shipped checkpoint (without the .npz suffix)."""
    path = os.path.join(_DIR, "checkpoints", f"{name}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no shipped checkpoint {name!r} at {path}")
    return path


def load_checkpoint(name: str = "scalar2sL_synth"):
    """Shipped checkpoint -> Flax ``variables`` dict (params + batch_stats)."""
    from tpumix.models.convert import load_npz

    return load_npz(checkpoint_path(name))
