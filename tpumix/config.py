"""Configuration dataclasses for the tpumix framework.

The reference codebase (apelykh/deep-audio-mixer) has no config system: every
hyperparameter is a hard-coded literal spread across notebooks and scripts
(e.g. STFT params at reference data/dataset.py:132-133, chunk lengths per
notebook, batch sizes in training.ipynb cell 6).  tpumix centralises all of it
here, which also resolves the reference's latent hop-length inconsistency:
``dataset.compute_features`` defaults to hop=1024, but the scalar models'
flattened head dims (10290 / 30807) require 87 / 173 frames, i.e. an effective
hop of **512** at their nominal 1 s / 2 s chunk lengths (see SURVEY.md §2.2).
Here every model preset pins its (chunk_length, hop) pair explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """STFT -> dB-magnitude feature frontend configuration.

    Semantics match the reference frontend (reference data/dataset.py:132-162):
    torch.stft(n_fft=2048, hop_length=1024, hann periodic window, center=True,
    reflect padding, onesided) -> abs -> amplitude_to_DB(multiplier=20,
    amin=1e-5, db_multiplier=0), i.e. ``20*log10(max(|S|, 1e-5))``.
    """

    n_fft: int = 2048
    hop_length: int = 1024
    sample_rate: int = 44100
    amin: float = 1e-5
    db_multiplier: float = 20.0
    center: bool = True
    pad_mode: str = "reflect"
    # "auto"      : best applicable fused kernel on TPU backends
    #               (dif_pallas -> ct_pallas -> pallas), "fft" elsewhere
    # "fft"       : jnp.fft.rfft based (XLA FFT)
    # "matmul"    : real-valued DFT as two matmuls against precomputed bases (MXU)
    # "ct"        : Cooley-Tukey factorized DFT matmuls at the XLA level
    # "pallas"    : fused Pallas framing+DFT+log-magnitude kernel (TPU only)
    # "ct_pallas" : fused Pallas decimation-in-TIME factorized kernel
    #               (14.1 vs 18.8 ms/segment over the naive basis)
    # "dif_pallas": fused Pallas decimation-in-FREQUENCY factorized kernel —
    #               the measured TPU winner (9.8 vs 13.8 ms/segment over
    #               ct_pallas: no phase-transpose prebuild, docs/PERF.md)
    implementation: str = "auto"

    def resolved_implementation(self) -> str:
        """Concrete implementation for the current default backend: the fused
        DIF factorized kernel is the production default on TPU (conformance
        bounds in tests/test_stft_dif_pallas.py), then the DIT factorized
        kernel (hop % 16 == 0 but hop % 128 != 0), then the naive-basis
        fused kernel (any n_fft % hop == 0), XLA FFT elsewhere."""
        if self.implementation != "auto":
            return self.implementation
        from tpumix.utils.backend import is_tpu_backend

        if is_tpu_backend():
            from tpumix.ops.stft import ct_applicable
            from tpumix.ops.stft_dif_pallas import dif_applicable

            if dif_applicable(self):
                return "dif_pallas"
            if ct_applicable(self):
                return "ct_pallas"
            if self.n_fft % self.hop_length == 0:
                return "pallas"
        return "fft"

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        """Frame count for a signal of ``num_samples`` (center=True semantics:
        ``1 + num_samples // hop_length``, as torch.stft)."""
        if not self.center:
            return 1 + (num_samples - self.n_fft) // self.hop_length
        return 1 + num_samples // self.hop_length

    def chunk_samples(self, chunk_length_s: float) -> int:
        return int(round(chunk_length_s * self.sample_rate))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Gain-prediction model configuration.

    ``name`` selects the architecture; (chunk_length_s, hop_length) pin the
    frame budget each architecture's flattened head dim requires:

    =========  ========  =====  =======  ==============
    name       chunk(s)  hop    frames   flattened dim
    =========  ========  =====  =======  ==============
    scalar1s   1         512    87       10290 = 490*21
    scalar2s   2         512    173      30807 = 489*63
    resnet18   5         1024   216      231   = 33*7
    =========  ========  =====  =======  ==============

    (Derived from reference model_scalar_1s.py:220, model_scalar_2s.py:77,
    model_resnet.py:73; see SURVEY.md §2.2.)
    """

    name: str = "scalar1s"
    chunk_length_s: float = 1.0
    hop_length: int = 512
    num_stems: int = 4
    dtype: str = "float32"  # parameter / activation dtype
    compute_dtype: str = "float32"  # conv compute dtype ("bfloat16" for MXU speed)
    # flax BatchNorm retained fraction.  0.10 = torch BatchNorm2d(momentum=
    # 0.90) parity (reference model_scalar_1s.py:151-190): running stats track
    # the last batch almost exclusively, so eval-mode outputs are noisy on
    # short runs.  Raise towards 0.99 for stable running statistics (the
    # shipped synthetic-task checkpoint trains with 0.99).
    bn_momentum: float = 0.10
    # reference parity trains with dropout p=0.2/0.3.  False disables it —
    # correct for infinite-stream (synthetic) training, where dropout's
    # variance shift miscalibrates BN running stats with nothing to
    # regularise in return
    use_dropout: bool = True
    # conv lowering: "auto" = khgemm on TPU backends, lax.conv elsewhere;
    # "xla" = lax.conv; "khgemm" = kh-unrolled GEMM that fills the 128-lane
    # MXU for the narrow 16/32/48/64-channel reference layers
    # (tpumix/ops/conv_khgemm.py) — measured 672 -> 960 audio-s/s device-
    # resident on the fused mixing pipeline (docs/PERF.md).  Numerics agree
    # to f32 reassociation; checkpoints interchange freely (identical trees)
    conv_impl: str = "auto"

    def frontend(self, base: Optional[FrontendConfig] = None) -> FrontendConfig:
        base = base or FrontendConfig()
        return dataclasses.replace(base, hop_length=self.hop_length)

    @property
    def num_frames(self) -> int:
        fe = self.frontend()
        return fe.num_frames(fe.chunk_samples(self.chunk_length_s))


def preset(name: str) -> ModelConfig:
    """Model presets with their pinned chunk/hop pairs."""
    presets = {
        "scalar1s": ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512),
        # tpumix extension: Scalar1s trunk + level-aware gain heads (the
        # low-latency streaming companion of scalar2sL)
        "scalar1sL": ModelConfig(name="scalar1sL", chunk_length_s=1.0, hop_length=512),
        "scalar2s": ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512),
        # tpumix extension: Scalar2s trunk + level-aware gain heads
        "scalar2sL": ModelConfig(name="scalar2sL", chunk_length_s=2.0, hop_length=512),
        "resnet18": ModelConfig(name="resnet18", chunk_length_s=5.0, hop_length=1024),
    }
    if name not in presets:
        raise ValueError(f"unknown model preset {name!r}; have {sorted(presets)}")
    return presets[name]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration (parity targets: reference model_trainer.py
    and training_ignite.ipynb cells 12-15)."""

    batch_size: int = 48
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5  # Adam L2 (torch-style coupled), training.ipynb cell 11
    num_epochs: int = 20
    # early-stopping patience; None resolves per-loss in the trainer
    # (train.trainer.resolve_patience): 30 for lstsq/lstsq_tail — their
    # measured mid-run val plateau outlasts the reference's 10
    # (docs/results/synthetic_eval/README.md) — else 10 (ignite
    # EarlyStopping parity, training_ignite.ipynb cell 13)
    early_stopping_patience: Optional[int] = None
    checkpoint_dir: str = "./checkpoints"
    keep_checkpoints: Optional[int] = None  # None = keep all (ignite n_saved=None)
    # keep-best-k scoring: "train" = ignite parity (-train_mse,
    # training_ignite.ipynb cell 13); "val" keeps the best validation epochs
    checkpoint_score: str = "train"
    # "constant" = reference parity (training.ipynb cell 11); "cosine" decays
    # learning_rate -> 0.01x over lr_total_steps (required for cosine)
    lr_schedule: str = "constant"
    lr_total_steps: Optional[int] = None
    seed: int = 0
    log_every_steps: int = 30  # ignite iteration logging cadence (cell 14)
    augment: bool = False
    # reference parity: augmentation re-gains ALL FIVE tracks, the mix
    # included (reference data/dataset.py:185-199).  False keeps the
    # supervision mix clean (stem-only augmentation) — REQUIRED for the
    # lstsq-family objectives under --augment: an independent mix gain is
    # unobservable from the stems, so it turns the closed-form targets into
    # irreducible common-mode noise (measured round 5: train-loss floor
    # ~0.067 scalar^2 on a file corpus; docs/TUTORIAL.md)
    augment_mix: bool = True
    # "reference":  dB-linear masked-sum MSE (parity, model_trainer.py:25-44)
    # "roundtrip":  gains supervised through the reference inference map
    #               10**(0.5 g) in the amplitude domain (tpumix extension —
    #               see tpumix.train.state._roundtrip_masked_db)
    # "coherent":   waveform-domain self-supervision — the gain-scaled stem
    #               sum must reproduce the mix (state._coherent_loss; has a
    #               documented collapse pathology, prefer lstsq)
    # "lstsq":      MSE vs closed-form per-item least-squares gain targets
    #               (state._lstsq_gain_targets) — the flagship 0.14 LU
    #               self-supervised objective; assumes a clean gain-sum bus
    # "lstsq_tail": lstsq with a data-driven comb-tail basis that absorbs
    #               mix-bus reverb (state._lstsq_tail_gain_targets) —
    #               measured 0.26 LU under a reverb bus (docs/results)
    # "lstsq_tail_cm": lstsq_tail + per-item target common mode recentered
    #               to the batch mean — additionally absorbs the
    #               level-tracking common-mode bias a bus comp/limiter
    #               injects (state._lstsq_loss recenter_cm); the
    #               recommendation for human-mixed corpora
    # "gain":       direct MSE on generator gain labels — SyntheticTrainer
    #               only (tpumix.train.state.make_gain_train_step)
    loss: str = "reference"
    # "int16": ship waveform batches as 16-bit PCM with on-device
    # dequantisation — half the host->device bytes, lossless for 16-bit
    # source material (MUSDB18-HQ / MedleyDB stems)
    transfer_dtype: str = "float32"
    mesh_shape: Tuple[int, ...] = (1,)  # data-parallel axis sizes
    mesh_axis_names: Tuple[str, ...] = ("dp",)


@dataclasses.dataclass(frozen=True)
class MixConfig:
    """Full-song mixing configuration (parity: reference
    inference_utils.py:105-145 ``mix_song_smooth``)."""

    chunk_length_s: float = 1.0
    savgol_polyorder: int = 2
    # Savitzky-Golay window = num_chunks // 4, forced odd
    # (inference_utils.py:137-139); set explicitly to override.
    savgol_window: Optional[int] = None
    # chunks per compiled device call: one fixed-shape program serves any song
    # length (segments dispatch asynchronously and pipeline with transfers)
    max_chunks: int = 64


@dataclasses.dataclass(frozen=True)
class DataConfig:
    base_path: str = ""
    layout: str = "medleydb"  # or "musdb18"
    chunk_length_s: float = 1.0
    sample_rate: int = 44100
    normalize: bool = False
    augment: bool = False
    seed: Optional[int] = None
