"""STFT -> dB-magnitude feature frontend, TPU-first.

Contract parity with the reference frontend (reference data/dataset.py:132-162):

    spectrum  = torch.stft(x, n_fft=2048, hop_length=H, window=hann(2048),
                           return_complex=True)           # center=True, reflect pad
    features  = 20 * log10(max(|spectrum|, 1e-5))          # amplitude_to_DB,
                                                           # multiplier=20, amin=1e-5,
                                                           # db_multiplier=0
    # output shape [n_fft//2+1, 1 + len(x)//H]  == [1025, frames]

Interchangeable implementations behind one signature:

* ``implementation="fft"``    — framing (strided gather) + jnp.fft.rfft.  XLA's
  native FFT; the default and the conformance oracle for the other two.
* ``implementation="matmul"`` — real DFT as one matmul against a precomputed
  windowed [n_fft, 2*bins] cos/sin basis.  ~n/log n more FLOPs than FFT but the
  FLOPs land on the MXU (128x128 systolic array), which is the right trade on
  TPU for n_fft=2048 (cf. PAPERS.md: GEMM-native NDFT / nnAudio pattern).
* ``implementation="ct"``     — one Cooley-Tukey factorization step of the
  matmul DFT (n_fft = 16 phases x 128): a batched per-phase matmul, a complex
  twiddle, and a tiny output matmul — ~12x fewer real MACs than "matmul"
  while still MXU-native (see :func:`_stft_mag_ct`).
* ``implementation="pallas"`` — fused Pallas kernel: frame construction from the
  padded waveform inside VMEM (never materialising the 2x-redundant frame
  matrix in HBM), DFT matmul, magnitude and log fused in one pass
  (tpumix/ops/stft_pallas.py).
* ``implementation="ct_pallas"`` — fused decimation-in-time factorized kernel
  (tpumix/ops/stft_ct_pallas.py): the "ct" math with every stage intermediate
  in VMEM; needs an XLA phase-frame prebuild.
* ``implementation="dif_pallas"`` — fused decimation-in-FREQUENCY factorized
  kernel (tpumix/ops/stft_dif_pallas.py): frame-contiguous blocks need no
  prebuild at all — the measured TPU winner and the ``"auto"`` default there.

All entry points accept arbitrary leading batch dims and operate over the last
(sample) axis; everything is jit/vmap/shard_map-compatible (static shapes, no
data-dependent control flow).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpumix.config import FrontendConfig

_LOG10_INV = 1.0 / math.log(10.0)


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (torch.hann_window default periodic=True):
    ``0.5 - 0.5*cos(2*pi*k/n)``."""
    k = np.arange(n)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return jnp.asarray(w, dtype=dtype)


def _pad_center(x: jax.Array, n_fft: int, pad_mode: str) -> jax.Array:
    pad = n_fft // 2
    pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, pad_width, mode=pad_mode)


def frame_signal(
    x: jax.Array, n_fft: int, hop_length: int, *, center: bool = True, pad_mode: str = "reflect"
) -> jax.Array:
    """Slice ``x[..., S]`` into overlapping frames ``[..., frames, n_fft]``.

    center=True reflect-pads n_fft//2 on both sides and yields
    ``1 + S // hop`` frames (torch.stft semantics).
    """
    if center:
        x = _pad_center(x, n_fft, pad_mode)
        num_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    else:
        num_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    starts = jnp.arange(num_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def amplitude_to_db(
    mag: jax.Array, amin: float = 1e-5, multiplier: float = 20.0, db_multiplier: float = 0.0
) -> jax.Array:
    """torchaudio.functional.amplitude_to_DB with top_db=None:
    ``multiplier * log10(max(mag, amin)) - multiplier * db_multiplier``."""
    x = jnp.maximum(mag, amin)
    out = multiplier * jnp.log(x) * _LOG10_INV
    if db_multiplier != 0.0:
        out = out - multiplier * db_multiplier
    return out


@functools.lru_cache(maxsize=8)
def _dft_bases_np(n_fft: int, windowed: bool = True) -> np.ndarray:
    """Precomputed real-DFT basis ``[n_fft, 2*bins]`` with the Hann window
    folded in: columns ``[cos | -sin]`` so that
    ``frames @ basis = [real | imag]`` of the onesided DFT.

    float64 accumulation at build time, cast to float32 — keeps the matmul
    path within ~1e-4 dB of the FFT path.
    """
    bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # [n_fft, 2*bins]
    if windowed:
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft)
        basis = basis * w[:, None]
    return basis.astype(np.float32)


def dft_bases(n_fft: int, windowed: bool = True) -> jax.Array:
    return jnp.asarray(_dft_bases_np(n_fft, windowed))


_CT_N1 = 16  # phase count for the factorized DFT (2048 = 16 x 128)


def ct_applicable(cfg: FrontendConfig) -> bool:
    """The factorized path needs reshape-only framing (``n_fft % hop == 0``)
    and phase decimation that lands on whole rows (``hop % N1 == 0``)."""
    return (
        cfg.n_fft % cfg.hop_length == 0
        and cfg.hop_length % _CT_N1 == 0
        and cfg.n_fft % _CT_N1 == 0
        and cfg.center
    )


@functools.lru_cache(maxsize=8)
def _ct_bases_np(n_fft: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Factor bases for the Cooley-Tukey real DFT (all float64 -> float32).

    With ``n = N1*n2 + n1`` and ``k = N2*k1 + k2`` (N1 phases, N2 = n_fft/N1):

        X[N2*k1 + k2] = sum_n1 W_N1^(n1*k1) * W_N^(n1*k2)
                        * sum_n2 w[N1*n2 + n1] * x[N1*n2 + n1] * W_N2^(n2*k2)

    so the windowed length-``n_fft`` DFT becomes a per-phase length-``N2``
    DFT (one batched MXU matmul, contraction N2=128), a complex twiddle
    (elementwise), and a length-``N1`` output DFT (one tiny matmul,
    contraction 2*N1).  Real MACs per frame drop ~12x vs the direct
    ``[n_fft, 2*bins]`` basis (340K vs 4.2M at n_fft=2048).

    Returns ``(basis1[N1, N2, 2*K2u], tw_re[N1, N2], tw_im[N1, N2],
    basis3[2*N1, 2*K1u])`` where K2u = N2//2+1 unique inner bins and
    K1u = N1//2+1 outer bins (k = N2*k1 + k2 <= n_fft//2 needs k1 <= N1/2).
    """
    n1v, n2v = _CT_N1, n_fft // _CT_N1
    k2u = n2v // 2 + 1
    k1u = n1v // 2 + 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft, dtype=np.float64) / n_fft)
    n2 = np.arange(n2v, dtype=np.float64)
    k2 = np.arange(k2u, dtype=np.float64)
    ang1 = 2.0 * np.pi * n2[:, None] * k2[None, :] / n2v  # [N2, K2u]
    # window folded per phase: w[N1*n2 + n1] varies with both factors
    wp = w.reshape(n2v, n1v).T  # [N1, N2]
    basis1 = np.concatenate(
        [
            wp[:, :, None] * np.cos(ang1)[None],
            wp[:, :, None] * -np.sin(ang1)[None],
        ],
        axis=-1,
    )  # [N1, N2, 2*K2u] -> frames_ph @ basis1 = [re | im]

    p = np.arange(n1v, dtype=np.float64)
    k2f = np.arange(n2v, dtype=np.float64)
    angt = 2.0 * np.pi * p[:, None] * k2f[None, :] / n_fft  # W_N^(n1*k2)
    tw_re, tw_im = np.cos(angt), -np.sin(angt)

    k1 = np.arange(k1u, dtype=np.float64)
    ang3 = 2.0 * np.pi * p[:, None] * k1[None, :] / n1v  # [N1, K1u]
    c3, s3 = np.cos(ang3), np.sin(ang3)  # W_N1^(n1*k1) = c3 - i*s3
    # rows: q = p carries re2, q = N1+p carries im2; cols: [Xre | Xim]
    basis3 = np.block([[c3, -s3], [s3, c3]])  # [2*N1, 2*K1u]
    return (
        basis1.astype(np.float32),
        tw_re.astype(np.float32),
        tw_im.astype(np.float32),
        basis3.astype(np.float32),
    )


def ct_phase_frames(x: jax.Array, cfg: FrontendConfig):
    """Phase-decimated frame tensor shared by the XLA ``ct`` path and the
    fused ``ct_pallas`` kernel (they must frame identically — a pad_mode or
    indexing fix here reaches both).

    ``xph[b, p, m] = padded_x[b, N1*m + p]``; within phase ``p``, frame ``t``
    spans phase-samples ``[t*hop_ph, t*hop_ph + N2)`` — with rows of
    ``hop_ph`` samples that is rows ``t..t+r-1`` concatenated
    (``n2 = j*hop_ph + s <-> row t+j, position s``, ``r = n2v // hop_ph``).

    :return: ``(frames_ph [B, N1, T, N2] f32, lead shape tuple, T)``.
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    n1v = _CT_N1
    hop_ph = hop // n1v
    r = n_fft // hop
    n2v = n_fft // n1v

    lead = x.shape[:-1]
    S = x.shape[-1]
    T = 1 + S // hop
    B = int(np.prod(lead)) if lead else 1
    xb = x.reshape(B, S).astype(jnp.float32)
    xp = _pad_center(xb, n_fft, cfg.pad_mode)[:, : (T + r - 1) * hop]
    xph = xp.reshape(B, (T + r - 1) * hop // n1v, n1v).transpose(0, 2, 1)
    rows = xph.reshape(B, n1v, T + r - 1, hop_ph)
    segs = [rows[:, :, j : j + T] for j in range(r)]
    frames_ph = jnp.stack(segs, axis=3).reshape(B, n1v, T, n2v)
    return frames_ph, lead, T


def _stft_mag_ct(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Cooley-Tukey factorized real DFT (``implementation="ct"``).

    Same contract as the other implementations ([..., frames, bins]
    magnitude) at ~1/12 the MXU work of the direct-matmul/Pallas bases; the
    framing is reshape + static slices (no gather, no [T, n_fft] frame
    matrix in HBM — the largest intermediate is the phase-frame tensor,
    identical bytes to the frame matrix but consumed by one batched matmul).
    Numerically *tighter* than the direct basis: each bin sums N2+N1 terms
    instead of n_fft.
    """
    if not ct_applicable(cfg):
        return _stft_mag_matmul(x, cfg)
    n_fft = cfg.n_fft
    n1v, n2v = _CT_N1, n_fft // _CT_N1
    k2u = n2v // 2 + 1
    k1u = n1v // 2 + 1

    frames_ph, lead, T = ct_phase_frames(x, cfg)
    B = frames_ph.shape[0]

    b1, tw_re, tw_im, b3 = (jnp.asarray(a) for a in _ct_bases_np(n_fft))
    a = jnp.einsum(
        "bptn,pnk->bptk",
        frames_ph,
        b1,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, N1, T, 2*K2u]
    re, im = a[..., :k2u], a[..., k2u:]
    # conjugate-symmetric expansion of the real inner DFT to all N2 bins
    re_f = jnp.concatenate([re, re[..., 1 : n2v - k2u + 1][..., ::-1]], axis=-1)
    im_f = jnp.concatenate([im, -im[..., 1 : n2v - k2u + 1][..., ::-1]], axis=-1)
    re2 = re_f * tw_re[:, None, :] - im_f * tw_im[:, None, :]
    im2 = re_f * tw_im[:, None, :] + im_f * tw_re[:, None, :]
    z = jnp.concatenate(
        [jnp.moveaxis(re2, 1, -1), jnp.moveaxis(im2, 1, -1)], axis=-1
    )  # [B, T, N2, 2*N1]
    xo = jnp.einsum(
        "btkq,ql->btkl",
        z,
        b3,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, T, N2, 2*K1u]
    xre, xim = xo[..., :k1u], xo[..., k1u:]
    mag2 = xre * xre + xim * xim  # [B, T, N2, K1u]
    # k = N2*k1 + k2: k1-major flatten, then keep the onesided bins
    mag2 = jnp.moveaxis(mag2, -1, -2).reshape(B, T, k1u * n2v)[..., : cfg.num_bins]
    return jnp.sqrt(mag2).reshape(*lead, T, cfg.num_bins)


def _stft_mag_fft(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length, center=cfg.center, pad_mode=cfg.pad_mode)
    frames = frames * hann_window(cfg.n_fft, dtype=frames.dtype)
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., frames, bins]
    return jnp.abs(spec)


def _stft_mag_matmul(x: jax.Array, cfg: FrontendConfig) -> jax.Array:
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length, center=cfg.center, pad_mode=cfg.pad_mode)
    basis = dft_bases(cfg.n_fft)
    # HIGHEST: f32-equivalent MXU passes — the default single bf16 pass loses
    # ~8 mantissa bits, which in the dB epilogue blows up to tens of dB of
    # error in quiet bins (measured 62 dB max on real TPU)
    ri = jnp.dot(
        frames,
        basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [..., frames, 2*bins]
    bins = cfg.num_bins
    re, im = ri[..., :bins], ri[..., bins:]
    return jnp.sqrt(re * re + im * im)


def stft_magnitude(x: jax.Array, cfg: Optional[FrontendConfig] = None) -> jax.Array:
    """Magnitude spectrogram ``[..., frames, bins]`` (time-major internal layout).

    Note: the fused Pallas implementations compute dB directly, so this
    adapter recovers magnitude as ``10**(dB/mult)`` — bins quieter than
    ``cfg.amin`` return exactly ``amin`` (the dB contract's clamp) instead of
    their true sub-amin value.  Identical after :func:`amplitude_to_db`,
    which is the only consumer on the hot path; use ``implementation="fft"``
    if unclamped linear magnitudes matter."""
    cfg = cfg or FrontendConfig()
    impl = cfg.resolved_implementation()
    if impl == "matmul":
        return _stft_mag_matmul(x, cfg)
    if impl == "ct":
        return _stft_mag_ct(x, cfg)
    if impl == "pallas":
        from tpumix.ops.stft_pallas import stft_magnitude_pallas

        return stft_magnitude_pallas(x, cfg)
    if impl == "ct_pallas":
        from tpumix.ops.stft_ct_pallas import stft_features_ct_pallas_tm

        db = stft_features_ct_pallas_tm(x, cfg)
        return jnp.exp(db * (math.log(10.0) / cfg.db_multiplier))
    if impl == "dif_pallas":
        from tpumix.ops.stft_dif_pallas import stft_features_dif_pallas_tm

        db = stft_features_dif_pallas_tm(x, cfg)
        return jnp.exp(db * (math.log(10.0) / cfg.db_multiplier))
    return _stft_mag_fft(x, cfg)


def spectrogram_features(x: jax.Array, cfg: Optional[FrontendConfig] = None) -> jax.Array:
    """Full frontend: waveform ``[..., S]`` -> dB features ``[..., bins, frames]``.

    Output layout matches the reference contract [1025, T]
    (reference data/dataset.py:162 returns [freq, frames]).
    """
    cfg = cfg or FrontendConfig()
    impl = cfg.resolved_implementation()
    if impl == "pallas":
        from tpumix.ops.stft_pallas import stft_features_pallas_tm

        return jnp.swapaxes(stft_features_pallas_tm(x, cfg), -1, -2)
    if impl == "ct_pallas":
        from tpumix.ops.stft_ct_pallas import stft_features_ct_pallas_tm

        return jnp.swapaxes(stft_features_ct_pallas_tm(x, cfg), -1, -2)
    if impl == "dif_pallas":
        from tpumix.ops.stft_dif_pallas import stft_features_dif_pallas_tm

        return jnp.swapaxes(stft_features_dif_pallas_tm(x, cfg), -1, -2)
    mag = stft_magnitude(x, cfg)  # [..., frames, bins]
    db = amplitude_to_db(mag, amin=cfg.amin, multiplier=cfg.db_multiplier)
    return jnp.swapaxes(db, -1, -2)


def spectrogram_features_np(x: np.ndarray, cfg: Optional[FrontendConfig] = None) -> np.ndarray:
    """Pure-numpy host-side mirror of :func:`spectrogram_features` — used as
    the conformance oracle and by host tooling that must not touch the device
    (CPU baseline benchmark, dataset parity API).  Output ``[bins, frames]``."""
    cfg = cfg or FrontendConfig()
    x = np.asarray(x, dtype=np.float32)
    pad = cfg.n_fft // 2
    if cfg.center:
        xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=cfg.pad_mode)
    else:
        xp = x
    num_frames = 1 + (xp.shape[-1] - cfg.n_fft) // cfg.hop_length
    strides = xp.strides[:-1] + (cfg.hop_length * xp.strides[-1], xp.strides[-1])
    frames = np.lib.stride_tricks.as_strided(
        xp, shape=xp.shape[:-1] + (num_frames, cfg.n_fft), strides=strides
    )
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft)).astype(np.float32)
    spec = np.fft.rfft(frames * w, axis=-1)
    mag = np.abs(spec).astype(np.float32)
    db = cfg.db_multiplier * np.log10(np.maximum(mag, cfg.amin))
    return np.swapaxes(db, -1, -2)


def spectrogram_features_tm(x: jax.Array, cfg: Optional[FrontendConfig] = None) -> jax.Array:
    """Frontend in time-major layout ``[..., frames, bins]`` — the TPU-friendly
    internal layout (frames on sublanes, bins on lanes) used by the batched
    mixer; avoids a transpose before NHWC convs."""
    cfg = cfg or FrontendConfig()
    impl = cfg.resolved_implementation()
    if impl == "pallas":
        from tpumix.ops.stft_pallas import stft_features_pallas_tm

        return stft_features_pallas_tm(x, cfg)
    if impl == "ct_pallas":
        from tpumix.ops.stft_ct_pallas import stft_features_ct_pallas_tm

        return stft_features_ct_pallas_tm(x, cfg)
    if impl == "dif_pallas":
        from tpumix.ops.stft_dif_pallas import stft_features_dif_pallas_tm

        return stft_features_dif_pallas_tm(x, cfg)
    mag = stft_magnitude(x, cfg)
    return amplitude_to_db(mag, amin=cfg.amin, multiplier=cfg.db_multiplier)
