"""Fused decimation-in-frequency Pallas frontend (tpumix/ops/stft_dif_pallas.py)
vs the XLA FFT oracle — interpret mode on the CPU backend exercises the exact
kernel code path that compiles on TPU.  The de-interleave epilogue (bins leave
the kernel k1-interleaved) is covered by every comparison here."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.config import FrontendConfig
from tpumix.ops.stft import spectrogram_features_tm
from tpumix.ops.stft_dif_pallas import (
    dif_applicable,
    stft_features_dif_pallas_tm,
    stft_features_dif_tm_hybrid,
)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(7)
    t = np.arange(88200) / 44100.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 97 * t)
    sig += 0.05 * rng.standard_normal(t.size)
    return sig.astype(np.float32)


@pytest.mark.parametrize("hop", [512, 1024])
def test_matches_fft_oracle(audio, hop):
    cfg = FrontendConfig(hop_length=hop)
    assert dif_applicable(cfg)
    ref = np.asarray(
        spectrogram_features_tm(
            jnp.asarray(audio), FrontendConfig(hop_length=hop, implementation="fft")
        )
    )
    out = np.asarray(stft_features_dif_pallas_tm(jnp.asarray(audio), cfg))
    assert out.shape == ref.shape
    d = np.abs(out - ref)
    # each bin sums 16 + 128 terms (vs 2048 direct); max deviation lives in
    # near-amin-clamp bins (same bound family as the other frontends)
    assert d.max() < 0.1
    assert d.mean() < 1e-4
    assert np.quantile(d, 0.999) < 5e-3


def test_batched_leading_dims(audio):
    cfg = FrontendConfig(hop_length=512)
    x = jnp.asarray(np.stack([np.stack([audio, audio * 0.5])] * 3))  # [3, 2, S]
    out = stft_features_dif_pallas_tm(x, cfg)
    assert out.shape == (3, 2, 173, 1025)
    single = stft_features_dif_pallas_tm(jnp.asarray(audio * 0.5), cfg)
    np.testing.assert_allclose(np.asarray(out[1, 1]), np.asarray(single), atol=1e-5)


def test_rejects_inapplicable_config():
    with pytest.raises(ValueError):
        stft_features_dif_pallas_tm(
            jnp.zeros(22050, jnp.float32), FrontendConfig(hop_length=500)
        )
    assert not dif_applicable(FrontendConfig(hop_length=496))


def test_radix2_stage_a_matches_direct_and_oracle(audio):
    """stage_a="r2" (recursive real-input FFT16 in stage A) must agree with
    the unrolled direct DFT to f32 reassociation AND with the FFT oracle to
    the standard frontend bound — both stage-A formulations are the same
    windowed DFT."""
    cfg = FrontendConfig(hop_length=512)
    ref = np.asarray(
        spectrogram_features_tm(
            jnp.asarray(audio), FrontendConfig(hop_length=512, implementation="fft")
        )
    )
    direct = np.asarray(
        stft_features_dif_pallas_tm(jnp.asarray(audio), cfg, stage_a="direct")
    )
    r2 = np.asarray(stft_features_dif_pallas_tm(jnp.asarray(audio), cfg, stage_a="r2"))
    d = np.abs(r2 - ref)
    assert d.max() < 0.1 and d.mean() < 1e-4
    d = np.abs(r2 - direct)
    assert d.mean() < 1e-4
    assert np.quantile(d, 0.999) < 5e-3


def test_agrees_with_ct_pallas_kernel(audio):
    """DIT and DIF factorizations of the same windowed DFT must agree to f32
    reassociation."""
    from tpumix.ops.stft_ct_pallas import stft_features_ct_pallas_tm

    cfg = FrontendConfig(hop_length=512)
    a = np.asarray(stft_features_dif_pallas_tm(jnp.asarray(audio), cfg))
    b = np.asarray(stft_features_ct_pallas_tm(jnp.asarray(audio), cfg))
    d = np.abs(a - b)
    assert d.mean() < 1e-4
    assert np.quantile(d, 0.999) < 5e-3


def test_hybrid_vjp_matches_xla_gradient(audio):
    """The custom-VJP wrapper's backward (XLA mirror) must match the gradient
    of the plain FFT path — the training step consumes the kernel through it."""
    cfg = FrontendConfig(hop_length=512)
    x = jnp.asarray(audio[:4096])
    cot = jnp.ones((1 + 4096 // 512, 1025), jnp.float32)

    _, vjp_hybrid = jax.vjp(lambda v: stft_features_dif_tm_hybrid(v, cfg), x)
    fft_cfg = FrontendConfig(hop_length=512, implementation="fft")
    _, vjp_fft = jax.vjp(lambda v: spectrogram_features_tm(v, fft_cfg), x)
    g_h = np.asarray(vjp_hybrid(cot)[0])
    g_f = np.asarray(vjp_fft(cot)[0])
    np.testing.assert_allclose(g_h, g_f, rtol=1e-4, atol=1e-5)
