"""Fused Pallas frontend conformance (interpreter mode on the CPU backend;
the same kernel compiles via Mosaic on TPU — exercised by bench.py and the
TPU smoke script)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.config import FrontendConfig
from tpumix.ops.stft import spectrogram_features_tm
from tpumix.ops.stft_pallas import (
    stft_features_pallas_tm,
    stft_features_tm_hybrid,
)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    x = 0.3 * rng.standard_normal((2, 4, 44100)).astype(np.float32)
    return x


@pytest.mark.parametrize("hop", [512, 1024])
def test_matches_jnp_frontend(audio, hop):
    # 44100 % hop != 0 -> trim to a hop multiple (the mixer always passes
    # hop-aligned chunk lengths)
    C = (44100 // hop) * hop
    x = jnp.asarray(audio[..., :C])
    cfg = FrontendConfig(hop_length=hop)
    ours = np.asarray(stft_features_pallas_tm(x, cfg))
    ref = np.asarray(spectrogram_features_tm(x, cfg))
    assert ours.shape == ref.shape == (2, 4, 1 + C // hop, 1025)
    d = np.abs(ours - ref)
    assert np.mean(d) < 1e-4
    assert np.quantile(d, 0.999) < 5e-3
    loud = ref > -40.0
    assert np.max(d[loud]) < 2e-2


def test_odd_hop_rejected():
    cfg = FrontendConfig(hop_length=500)  # 2048 % 500 != 0
    with pytest.raises(ValueError):
        stft_features_pallas_tm(jnp.zeros((1, 1000)), cfg)


def test_unaligned_chunk_length(audio):
    # 88200 % 512 != 0 (the 2 s production chunk): must still match torch
    # frame semantics T = 1 + C // hop
    cfg = FrontendConfig(hop_length=512)
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.3 * rng.standard_normal((4, 88200)).astype(np.float32))
    ours = np.asarray(stft_features_pallas_tm(x, cfg))
    ref = np.asarray(spectrogram_features_tm(x, cfg))
    assert ours.shape == ref.shape == (4, 173, 1025)
    d = np.abs(ours - ref)
    assert np.mean(d) < 1e-4 and np.quantile(d, 0.999) < 5e-3


def test_hybrid_gradients_flow(audio):
    cfg = FrontendConfig(hop_length=512)
    C = 4096
    x = jnp.asarray(audio[0, 0, :C])

    def loss(xx):
        return jnp.sum(stft_features_tm_hybrid(xx, cfg) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))

    # gradient direction matches the pure-jnp frontend's gradient
    from tpumix.ops.stft import spectrogram_features_tm as tm

    def loss_jnp(xx):
        return jnp.sum(tm(xx, cfg) ** 2)

    gj = jax.grad(loss_jnp)(x)
    cos_sim = float(
        jnp.sum(g * gj) / (jnp.linalg.norm(g) * jnp.linalg.norm(gj) + 1e-9)
    )
    assert cos_sim > 0.999


def test_single_signal_shape():
    cfg = FrontendConfig(hop_length=1024)
    x = jnp.zeros(2048 * 4)
    out = stft_features_pallas_tm(x, cfg)
    assert out.shape == (1 + 8192 // 1024, 1025)
    # silence clamps to the amin floor: 20*log10(1e-5) = -100
    np.testing.assert_allclose(np.asarray(out), -100.0, atol=1e-3)


def test_hybrid_backward_never_reenters_pallas(monkeypatch):
    """The custom-vjp backward mirror must pin a non-pallas implementation:
    with implementation='auto' on a TPU backend it would re-resolve to the
    Pallas kernel and try to differentiate pl.pallas_call (no VJP rule)."""
    import jax
    import numpy as np

    import tpumix.ops.stft_pallas as sp
    from tpumix.config import FrontendConfig

    def boom(*a, **k):
        raise AssertionError("backward routed into the Pallas kernel")

    monkeypatch.setattr(sp, "stft_magnitude_pallas", boom)
    cfg = FrontendConfig(n_fft=256, hop_length=128, sample_rate=8000,
                         implementation="pallas")
    x = jax.numpy.asarray(
        np.random.default_rng(0).standard_normal(2048).astype(np.float32)
    )
    out, vjp = jax.vjp(lambda xx: sp._tm_jnp(xx, cfg), x)
    (g,) = vjp(jax.numpy.ones_like(out))
    assert np.all(np.isfinite(np.asarray(g)))
