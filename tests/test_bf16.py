"""bf16 compute-dtype path: training-step health and forward agreement.

Round-3 measured bf16 end to end (docs/PERF.md): no inference gain at the
khgemm roofline, but a ~1.13x TRAINING step win (lax.conv fwd+bwd at batch
48 x 2 s: 150.7 -> 133.5 ms/step pipelined) — so the supported configuration
is ``compute_dtype="bfloat16"`` for training.  These tests pin the contract
that makes it safe: parameters, optimizer state, and BN statistics stay
float32 (bf16 is a compute dtype, not a storage dtype — checkpoints
interchange freely with f32 runs), the fused train step stays finite, and
the forward deviates from f32 only within the bf16 mantissa floor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumix.config import FrontendConfig, ModelConfig
from tpumix.models.registry import build_model
from tpumix.train.state import adam_with_l2, create_train_state, make_train_step

TINY = FrontendConfig(n_fft=256, hop_length=128, sample_rate=8000)
CHUNK = 6400  # 0.8 s @ 8 kHz -> 51 frames, 129 bins


def _tiny_cfg(dtype: str) -> ModelConfig:
    return ModelConfig(
        name="scalar2s", compute_dtype=dtype, conv_impl="xla",
        bn_momentum=0.99, use_dropout=False,
    )


def _batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    stems = np.asarray(rng.standard_normal((b, 4, CHUNK)) * 0.1, np.float32)
    return stems, stems.sum(axis=1)


@pytest.mark.heavy
class TestBf16Training:
    def test_state_dtypes_stay_f32_and_step_is_finite(self):
        model = build_model(_tiny_cfg("bfloat16"), for_training=True)
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(
            model, jax.random.key(0), (1, 4, TINY.num_bins, TINY.num_frames(CHUNK)), tx
        )
        # bf16 is a COMPUTE dtype: everything stored must remain f32 so
        # checkpoints interchange with f32 runs (flax casts at apply time)
        for leaf in jax.tree.leaves(state.params) + jax.tree.leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32
        step = jax.jit(make_train_step(model, TINY, tx, loss="lstsq"))
        stems, mix = _batch()
        new_state, metrics = step(state, stems, mix, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        for leaf in jax.tree.leaves(new_state.params):
            assert leaf.dtype == jnp.float32
        # gradients actually flowed (params moved)
        moved = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
        )
        assert max(jax.tree.leaves(moved)) > 0.0

    def test_reference_loss_finite_too(self):
        model = build_model(_tiny_cfg("bfloat16"), for_training=True)
        tx = adam_with_l2(1e-3, 1e-5)
        state = create_train_state(
            model, jax.random.key(0), (1, 4, TINY.num_bins, TINY.num_frames(CHUNK)), tx
        )
        step = jax.jit(make_train_step(model, TINY, tx, loss="reference"))
        stems, mix = _batch(seed=3)
        _, metrics = step(state, stems, mix, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))


class TestBf16Forward:
    def test_gains_close_to_f32_on_shared_weights(self):
        """Param trees are dtype-independent, so the SAME variables drive both
        models; bf16 gains must sit within the mantissa floor of f32's."""
        from tpumix.ops.stft import spectrogram_features

        f32 = build_model(_tiny_cfg("float32"))
        b16 = build_model(_tiny_cfg("bfloat16"))
        stems, _ = _batch(b=2, seed=7)
        feats = np.asarray(spectrogram_features(jnp.asarray(stems), TINY))
        variables = f32.init(jax.random.key(0), feats, train=False)
        _, g32 = jax.jit(lambda v, x: f32.apply(v, x, train=False))(variables, feats)
        _, g16 = jax.jit(lambda v, x: b16.apply(v, x, train=False))(variables, feats)
        g32 = np.asarray(jnp.stack(g32))
        g16 = np.asarray(jnp.stack(g16))
        # registry.py: deviation ~0.4 absolute is the bf16 floor on +/-100 dB
        # inputs; anything larger means the cast landed somewhere it should not
        assert g16.dtype == np.float32  # heads emit f32 either way
        np.testing.assert_allclose(g16, g32, atol=0.5)
        assert np.max(np.abs(g16 - g32)) > 0.0  # genuinely the bf16 path


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
