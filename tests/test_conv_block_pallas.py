"""Experimental fused conv-block Pallas kernel (interpreter-mode semantics
only — the compiled kernel currently faults on real TPUs and is gated off;
see tpumix/ops/conv_block_pallas.py STATUS)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.ops.conv_block_pallas import conv_block_fused, fold_batchnorm


def _ref_block(x, w, bias, gamma, beta, mean, var, eps=1e-3):
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    return jnp.maximum((conv - mean) * gamma * jax.lax.rsqrt(var + eps) + beta, 0.0)


class TestFusedConvBlock:
    @pytest.mark.parametrize("xs,ws", [
        ((2, 40, 30, 16), (5, 5, 16, 32)),
        ((1, 25, 20, 8), (3, 7, 8, 24)),
        ((1, 33, 21, 64), (9, 9, 64, 128)),  # conv5 family, uneven tiles
    ])
    def test_matches_conv_bn_relu(self, xs, ws):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.float32)
        Cout = ws[-1]
        bias = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
        gamma = jnp.asarray(rng.uniform(0.5, 1.5, Cout), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
        mean = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 2.0, Cout), jnp.float32)
        s, t = fold_batchnorm(bias, gamma, beta, mean, var, 1e-3)
        got = conv_block_fused(x, w, s, t)
        ref = _ref_block(x, w, bias, gamma, beta, mean, var)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_fold_identity(self):
        # gamma=1, beta=mean=0, var=1 -> s≈1, t=bias
        s, t = fold_batchnorm(
            jnp.full((4,), 0.5), jnp.ones(4), jnp.zeros(4), jnp.zeros(4), jnp.ones(4), 0.0
        )
        np.testing.assert_allclose(s, np.ones(4), rtol=1e-6)
        np.testing.assert_allclose(t, np.full(4, 0.5), rtol=1e-6)

    def test_refuses_real_tpu_without_optin(self, monkeypatch):
        import tpumix.ops.conv_block_pallas as m

        monkeypatch.setattr("tpumix.utils.backend.is_tpu_backend", lambda *a: True)
        monkeypatch.delenv("TPUMIX_EXPERIMENTAL_PALLAS_CONV", raising=False)
        x = jnp.zeros((1, 10, 10, 8), jnp.float32)
        w = jnp.zeros((3, 3, 8, 16), jnp.float32)
        with pytest.raises(NotImplementedError):
            m.conv_block_fused(x, w, jnp.ones(16), jnp.zeros(16))
