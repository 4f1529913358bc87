"""Fused conv-block Pallas kernel: interpreter-mode semantics vs the
lax.conv + BatchNorm-fold + ReLU oracle (the compiled kernel runs on real
TPU backends; see tpumix/ops/conv_block_pallas.py)."""

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


def _rand_block(xs, ws, seed=0):
    rng = np.random.default_rng(seed)
    Cout = ws[-1]
    return dict(
        x=jnp.asarray(rng.standard_normal(xs), jnp.float32),
        w=jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.float32),
        bias=jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32),
        gamma=jnp.asarray(rng.uniform(0.5, 1.5, Cout), jnp.float32),
        beta=jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32),
        mean=jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32),
        var=jnp.asarray(rng.uniform(0.5, 2.0, Cout), jnp.float32),
    )


class TestFusedConvBlock:
    @pytest.mark.parametrize("xs,ws", [
        ((2, 40, 30, 16), (5, 5, 16, 32)),
        ((1, 25, 20, 8), (3, 7, 8, 24)),
        ((1, 33, 21, 64), (9, 9, 64, 128)),  # conv5 family, uneven tiles
        ((1, 19, 9, 4), (7, 7, 4, 64)),      # Ho < default tile, tiny W
    ])
    def test_matches_conv_bn_relu(self, xs, ws):
        p = _rand_block(xs, ws)
        s, t = fold_batchnorm(p["bias"], p["gamma"], p["beta"], p["mean"], p["var"], 1e-3)
        got = conv_block_fused(p["x"], p["w"], s, t)
        ref = _ref_block(p["x"], p["w"], p["bias"], p["gamma"], p["beta"], p["mean"], p["var"])
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=5e-5)

    @pytest.mark.parametrize("tile_rows", [8, 16, 32])
    def test_tile_size_invariant(self, tile_rows):
        """Every tiling produces identical results (halo/crop bookkeeping)."""
        p = _rand_block((2, 50, 23, 16), (5, 5, 16, 32), seed=1)
        s, t = fold_batchnorm(p["bias"], p["gamma"], p["beta"], p["mean"], p["var"], 1e-3)
        ref = _ref_block(p["x"], p["w"], p["bias"], p["gamma"], p["beta"], p["mean"], p["var"])
        got = conv_block_fused(p["x"], p["w"], s, t, tile_rows=tile_rows)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=5e-5)

    def test_fold_identity(self):
        # gamma=1, beta=mean=0, var=1 -> s≈1, t=bias
        s, t = fold_batchnorm(
            jnp.full((4,), 0.5), jnp.ones(4), jnp.zeros(4), jnp.zeros(4), jnp.ones(4), 0.0
        )
        np.testing.assert_allclose(s, np.ones(4), rtol=1e-6)
        np.testing.assert_allclose(t, np.full(4, 0.5), rtol=1e-6)


class TestFusedConvBlockKhpack:
    @pytest.mark.parametrize("xs,ws", [
        ((2, 40, 30, 16), (5, 5, 16, 32)),   # conv2 family: offsets {0,32,64,96}
        ((1, 45, 25, 32), (5, 5, 32, 48)),   # conv3 family: offsets incl. 16
        ((1, 40, 22, 48), (7, 7, 48, 64)),   # conv4 family: offsets {0,64}
        ((1, 19, 9, 4), (3, 3, 4, 24)),      # tiny, Ho < tile
    ])
    def test_matches_conv_bn_relu(self, xs, ws):
        from tpumix.ops.conv_block_pallas import conv_block_fused_khpack

        p = _rand_block(xs, ws, seed=2)
        s, t = fold_batchnorm(p["bias"], p["gamma"], p["beta"], p["mean"], p["var"], 1e-3)
        got = conv_block_fused_khpack(p["x"], p["w"], s, t)
        ref = _ref_block(p["x"], p["w"], p["bias"], p["gamma"], p["beta"], p["mean"], p["var"])
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=5e-5)

    @pytest.mark.parametrize("tile_rows", [8, 16, 24])
    def test_tile_size_invariant(self, tile_rows):
        from tpumix.ops.conv_block_pallas import conv_block_fused_khpack

        p = _rand_block((2, 50, 23, 16), (5, 5, 16, 32), seed=3)
        s, t = fold_batchnorm(p["bias"], p["gamma"], p["beta"], p["mean"], p["var"], 1e-3)
        ref = _ref_block(p["x"], p["w"], p["bias"], p["gamma"], p["beta"], p["mean"], p["var"])
        got = conv_block_fused_khpack(p["x"], p["w"], s, t, tile_rows=tile_rows)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=5e-5)


class TestFusedConvBlockV2:
    @pytest.mark.parametrize("khpack", [False, True])
    @pytest.mark.parametrize("xs,ws", [
        ((2, 40, 30, 16), (5, 5, 16, 32)),
        ((1, 25, 20, 8), (3, 7, 8, 24)),
        ((1, 33, 21, 64), (9, 9, 64, 128)),
        ((1, 40, 22, 48), (7, 7, 48, 64)),
        ((1, 19, 9, 4), (7, 7, 4, 64)),
    ])
    def test_matches_conv_bn_relu(self, xs, ws, khpack):
        from tpumix.ops.conv_block_pallas import (
            conv_block_fused_khpack_v2,
            conv_block_fused_v2,
        )

        fn = conv_block_fused_khpack_v2 if khpack else conv_block_fused_v2
        p = _rand_block(xs, ws, seed=4)
        s, t = fold_batchnorm(p["bias"], p["gamma"], p["beta"], p["mean"], p["var"], 1e-3)
        got = fn(p["x"], p["w"], s, t)
        ref = _ref_block(p["x"], p["w"], p["bias"], p["gamma"], p["beta"], p["mean"], p["var"])
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=5e-5)

    @pytest.mark.parametrize("khpack", [False, True])
    @pytest.mark.parametrize("tile_rows", [8, 16, 32])
    def test_tile_size_invariant(self, tile_rows, khpack):
        from tpumix.ops.conv_block_pallas import (
            conv_block_fused_khpack_v2,
            conv_block_fused_v2,
        )

        fn = conv_block_fused_khpack_v2 if khpack else conv_block_fused_v2
        p = _rand_block((2, 50, 23, 16), (5, 5, 16, 32), seed=5)
        s, t = fold_batchnorm(p["bias"], p["gamma"], p["beta"], p["mean"], p["var"], 1e-3)
        ref = _ref_block(p["x"], p["w"], p["bias"], p["gamma"], p["beta"], p["mean"], p["var"])
        got = fn(p["x"], p["w"], s, t, tile_rows=tile_rows)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=5e-5)
