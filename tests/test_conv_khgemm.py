"""kh-unrolled GEMM conv lowering (tpumix/ops/conv_khgemm.py): exact parity
with lax.conv and parameter interchange with the nn.Conv-backed blocks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.ops.conv_khgemm import conv2d, conv2d_valid_khgemm


def _ref(x, w, strides=(1, 1), dilation=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding="VALID", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestKhGemmOp:
    @pytest.mark.parametrize("xs,ws", [
        ((2, 40, 30, 16), (5, 5, 16, 32)),   # conv2 shape family
        ((2, 37, 25, 48), (7, 7, 48, 64)),   # conv4
        ((1, 30, 22, 64), (9, 9, 64, 128)),  # conv5
        ((3, 12, 11, 3), (1, 1, 3, 7)),      # degenerate 1x1
    ])
    def test_matches_lax_conv(self, xs, ws):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            conv2d_valid_khgemm(x, w), _ref(x, w), rtol=1e-5, atol=1e-5
        )

    def test_dispatch_falls_back_for_stride_dilation(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 21, 19, 4)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 4, 16)) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            conv2d(x, w, strides=(2, 2)), _ref(x, w, strides=(2, 2)), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            conv2d(x, w, dilation=(2, 2)), _ref(x, w, dilation=(2, 2)), rtol=1e-5, atol=1e-6
        )

    def test_gradients_match(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 16, 14, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, 8, 12)) * 0.1, jnp.float32)
        g1 = jax.grad(lambda w_: jnp.sum(conv2d_valid_khgemm(x, w_) ** 2))(w)
        g2 = jax.grad(lambda w_: jnp.sum(_ref(x, w_) ** 2))(w)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-4)


class TestModelParity:
    def test_scalar_model_forward_identical_params(self):
        """Same params, both conv lowerings -> same gains (f32 reassociation
        tolerance); checkpoints interchange freely."""
        import dataclasses

        from tpumix.config import ModelConfig
        from tpumix.models.registry import build_model

        cfg = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)
        x = np.random.default_rng(5).standard_normal((2, 4, 129, 47)).astype(np.float32)
        m_xla = build_model(cfg)
        variables = m_xla.init(jax.random.key(0), x, train=False)
        m_kh = build_model(dataclasses.replace(cfg, conv_impl="khgemm"))
        # shapes are inferred from input (129 bins here) — params interchange
        out_a, g_a = m_xla.apply(variables, x, train=False)
        out_b, g_b = m_kh.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), rtol=2e-3, atol=2e-3)

    def test_param_trees_identical(self):
        import dataclasses

        from tpumix.config import ModelConfig
        from tpumix.models.registry import build_model

        cfg = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)
        x = np.zeros((1, 4, 129, 47), np.float32)
        v_a = build_model(cfg).init(jax.random.key(0), x, train=False)
        v_b = build_model(dataclasses.replace(cfg, conv_impl="khgemm")).init(
            jax.random.key(0), x, train=False
        )
        ta = jax.tree.structure(v_a)
        tb = jax.tree.structure(v_b)
        assert ta == tb
        for a, b in zip(jax.tree.leaves(v_a), jax.tree.leaves(v_b)):
            assert np.asarray(a).shape == np.asarray(b).shape


class TestAutoResolution:
    def test_auto_gates_on_backend_and_context(self, monkeypatch):
        import tpumix.models.registry as registry
        import tpumix.utils.backend as backend
        from tpumix.config import ModelConfig

        cfg = ModelConfig(name="scalar1s")  # conv_impl="auto" default
        monkeypatch.setattr(backend, "is_tpu_backend", lambda *a: True)
        assert registry.build_model(cfg).conv_impl == "khgemm"
        # training: khgemm's backward loses (287 vs 235 ms/step) -> lax.conv
        assert registry.build_model(cfg, for_training=True).conv_impl == "xla"
        monkeypatch.setattr(backend, "is_tpu_backend", lambda *a: False)
        assert registry.build_model(cfg).conv_impl == "xla"

    def test_explicit_impl_wins(self):
        import dataclasses

        from tpumix.config import ModelConfig
        from tpumix.models.registry import build_model

        cfg = dataclasses.replace(ModelConfig(name="scalar1s"), conv_impl="khgemm")
        assert build_model(cfg, for_training=True).conv_impl == "khgemm"


class TestCustomVJP:
    @pytest.mark.parametrize("xs,ws", [
        ((2, 20, 15, 8), (5, 5, 8, 16)),
        ((1, 17, 11, 4), (3, 7, 4, 12)),
        ((2, 25, 12, 6), (9, 9, 6, 10)),
    ])
    def test_gradients_match_lax_conv_autodiff(self, xs, ws):
        """The hand-derived khgemm VJP (dense transpose conv + per-row GEMM
        dw) must equal XLA's autodiff of lax.conv to f32 noise."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.float32)
        g_seed = jnp.asarray(rng.standard_normal((1,)), jnp.float32)

        def loss_kh(x, w):
            y = conv2d_valid_khgemm(x, w)
            return jnp.sum(jnp.sin(y * 0.1) * g_seed)

        def loss_lax(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return jnp.sum(jnp.sin(y * 0.1) * g_seed)

        (dx1, dw1) = jax.grad(loss_kh, argnums=(0, 1))(x, w)
        (dx2, dw2) = jax.grad(loss_lax, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2), rtol=2e-4, atol=2e-4)

    def test_hybrid_forward_khgemm_backward_lax(self):
        """conv2d_valid_khgemm_hybrid: forward equals the khgemm lowering,
        gradients equal lax.conv autodiff (they ARE lax.conv's VJP)."""
        from tpumix.ops.conv_khgemm import conv2d_valid_khgemm_hybrid

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 20, 15, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((5, 5, 8, 16)) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(conv2d_valid_khgemm_hybrid(x, w)),
            np.asarray(conv2d_valid_khgemm(x, w)),
            atol=1e-6,
        )

        def loss_hy(x, w):
            return jnp.sum(jnp.sin(conv2d_valid_khgemm_hybrid(x, w) * 0.1))

        def loss_lax(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return jnp.sum(jnp.sin(y * 0.1))

        (dx1, dw1) = jax.grad(loss_hy, argnums=(0, 1))(x, w)
        (dx2, dw2) = jax.grad(loss_lax, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2), rtol=2e-4, atol=2e-4)

    def test_hybrid_conv_impl_builds_and_trains(self):
        """conv_impl="khgemm_hybrid" declares the same parameter tree and
        produces finite gradients through a ConvBlock."""
        from tpumix.models.blocks import ConvBlock2d

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 16, 12, 4)), jnp.float32)
        blocks = {
            impl: ConvBlock2d(features=8, kernel_size=3, conv_impl=impl)
            for impl in ("xla", "khgemm", "khgemm_hybrid")
        }
        params = {
            impl: b.init(jax.random.key(0), jnp.zeros_like(x), train=False)
            for impl, b in blocks.items()
        }
        trees = {
            impl: jax.tree_util.tree_structure(p) for impl, p in params.items()
        }
        assert trees["xla"] == trees["khgemm"] == trees["khgemm_hybrid"]
        y_h = blocks["khgemm_hybrid"].apply(params["xla"], x, train=False)
        y_x = blocks["xla"].apply(params["xla"], x, train=False)
        np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_x), atol=1e-5)
        g = jax.grad(
            lambda p: jnp.sum(
                blocks["khgemm_hybrid"].apply(
                    p, x, train=True, rngs={"dropout": jax.random.key(1)},
                    mutable=["batch_stats"],
                )[0]
                ** 2
            )
        )(params["xla"])
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
