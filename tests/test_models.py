"""Model contract tests: output shapes, flattened head dims, parameter counts
(SURVEY.md §2.2 computed facts), masked-sum semantics, train/eval modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.models import (
    DummyModel,
    GainResNet,
    MixingModelScalar1s,
    MixingModelScalar2s,
    RandomModel,
    gains_as_tuple,
)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def init_model(model, shape):
    x = jnp.zeros(shape, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return variables, x


class TestScalar1s:
    def test_shapes_and_param_count(self):
        model = MixingModelScalar1s()
        variables, x = init_model(model, (2, 4, 1025, 87))
        masked, gains = model.apply(variables, x, train=False)
        assert masked.shape == (2, 1025, 87)
        assert gains.shape == (2, 4)
        # SURVEY.md §2.2: Scalar1s 908,400 params (conv trunk 866,720 + 4x10,420 heads)
        n = param_count(variables["params"])
        assert n == 908_400, n

    def test_flattened_dim(self):
        # VALID conv stack at [1025, 87] must land on 490*21 = 10290 features
        model = MixingModelScalar1s()
        variables, x = init_model(model, (1, 4, 1025, 87))
        fc = variables["params"]["head1"]["fc"]["kernel"]
        assert fc.shape == (10290, 1)

    def test_masked_is_gain_weighted_db_sum(self):
        model = MixingModelScalar1s()
        variables, x = init_model(model, (1, 4, 1025, 87))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 4, 1025, 87)).astype(np.float32))
        masked, gains = model.apply(variables, x, train=False)
        expected = np.einsum("bsft,bs->bft", np.asarray(x), np.asarray(gains))
        np.testing.assert_allclose(np.asarray(masked), expected, atol=1e-4)

    def test_gains_as_tuple(self):
        g = jnp.arange(8.0).reshape(2, 4)
        t = gains_as_tuple(g)
        assert len(t) == 4 and t[0].shape == (2, 1)
        np.testing.assert_array_equal(np.asarray(t[2]).ravel(), [2.0, 6.0])

    def test_train_mode_runs_with_dropout_and_bn(self):
        model = MixingModelScalar1s()
        variables, x = init_model(model, (2, 4, 1025, 87))
        (masked, gains), mutated = model.apply(
            variables,
            jnp.ones((2, 4, 1025, 87)),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        assert "batch_stats" in mutated
        assert np.all(np.isfinite(np.asarray(gains)))


class TestScalar2s:
    def test_shapes_and_param_count(self):
        model = MixingModelScalar2s()
        variables, x = init_model(model, (1, 4, 1025, 173))
        masked, gains = model.apply(variables, x, train=False)
        assert masked.shape == (1, 1025, 173)
        assert gains.shape == (1, 4)
        n = param_count(variables["params"])
        # SURVEY.md §2.2: Scalar2s 990,468 (trunk 866,720 + 4x30,937 heads)
        assert n == 990_468, n

    def test_flattened_dim(self):
        model = MixingModelScalar2s()
        variables, _ = init_model(model, (1, 4, 1025, 173))
        fc = variables["params"]["head1"]["fc"]["kernel"]
        assert fc.shape == (30807, 1)


class TestResNet:
    def test_shapes_and_flattened_dim(self):
        model = GainResNet()
        variables, x = init_model(model, (1, 4, 1025, 216))
        masked, gains = model.apply(variables, x, train=False)
        assert masked.shape == (1, 1025, 216)
        assert gains.shape == (1, 4)
        fc = variables["params"]["head1"]["fc"]["kernel"]
        # reference model_resnet.py:73: flattened_dim = 231 = 33*7
        assert fc.shape == (231, 1)


class TestBaselines:
    def test_dummy_model(self):
        x = jnp.full((2, 4, 8, 6), -10.0)
        out = DummyModel()(x)
        assert out.shape == (2, 8, 6)
        # 20*(log10(4) + 0.5*(-10)) — reference 10**(0.5x) quirk semantics
        np.testing.assert_allclose(
            np.asarray(out), 20 * (np.log10(4.0) - 5.0), atol=1e-3
        )

    def test_random_model_bounds(self):
        rng = np.random.default_rng(7)
        tracks = {s: rng.standard_normal((2, 100)) for s in ("bass", "drums", "vocals", "other")}
        out = RandomModel(rng=np.random.default_rng(0)).forward(tracks)
        for s, y in out.items():
            ratio = y / tracks[s]
            g = ratio[np.isfinite(ratio)][0]
            assert 0.5 <= g <= 1.5
            np.testing.assert_allclose(y, g * tracks[s], atol=1e-12)


class TestBasicBlockTorchParity:
    def test_stride2_even_extent_matches_torch(self):
        """Explicit paddings reproduce torch's k3/s2/p1 window alignment on
        EVEN spatial extents, where SAME padding would shift every window by
        one sample (ADVICE r1; reference model_resnet.py:6-28)."""
        import torch
        import torch.nn as tnn

        from tpumix.models.blocks import BasicBlock

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 10, 216, 4)).astype(np.float32)  # even extents

        block = BasicBlock(features=8, strides=2)
        variables = block.init(jax.random.key(0), jnp.asarray(x), train=False)
        out_flax = np.asarray(block.apply(variables, jnp.asarray(x), train=False))

        conv1 = tnn.Conv2d(4, 8, 3, stride=2, padding=1, bias=False)
        conv2 = tnn.Conv2d(8, 8, 3, padding=1, bias=False)
        short = tnn.Conv2d(4, 8, 1, stride=2, padding=0, bias=False)
        with torch.no_grad():
            # flax kernels are [kh, kw, cin, cout]; torch wants [cout, cin, kh, kw]
            p = variables["params"]
            conv1.weight.copy_(torch.from_numpy(
                np.transpose(np.asarray(p["conv1"]["kernel"]), (3, 2, 0, 1))))
            conv2.weight.copy_(torch.from_numpy(
                np.transpose(np.asarray(p["conv2"]["kernel"]), (3, 2, 0, 1))))
            short.weight.copy_(torch.from_numpy(
                np.transpose(np.asarray(p["shortcut_conv"]["kernel"]), (3, 2, 0, 1))))
            xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NHWC -> NCHW
            # fresh BNs in eval mode are identity-up-to-eps on both sides
            bn = lambda c: tnn.BatchNorm2d(c, eps=1e-5).eval()
            out = tnn.functional.relu(bn(8)(conv1(xt)))
            out = bn(8)(conv2(out))
            out_t = tnn.functional.relu(out + bn(8)(short(xt))).numpy()

        np.testing.assert_allclose(
            out_flax, np.transpose(out_t, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
        )


class TestNpzCheckpoints:
    def test_save_load_roundtrip(self, tmp_path):
        import jax

        from tpumix.models import MixingModelScalar1s
        from tpumix.models.convert import load_npz, save_npz

        model = MixingModelScalar1s()
        variables = model.init(
            jax.random.key(0), np.zeros((1, 4, 129, 47), np.float32), train=False
        )
        path = str(tmp_path / "m.npz")
        save_npz(path, variables["params"], variables["batch_stats"])
        loaded = load_npz(path)
        for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(loaded["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(variables["batch_stats"]), jax.tree.leaves(loaded["batch_stats"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the loaded tree is forward-usable as-is
        out, gains = model.apply(loaded, np.zeros((1, 4, 129, 47), np.float32), train=False)
        assert gains.shape == (1, 4)
