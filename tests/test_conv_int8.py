"""Dynamic-W8A8 khgemm conv (conv2d_valid_khgemm_int8) — numerics + gating.

The int8 path is an inference-only study lowering (VERDICT round-3 item 5):
per-output-lane weight scales, per-GEMM-row activation scales, int32 MXU
accumulation, f32 dequant epilogue.  These tests pin the quantization error
envelope on CPU; the TPU segment-time and trained-weight gain-deviation
measurements live in benchmarks/int8_bench.py -> docs/PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumix.ops.conv_khgemm import (
    conv2d_valid_khgemm,
    conv2d_valid_khgemm_int8,
)


@pytest.mark.parametrize(
    "shape,kern",
    [
        ((2, 24, 20, 16), (5, 5, 16, 32)),
        pytest.param(
            (1, 30, 17, 64), (9, 9, 64, 128), marks=pytest.mark.heavy
        ),
    ],
)
def test_int8_tracks_f32_within_quant_envelope(shape, kern):
    kx, kw_ = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw_, kern, jnp.float32) * 0.1
    ref = np.asarray(conv2d_valid_khgemm(x, w))
    q = np.asarray(conv2d_valid_khgemm_int8(x, w))
    assert q.shape == ref.shape
    # 8-bit symmetric rows+lanes: measured ~0.7% mean / ~4% max relative to
    # the output RMS on random normals (the bound below has ~2x headroom)
    scale = np.sqrt(np.mean(ref**2)) + 1e-9
    rel = np.abs(q - ref) / scale
    assert float(np.mean(rel)) < 1.5e-2
    assert float(np.max(rel)) < 8e-2


def test_int8_exact_on_ternary_inputs():
    # ternary values are EXACTLY representable under symmetric max/127 row
    # scaling (scale = 1/127, codes = 0 or +-127); wider integer grids are
    # NOT (max 5 -> spacing 5/127, integers land off-grid), so ternary is the
    # exactness case the scheme actually guarantees
    rng = np.random.default_rng(1)
    x = rng.integers(-1, 2, (1, 12, 10, 8)).astype(np.float32)
    w = rng.integers(-1, 2, (3, 3, 8, 16)).astype(np.float32)
    ref = np.asarray(conv2d_valid_khgemm(jnp.asarray(x), jnp.asarray(w)))
    q = np.asarray(conv2d_valid_khgemm_int8(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(q, ref, rtol=0, atol=1e-3)


def test_model_forward_with_int8_trunk():
    from tpumix.config import preset
    from tpumix.models.registry import build_model

    import dataclasses as dc

    cfg = dc.replace(preset("scalar1s"), conv_impl="khgemm_int8")
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(2), (1, 4, 129, 87), jnp.float32)
    # small freq extent keeps CPU cost down; VALID shapes still positive
    variables = model.init(jax.random.key(0), x, train=False)
    masked, gains = model.apply(variables, x, train=False)
    assert gains.shape == (1, 4)
    assert np.isfinite(np.asarray(gains)).all()

    cfg_f32 = dc.replace(preset("scalar1s"), conv_impl="khgemm")
    model_f32 = build_model(cfg_f32)
    _, gains_f32 = model_f32.apply(variables, x, train=False)
    # untrained weights: the two trunks should stay close in gain space
    assert float(np.max(np.abs(np.asarray(gains) - np.asarray(gains_f32)))) < 0.1


def test_int8_is_inference_only():
    import dataclasses as dc

    from tpumix.config import preset
    from tpumix.models.registry import build_model

    cfg = dc.replace(preset("scalar2s"), conv_impl="khgemm_int8")
    with pytest.raises(ValueError, match="inference-only"):
        build_model(cfg, for_training=True)
