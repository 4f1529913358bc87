"""Analytic trunk FLOP counter (tpumix/models/flops.py) — shape-pinned."""

import pytest

from tpumix.models.flops import trunk_flops_per_item, trunk_layer_flops


def test_pinned_flatten_dims_hold():
    # the counter asserts conv5's spatial size against the reference's
    # flatten dims (model_scalar_1s.py:220 / model_scalar_2s.py:77); these
    # calls raise if the arithmetic ever drifts
    layers_1s = trunk_layer_flops(1, 87)
    layers_2s = trunk_layer_flops(2, 173)
    assert len(layers_1s) == len(layers_2s) == 5


def test_2s_trunk_matches_perf_md_accounting():
    # docs/PERF.md: trunk ~3.6 TFLOP per 64-chunk segment, conv5 ~55% of it
    per_item = trunk_flops_per_item(2, 173)
    assert 3.3e12 < 64 * per_item < 3.8e12
    layers = dict(trunk_layer_flops(2, 173))
    assert 0.5 < layers["conv5"] / per_item < 0.8


def test_shape_drift_raises():
    import tpumix.models.flops as fl

    with pytest.raises(AssertionError):
        # wrong frames for a pinned key is not pinned -> no raise; instead
        # corrupt the pin table to prove the guard fires
        orig = dict(fl._PINNED_FLATTEN)
        try:
            fl._PINNED_FLATTEN[(2, 173)] = 1
            fl.trunk_layer_flops(2, 173)
        finally:
            fl._PINNED_FLATTEN.clear()
            fl._PINNED_FLATTEN.update(orig)
