"""Streaming mixer: causal gains must match the batched program per chunk,
boundaries must be click-free, and smoothing must be a proper one-pole."""

import numpy as np
import pytest

import jax

from tpumix.config import ModelConfig
from tpumix.infer.mixer import SongMixer, STEMS
from tpumix.infer.streaming import StreamingMixer
from tpumix.models import MixingModelScalar1s

SR = 44100
CFG = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)


@pytest.fixture(scope="module")
def model_and_vars():
    model = MixingModelScalar1s()
    variables = model.init(
        jax.random.key(0), np.zeros((1, 4, 1025, 87), np.float32), train=False
    )
    return model, variables


@pytest.fixture(scope="module")
def chunks():
    rng = np.random.default_rng(7)
    n_chunks, C = 5, SR
    t = np.arange(n_chunks * C) / SR
    stems = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 80 * t) + 0.1 * rng.standard_normal(len(t)),
            0.3 * rng.standard_normal(len(t)),
            0.3 * np.sin(2 * np.pi * 300 * t) + 0.05 * rng.standard_normal(len(t)),
            0.2 * rng.standard_normal(len(t)),
        ]
    ).astype(np.float32)
    return [stems[:, i * C : (i + 1) * C] for i in range(n_chunks)]


class TestStreamingMixer:
    def test_matches_batched_gains_unsmoothed(self, model_and_vars, chunks):
        model, variables = model_and_vars
        sm = StreamingMixer(model, variables, CFG, smoothing_alpha=1.0)
        streamed = []
        for c in chunks:
            sm.push(c)
            streamed.append(sm.current_gains)
        batched = SongMixer(model, variables, CFG)
        song = np.concatenate(chunks + [np.zeros_like(chunks[0])], axis=1)
        ref = 10.0 ** (0.5 * batched.song_gains(song))  # [n_chunks, 4] amp
        np.testing.assert_allclose(np.asarray(streamed), ref, rtol=2e-4, atol=2e-5)

    def test_output_shape_and_mix_math(self, model_and_vars, chunks):
        model, variables = model_and_vars
        sm = StreamingMixer(model, variables, CFG, smoothing_alpha=1.0)
        out = sm.push(chunks[0])
        assert out.shape == (SR,)
        # first chunk: flat gains (ramp start == target), so output is the
        # plain gain-weighted sum
        g = np.asarray(sm.current_gains)
        np.testing.assert_allclose(
            out, np.einsum("st,s->t", chunks[0], g), rtol=1e-5, atol=1e-6
        )

    def test_boundary_is_click_free(self, model_and_vars, chunks):
        model, variables = model_and_vars
        sm = StreamingMixer(model, variables, CFG, smoothing_alpha=0.35)
        # constant stems isolate the gain trajectory: any output step at the
        # boundary is a gain discontinuity
        const = np.ones_like(chunks[0]) * np.array([[0.2], [0.1], [0.15], [0.05]],
                                                   np.float32)
        varied = chunks[1]
        a = sm.push(const)
        b = sm.push(const * 0.2)  # level drop -> gains move
        boundary_jump = abs(float(b[0]) - float(a[-1]) * 0.2)
        interior = np.max(np.abs(np.diff(b[:100])))
        assert boundary_jump <= max(5 * interior, 1e-4)
        sm.push(varied)  # still healthy on real content
        assert np.all(np.isfinite(b))

    def test_one_pole_smoothing(self, model_and_vars, chunks):
        model, variables = model_and_vars
        alpha = 0.5
        sm = StreamingMixer(model, variables, CFG, smoothing_alpha=alpha)
        raw = StreamingMixer(model, variables, CFG, smoothing_alpha=1.0)
        smooth_hist, raw_hist = [], []
        for c in chunks[:3]:
            sm.push(c)
            raw.push(c)
            smooth_hist.append(np.asarray(sm.current_gains))
            raw_hist.append(np.asarray(raw.current_gains))
        expect = raw_hist[0]
        np.testing.assert_allclose(smooth_hist[0], expect, rtol=1e-6)
        for k in (1, 2):
            expect = (1 - alpha) * expect + alpha * raw_hist[k]
            np.testing.assert_allclose(smooth_hist[k], expect, rtol=1e-5)

    def test_multichannel_and_reset(self, model_and_vars, chunks):
        model, variables = model_and_vars
        sm = StreamingMixer(model, variables, CFG, smoothing_alpha=1.0)
        stereo = np.stack([chunks[0], chunks[0] * 0.5], axis=1)  # [4, 2, C]
        out = sm.push(stereo)
        assert out.shape == (2, SR)
        g1 = sm.current_gains
        sm.reset()
        assert sm.current_gains is None
        sm.push(stereo)
        np.testing.assert_allclose(sm.current_gains, g1, rtol=1e-6)

    def test_input_validation(self, model_and_vars, chunks):
        model, variables = model_and_vars
        sm = StreamingMixer(model, variables, CFG)
        with pytest.raises(ValueError):
            sm.push(chunks[0][:3])
        with pytest.raises(ValueError):
            sm.push(chunks[0][:, : SR // 2])
        with pytest.raises(ValueError):
            StreamingMixer(model, variables, CFG, smoothing_alpha=0.0)

    def test_push_tracks_dict(self, model_and_vars, chunks):
        model, variables = model_and_vars
        sm = StreamingMixer(model, variables, CFG, smoothing_alpha=1.0)
        tracks = {t: chunks[0][i] for i, t in enumerate(STEMS)}
        out = sm.push_tracks(tracks)
        assert out.shape == (SR,)
