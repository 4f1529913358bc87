"""Golden-value regression: seeded model + seeded song must reproduce these
gain values on the CPU backend.  Catches silent numeric drift in the frontend,
model, or mixer across refactors (values generated on the round-1 CPU
backend; loose tolerance absorbs BLAS/XLA version noise)."""

import numpy as np

import jax

from tpumix.config import ModelConfig
from tpumix.infer.mixer import SongMixer
from tpumix.models import MixingModelScalar1s

GOLDEN_GAINS = np.array(
    [
        [1.9260273e00, -2.1386647e00, 1.3998139e00, 8.2786633e-03],
        [3.2308056e00, -1.9471121e00, 6.8825179e-01, -9.6571511e-03],
        [3.0323160e00, -1.9869950e00, 9.9476939e-01, -5.1651569e-04],
        [2.8305912e00, -1.3245906e00, 1.1938896e-01, 4.7344398e-03],
    ],
    dtype=np.float32,
)


def test_seeded_pipeline_reproduces_golden_gains():
    rng = np.random.default_rng(1234)
    stems = (0.1 * rng.standard_normal((4, 5 * 44100))).astype(np.float32)
    model = MixingModelScalar1s()
    variables = model.init(
        jax.random.key(7), np.zeros((1, 4, 1025, 87), np.float32), train=False
    )
    cfg = ModelConfig(name="scalar1s", chunk_length_s=1.0, hop_length=512)
    gains = SongMixer(model, variables, cfg).song_gains(stems)
    np.testing.assert_allclose(gains, GOLDEN_GAINS, atol=2e-3)
