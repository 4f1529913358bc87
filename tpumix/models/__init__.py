from tpumix.models.scalar import (  # noqa: F401
    MixingModelScalar1s,
    MixingModelScalar2s,
    gains_as_tuple,
)
from tpumix.models.resnet import GainResNet, ResNet18  # noqa: F401
from tpumix.models.baselines import (  # noqa: F401
    DummyModel,
    MeanLoudnessModel,
    RandomModel,
)
