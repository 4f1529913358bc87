from tpumix.models.scalar import (  # noqa: F401
    MixingModelScalar1s,
    MixingModelScalar1sL,
    MixingModelScalar2s,
    MixingModelScalar2sL,
    gains_as_tuple,
)
from tpumix.models.resnet import GainResNet, ResNet18  # noqa: F401
from tpumix.models.baselines import (  # noqa: F401
    DummyModel,
    MeanLoudnessModel,
    RandomModel,
)
from tpumix.models.registry import build_model, example_feature_shape  # noqa: F401
from tpumix.models.convert import (  # noqa: F401
    flax_scalar_to_torch,
    load_torch_checkpoint,
    torch_scalar_to_flax,
)
