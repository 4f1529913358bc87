"""ResNet gain-prediction backbone (reference models/model_resnet.py:59-130).

CIFAR-style ResNet-18 variant: stem conv(4->16, k3, s1, SAME), six stages of
BasicBlocks [2,2,2,2,2,2] with widths 16/32/64/96/128/256 and strides
1,2,2,2,2,2, then the same four scalar heads as the scalar models; flattened
head dim 231 = 33*7 at the pinned [1025, 216]-bin/frame input (5 s chunks at
hop 1024; reference model_resnet.py:73,149-156).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpumix.models.blocks import BasicBlock, ScalarHead
from tpumix.ops.gain import spectral_mix


class GainResNet(nn.Module):
    """:return: ``(masked [B, F, T], gains [B, num_stems])`` — same contract
    as the scalar models."""

    num_blocks: Sequence[int] = (2, 2, 2, 2, 2, 2)
    widths: Sequence[int] = (16, 32, 64, 96, 128, 256)
    strides: Sequence[int] = (1, 2, 2, 2, 2, 2)
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_stems = x.shape[1]
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)

        h = nn.Conv(16, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name="stem_conv")(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if train else None, dtype=self.dtype, name="stem_bn",
        )(h)
        h = nn.relu(h)

        for stage, (n, w, s) in enumerate(zip(self.num_blocks, self.widths, self.strides)):
            for b in range(n):
                h = BasicBlock(
                    features=w, strides=s if b == 0 else 1,
                    axis_name=self.axis_name, dtype=self.dtype,
                    name=f"layer{stage+1}_block{b+1}",
                )(h, train=train)

        gains = jnp.concatenate(
            [ScalarHead(dtype=self.dtype, name=f"head{i+1}")(h) for i in range(num_stems)],
            axis=-1,
        )
        gains = gains.astype(jnp.float32)
        masked = spectral_mix(x.astype(jnp.float32), gains)
        return masked, gains


def ResNet18(**kwargs) -> GainResNet:
    """Factory matching the reference ``ResNet18()`` (model_resnet.py:129-130)."""
    return GainResNet(**kwargs)
