"""Core Flax layers for the matting network.

TPU-first choices:
  - NHWC layout throughout (native for TPU convolutions).
  - Plain 3x3 convolutions (implicit-GEMM onto the MXU) rather than the
    depthwise-separable blocks a mobile-CPU reference would use — depthwise
    convs starve the 128x128 systolic array.
  - Explicit symmetric padding (k//2 both sides) so the torch oracle
    (``padding=1``) matches bit-for-bit; Flax's 'SAME' pads asymmetrically
    for stride 2, which would break <=1e-3 MAD parity (BASELINE.json:5).
  - BatchNorm folded to inference affine (use_running_average=True).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBNAct(nn.Module):
    """Conv -> (BatchNorm) -> (ReLU), explicit symmetric padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    act: bool = True
    bn_eps: float = 1e-5
    dtype: Optional[object] = None  # computation dtype (None = f32 promote)
    # True during training: normalize with batch statistics and update the
    # running stats (mutable=['batch_stats']); False (inference/parity)
    # uses the stored running stats as a frozen affine.
    bn_train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=not self.use_bn,
                    dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not self.bn_train,
                             epsilon=self.bn_eps, momentum=0.99,
                             dtype=self.dtype, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x


class ConvGRUCell(nn.Module):
    """Convolutional GRU over spatial feature maps (RVM-lineage temporal
    recurrence [DOMAIN, SURVEY.md §1.1]; BASELINE.json:9 pins recurrent
    hidden-state matting).

    Gates:
      r, z = sigmoid(split(conv3x3([x, h])))
      c    = tanh(conv3x3([x, r * h]))
      h'   = (1 - z) * h + z * c
    """

    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        h = h.astype(x.dtype)
        xh = jnp.concatenate([x, h], axis=-1)
        rz = nn.Conv(2 * self.features, (3, 3), padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="gates")(xh)
        r, z = jnp.split(jax.nn.sigmoid(rz), 2, axis=-1)
        c = jnp.tanh(nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, name="cand"
                             )(jnp.concatenate([x, r * h], axis=-1)))
        return (1.0 - z) * h + z * c


class BottleneckGate(nn.Module):
    """LR-ASPP-style global-context gate at the encoder bottleneck: a 1x1
    projection modulated by a sigmoid gate computed from the global average
    pool. Cheap, and keeps all FLOPs as 1x1 matmuls on the MXU."""

    features: int
    bn_eps: float = 1e-5
    dtype: Optional[object] = None
    bn_train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = ConvBNAct(self.features, kernel=1, bn_eps=self.bn_eps,
                      dtype=self.dtype, bn_train=self.bn_train,
                      name="proj")(x)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="gate")(g)
        return a * jax.nn.sigmoid(g)
