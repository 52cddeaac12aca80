"""Shared layer primitives with Keras-matching defaults.

The reference builds every conv with tf.keras defaults (glorot_uniform kernels,
zero biases, SAME padding) and BatchNormalization with momentum 0.99 /
epsilon 1e-3; weight-import parity requires the same initializers and norm
constants here.

Mixed precision: modules thread a ``dtype`` (compute dtype, bfloat16 on TPU for
speed runs) while parameters stay float32 (``param_dtype``); BatchNorm always
normalizes in float32 for stability.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

glorot = nn.initializers.glorot_uniform

# Keras BatchNormalization defaults.
BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3

LEAKY_SLOPE = 0.1  # leaky-ReLU slope used throughout the U-Nets


def conv(
    features: int,
    kernel: int | Sequence[int],
    *,
    strides: int = 1,
    use_bias: bool = True,
    dtype: Dtype = jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """SAME-padded NHWC conv with glorot_uniform/zeros init (Keras defaults)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    return nn.Conv(
        features,
        kernel_size=tuple(kernel),
        strides=(strides, strides),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=glorot(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def dense(features: int, *, dtype: Dtype = jnp.float32, name: str | None = None) -> nn.Dense:
    """Keras-default Dense: glorot_uniform kernel, zero bias."""
    return nn.Dense(
        features,
        kernel_init=glorot(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def batch_norm(train: bool, *, name: str | None = None) -> nn.BatchNorm:
    """BatchNorm with Keras constants; statistics and affine math in f32."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPSILON,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        name=name,
    )


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)
