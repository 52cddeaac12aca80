"""Dequantization-Net: removes 8-bit quantization / JPEG artifacts.

A 5-scale residual U-Net (dequantization_net.py:31-65): channels 16/32/64/128
with a 256-wide bottleneck, leaky-ReLU(0.1), avg-pool down / bilinear-x2 up, and
a tanh-bounded residual added to the input (callers clip the sum to [0,1] —
train.py:169, joint_training.py:151).  ~2.0M parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from singlehdr_tpu.models.unet import ResidualUNet


class DequantizationNet(nn.Module):
    dtype: Any = jnp.float32
    fast_convs: bool = True  # packed-lane conv fast path (dense fallback off-TPU)

    @nn.compact
    def __call__(self, ldr: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = ResidualUNet(
            bottleneck_features=256,
            dtype=self.dtype,
            fast_convs=self.fast_convs,
            name="unet",
        )(ldr, train)
        return (ldr.astype(res.dtype) + jnp.tanh(res)).astype(jnp.float32)
