"""Refinement-Net: fuses the (A, B, C) stage predictions into the final HDR.

Same U-Net topology as the Dequantization-Net but with a 128-wide bottleneck,
a 9-channel input ``concat([A_pred, B_pred, C_pred])``, no tanh on the head,
and the residual added to the first three input channels (A_pred) with a ReLU
output (refinement_net.py:31-66).  ~1.3M parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from singlehdr_tpu.models.unet import ResidualUNet


class RefinementNet(nn.Module):
    dtype: Any = jnp.float32
    fast_convs: bool = True  # packed-lane conv fast path (dense fallback off-TPU)

    @nn.compact
    def __call__(self, abc: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = ResidualUNet(
            bottleneck_features=128,
            dtype=self.dtype,
            fast_convs=self.fast_convs,
            name="unet",
        )(abc, train)
        out = abc[..., 0:3].astype(res.dtype) + res
        return nn.relu(out).astype(jnp.float32)
