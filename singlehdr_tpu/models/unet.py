"""Shared residual U-Net backbone for the Dequantization and Refinement nets.

Both nets share one topology (dequantization_net.py:31-65,
refinement_net.py:31-66): a 7x7 stem at 16 channels, four avg-pool down stages
(the last being the bottleneck), bilinear-x2 up stages with skip concats, and a
3-channel 3x3 head; they differ only in bottleneck width (256 vs 128) and the
output/residual transform, which the thin wrappers own.

TPU notes: all convs are SAME/NHWC so XLA tiles them directly onto the MXU; the
bilinear x2 is a fixed-weight lerp that fuses into the following conv's input;
avg-pool is a reshape-mean (no reduce_window dispatch).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from singlehdr_tpu.models.layers import StripConv, conv, leaky_relu
from singlehdr_tpu.ops.resize import avg_pool_2x2, resize_bilinear_x2


class DownStage(nn.Module):
    """avg-pool /2 then two leaky-ReLU convs (dequantization_net.py:4-15)."""

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = avg_pool_2x2(x)
        x = leaky_relu(conv(self.features, self.kernel, dtype=self.dtype, name="conv1")(x))
        x = leaky_relu(conv(self.features, self.kernel, dtype=self.dtype, name="conv2")(x))
        return x


class UpStage(nn.Module):
    """bilinear x2, conv, skip-concat, conv (dequantization_net.py:17-29)."""

    features: int
    dtype: Any = jnp.float32
    fast_convs: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = resize_bilinear_x2(x)
        x = self._conv("conv1")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        x = self._conv("conv2")(x)
        return x

    def _conv(self, name: str):
        if self.fast_convs and self.features <= 16:
            return StripConv(
                self.features, (3, 3), act="leaky_relu", dtype=self.dtype, name=name
            )
        mod = conv(self.features, 3, dtype=self.dtype, name=name)
        return lambda x: leaky_relu(mod(x))


class ResidualUNet(nn.Module):
    """The shared encoder-decoder; returns the raw 3-channel head output.

    Spatial dims must be multiples of 16 (four /2 stages).
    """

    stem_features: int = 16
    stem_kernel: int = 7
    down_features: Sequence[int] = (32, 64, 128)
    down_kernels: Sequence[int] = (5, 3, 3)
    bottleneck_features: int = 256
    out_features: int = 3
    dtype: Any = jnp.float32
    # inference-only Pallas strip-conv fast path for the Cout<=16 stages
    # (stems, last up stage, head) — forward-only, never set while training
    fast_convs: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h = self._stem("stem1")(x)
        h = self._stem("stem2")(h)
        skips = [h]
        for i, (f, k) in enumerate(zip(self.down_features, self.down_kernels)):
            h = DownStage(f, k, dtype=self.dtype, name=f"down{i + 2}")(h)
            skips.append(h)
        h = DownStage(self.bottleneck_features, 3, dtype=self.dtype, name="bottleneck")(h)
        up_widths = [self.stem_features, *self.down_features][::-1]  # e.g. [128,64,32,16]
        for i, (f, skip) in enumerate(zip(up_widths, reversed(skips))):
            h = UpStage(
                f, dtype=self.dtype, fast_convs=self.fast_convs,
                name=f"up{len(skips) - i}",
            )(h, skip)
        return self._head()(h)

    def _stem(self, name: str):
        """Stem conv + leaky ReLU; strip-conv kernel on the fast path."""
        if self.fast_convs:
            return StripConv(
                self.stem_features,
                (self.stem_kernel, self.stem_kernel),
                act="leaky_relu",
                dtype=self.dtype,
                name=name,
            )
        mod = conv(self.stem_features, self.stem_kernel, dtype=self.dtype, name=name)
        return lambda v: leaky_relu(mod(v))

    def _head(self):
        """Raw 3-channel output conv (activation belongs to the wrappers)."""
        if self.fast_convs:
            return StripConv(self.out_features, (3, 3), dtype=self.dtype, name="head")
        return conv(self.out_features, 3, dtype=self.dtype, name="head")
