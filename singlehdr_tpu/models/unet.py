"""Shared residual U-Net backbone for the Dequantization and Refinement nets.

Both nets share one topology (dequantization_net.py:31-65,
refinement_net.py:31-66): a 7x7 stem at 16 channels, four avg-pool down stages
(the last being the bottleneck), bilinear-x2 up stages with skip concats, and a
3-channel 3x3 head; they differ only in bottleneck width (256 vs 128) and the
output/residual transform, which the thin wrappers own.

TPU notes: all convs are SAME/NHWC so XLA tiles them directly onto the MXU.
The 3-32 channel stages underfill the MXU's 128 output lanes, so with
``fast_convs`` (default) every conv routes through PackedConv, which packs
horizontally-adjacent pixels into the lane dim (ops.packed_conv) — pure XLA,
training-safe, checkpoint-identical parameters, automatic dense fallback for
the wide stages and off-TPU.  The bilinear x2 is a fixed-weight lerp that
fuses into the following conv's input; avg-pool is a reshape-mean (no
reduce_window dispatch).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from singlehdr_tpu.models.layers import PackedConv, UpsampleConv, conv, leaky_relu
from singlehdr_tpu.ops.resize import avg_pool_2x2, resize_bilinear_x2


def _stage_conv(features, kernel, act, dtype, fast_convs, name):
    """One SAME conv + activation; packed-lane fast path when enabled."""
    if fast_convs:
        return PackedConv(features, (kernel, kernel), act=act, dtype=dtype, name=name)
    mod = conv(features, kernel, dtype=dtype, name=name)
    if act is None:
        return mod
    assert act == "leaky_relu"
    return lambda x: leaky_relu(mod(x))


class DownStage(nn.Module):
    """avg-pool /2 then two leaky-ReLU convs (dequantization_net.py:4-15)."""

    features: int
    kernel: int
    dtype: Any = jnp.float32
    fast_convs: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = avg_pool_2x2(x)
        for name in ("conv1", "conv2"):
            x = _stage_conv(
                self.features, self.kernel, "leaky_relu", self.dtype,
                self.fast_convs, name,
            )(x)
        return x


class UpStage(nn.Module):
    """bilinear x2, conv, skip-concat, conv (dequantization_net.py:17-29).

    On the dense path the resize+conv1 pair runs as the fused low-res conv +
    depth-to-space (UpsampleConv — exact, checkpoint-identical params); the
    packed fast path keeps resize + PackedConv, which wins at those shapes.
    """

    features: int
    dtype: Any = jnp.float32
    fast_convs: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        if self.fast_convs:
            x = resize_bilinear_x2(x)
            x = self._conv("conv1")(x)
        else:
            x = UpsampleConv(
                self.features, act="leaky_relu", dtype=self.dtype, name="conv1"
            )(x)
        x = jnp.concatenate([x, skip], axis=-1)
        x = self._conv("conv2")(x)
        return x

    def _conv(self, name: str):
        return _stage_conv(
            self.features, 3, "leaky_relu", self.dtype, self.fast_convs, name
        )


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
    # packed-lane conv fast path (ops.packed_conv): pure XLA, differentiable,
    # parameter-identical to the dense path; dense fallback off-TPU
    fast_convs: bool = True

    # Packing trades MAC inflation for lane occupancy; measured on v5e it wins
    # for small/medium workloads (b16 @ 512^2: deq 48.7 vs 60.6 ms/net) but
    # loses at large ones (b64 @ 512^2: 162.6 vs 154.7 ms), where XLA's dense
    # conv blocks well enough that the inflated FLOPs dominate.  Shapes are
    # static under jit, so every compiled shape picks its winning path.
    max_pack_pixels: int = 16 * 512 * 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fast = (
            self.fast_convs
            and x.shape[0] * x.shape[1] * x.shape[2] <= self.max_pack_pixels
        )
        x = x.astype(self.dtype)
        h = self._stem("stem1", fast)(x)
        h = self._stem("stem2", fast)(h)
        skips = [h]
        for i, (f, k) in enumerate(zip(self.down_features, self.down_kernels)):
            h = DownStage(
                f, k, dtype=self.dtype, fast_convs=fast,
                name=f"down{i + 2}",
            )(h)
            skips.append(h)
        h = DownStage(
            self.bottleneck_features, 3, dtype=self.dtype,
            fast_convs=fast, name="bottleneck",
        )(h)
        up_widths = [self.stem_features, *self.down_features][::-1]  # e.g. [128,64,32,16]
        for i, (f, skip) in enumerate(zip(up_widths, reversed(skips))):
            h = UpStage(
                f, dtype=self.dtype, fast_convs=fast,
                name=f"up{len(skips) - i}",
            )(h, skip)
        return self._head(fast)(h)

    def _stem(self, name: str, fast: bool):
        """Stem conv + leaky ReLU; packed-lane kernel on the fast path."""
        return _stage_conv(
            self.stem_features, self.stem_kernel, "leaky_relu", self.dtype,
            fast, name,
        )

    def _head(self, fast: bool):
        """Raw 3-channel output conv (activation belongs to the wrappers)."""
        return _stage_conv(
            self.out_features, 3, None, self.dtype, fast, "head"
        )
