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
import jax
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


def batch_norm(
    train: bool,
    *,
    name: str | None = None,
    axis: int = -1,
    dtype: Dtype = jnp.float32,
) -> nn.BatchNorm:
    """BatchNorm with Keras constants.

    ``axis`` selects the feature axis (1 for NCHW activations); parameter
    shapes and names are identical either way, so checkpoints interchange.

    ``dtype`` is the computation dtype.  Batch-statistic REDUCTIONS are always
    f32 (training stability); but the per-element normalize is just an affine
    scale+shift, and forcing it to f32 between bf16 convs materializes
    full-size f32 intermediates — at b64 @ 256^2 x 128ch that is a 4.3 GB
    tensor and tens of ms of pure HBM tax per decoder stage (measured r3).
    Callers pass their compute dtype; training reductions stay exact because
    flax upcasts the moment computation internally.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPSILON,
        dtype=dtype,
        param_dtype=jnp.float32,
        axis=axis,
        name=name,
    )


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class PackedConv(nn.Module):
    """Drop-in conv computed by the packed-lane transform
    (ops.packed_conv) — the default fast path for the MXU-underfilled
    small-channel U-Net stages (measured 1.5-2.5x per conv on v5e, and more
    in-net where consecutive packed stages keep the 128-lane layout).

    Parameter names/shapes match nn.Conv exactly ('kernel' HWIO, 'bias'), so
    checkpoints interchange freely with the dense path.  Pure XLA: autodiff,
    sharding, and remat all work — usable for training as well as inference.
    Falls back to the dense conv off-TPU (the packed form trades FLOPs for
    lane occupancy, a TPU-only win) or when the static shape doesn't support
    packing.
    """

    features: int
    kernel: tuple
    act: str | None = None
    dtype: Dtype = jnp.float32
    max_pack_cout: int = 32  # measured win threshold: p >= 4 (BENCH_NOTES r2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        from singlehdr_tpu.ops.packed_conv import packed_conv, packed_conv_supported

        kernel = self.param(
            "kernel",
            glorot(),
            (*self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # SINGLEHDR_FORCE_PACKED_CONV=1 engages the packed transform off-TPU
        # too — used by the CPU training-convergence A/B test, where the
        # default backend gate would silently compare dense against dense.
        force = os.environ.get("SINGLEHDR_FORCE_PACKED_CONV") == "1"
        if (
            (jax.default_backend() == "tpu" or force)
            and self.features <= self.max_pack_cout
            and packed_conv_supported(x.shape, self.features)
        ):
            return packed_conv(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                bias,
                act=self.act,
            )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)
        if self.act == "leaky_relu":
            return leaky_relu(y)
        if self.act == "relu":
            return nn.relu(y)
        if self.act == "tanh":
            return jnp.tanh(y)
        return y


class UpsampleConv(nn.Module):
    """Fused ``conv3x3(resize_bilinear_x2(x))`` (ops.upsample_conv).

    Drop-in for the decoder resize+conv pair: parameter names/shapes match
    nn.Conv ('kernel' HWIO, 'bias'), so checkpoints interchange freely with
    the unfused path.  Exact including borders; pure XLA (autodiff/sharding/
    remat fine).  On TPU the fused form runs the conv at low resolution with
    4x output channels + depth-to-space — measured 1.4-2.4x per decoder stage
    at b64 @ 512^2 and removes the 2 GB materialized upsample intermediates
    (BENCH_NOTES r2).  Off-TPU it falls back to resize+conv (identical math)
    unless ``force_fused`` (tests).
    """

    features: int
    act: str | None = None
    dtype: Dtype = jnp.float32
    force_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from singlehdr_tpu.ops.resize import resize_bilinear_x2
        from singlehdr_tpu.ops.upsample_conv import upsample_conv_x2

        kernel = self.param(
            "kernel", glorot(), (3, 3, x.shape[-1], self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        if self.force_fused or jax.default_backend() == "tpu":
            y = upsample_conv_x2(x, kernel.astype(self.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                resize_bilinear_x2(x),
                kernel.astype(self.dtype),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = y + bias.astype(y.dtype)
        if self.act == "leaky_relu":
            return leaky_relu(y)
        if self.act == "relu":
            return nn.relu(y)
        assert self.act is None, self.act
        return y
