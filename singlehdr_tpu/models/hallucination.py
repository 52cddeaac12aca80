"""Hallucination-Net: recovers clipped highlights as a residual (BGR output).

An HDRCNN-style autoencoder (hallucination_net.py:109-190; Eilertsen et al.
SIGGRAPH Asia 2017 architecture): the input is VGG-preprocessed (x255, RGB->BGR,
mean subtract), encoded by a VGG16-layout conv stack (64/128/256/512/512 with
2-2-3-3-3 convs and 2x2 max-pools), a 3x3x512 latent conv + BN, and decoded by
bilinear-x2 up blocks with 1x1 skip fusions whose encoder skips are scaled by
1/255 (hallucination_net.py:101).  The final skip fuses the preprocessed BGR
input itself; output is ReLU'd and remains **BGR** — callers channel-swap
(train.py:216, joint_training.py:164, test_real_refinement.py:104).
~24.6M parameters.

The reference's decoder ``up`` block defines a second conv that is never called
(hallucination_net.py:83) — a dead layer, intentionally not reproduced.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from singlehdr_tpu.models.layers import batch_norm, conv
from singlehdr_tpu.ops.color import vgg_preprocess
from singlehdr_tpu.ops.resize import max_pool, resize_bilinear_x2


class EncoderStage(nn.Module):
    """n_convs ReLU convs then 2x2/2 max-pool; returns (pooled, pre-pool skip)."""

    features: int
    n_convs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        for i in range(self.n_convs):
            x = nn.relu(conv(self.features, 3, dtype=self.dtype, name=f"conv{i + 1}")(x))
        return max_pool(x, 2, 2, "SAME"), x


class DecoderStage(nn.Module):
    """bilinear x2 -> conv -> ReLU -> BN -> ReLU (hallucination_net.py:77-91)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = resize_bilinear_x2(x)
        x = nn.relu(conv(self.features, 3, dtype=self.dtype, name="conv")(x))
        x = nn.relu(batch_norm(train, name="bn")(x))
        return x


class SkipFusion(nn.Module):
    """concat(x, skip/255) then 1x1 conv (hallucination_net.py:93-107)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        h = jnp.concatenate([x, skip.astype(x.dtype) / 255.0], axis=-1)
        return conv(self.features, 1, dtype=self.dtype, name="conv")(h)


_ENC = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class HallucinationNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb01: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # The preprocessing means live in a (non-trainable) variable so that
        # BGR-trained reference checkpoints — whose effective mean order is
        # reversed — import as a pure weight transform with no module flags
        # (train.weight_import.adapt_channel_order).
        from singlehdr_tpu.ops.color import VGG_MEAN_BGR

        mean = self.variable(
            "batch_stats", "preproc_mean",
            lambda: jnp.asarray(VGG_MEAN_BGR, jnp.float32),
        )
        bgr = vgg_preprocess(rgb01, mean.value).astype(self.dtype)

        x = bgr
        skips = []
        for i, (f, n) in enumerate(_ENC):
            x, s = EncoderStage(f, n, dtype=self.dtype, name=f"enc{i + 1}")(x)
            skips.append(s)

        x = conv(512, 3, dtype=self.dtype, name="latent_conv")(x)
        x = nn.relu(batch_norm(train, name="latent_bn")(x))

        for i, skip in zip(range(len(_ENC), 0, -1), reversed(skips)):
            f = _ENC[i - 1][0]
            x = DecoderStage(f, dtype=self.dtype, name=f"dec{i}")(x, train)
            x = SkipFusion(f, dtype=self.dtype, name=f"skip{i}")(x, skip)

        x = conv(3, 1, dtype=self.dtype, name="head_conv")(x)
        x = nn.relu(batch_norm(train, name="head_bn")(x))
        x = SkipFusion(3, dtype=self.dtype, name="skip0")(x, bgr)
        return nn.relu(x).astype(jnp.float32)  # BGR residual
