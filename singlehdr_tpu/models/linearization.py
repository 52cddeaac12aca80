"""Linearization-Net: predicts a monotone 1024-sample inverse CRF from an LDR.

Front-end (linearization_net.py:310-334): a 93-channel feature stack — image(3)
+ Sobel edges(6) + soft histograms at 4/8/16 bins — feeds a ResNet-style
``CrfFeatureNet`` (7x7/2 conv + 3x3/2 maxpool + five bottleneck residual
blocks, linearization_net.py:85-118), globally average-pooled to a 512-vector.
A Dense(11) head predicts PCA weights over the inverse-EMoR basis
(``g0 + Hinv @ w``, linearization_net.py:231-253), and the curve is projected
to be monotone increasing ending at 1 (``ops.monotonic_rf``).  ~1.2M params.

Unlike the reference — which re-reads ``invemor.txt`` from disk inside every
forward pass (linearization_net.py:219) — the basis is a jit-time constant.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from singlehdr_tpu.calib import load_inverse_emor
from singlehdr_tpu.models.layers import batch_norm, conv, dense
from singlehdr_tpu.ops.curves import decode_invcrf, monotonic_rf
from singlehdr_tpu.ops.histogram import linearization_features
from singlehdr_tpu.ops.resize import max_pool

N_PCA_WEIGHTS = 11


class BottleneckResBlock(nn.Module):
    """1-3-1 bottleneck residual block (linearization_net.py:6-83).

    With ``projection=True`` the shortcut is a strided 1x1 conv + BN
    (resBlock_type1); otherwise the identity (resBlock_type2).  All convs are
    bias-free; every conv is followed by BatchNorm; ReLU after the first two
    and after the residual add.
    """

    filters: tuple[int, int, int]
    strides: int = 1
    projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f1, f2, f3 = self.filters
        if self.projection:
            shortcut = conv(f3, 1, strides=self.strides, use_bias=False, dtype=self.dtype, name="proj_conv")(x)
            shortcut = batch_norm(train, name="proj_bn", dtype=self.dtype)(shortcut)
        else:
            shortcut = x
        h = conv(f1, 1, strides=self.strides, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(batch_norm(train, name="bn1", dtype=self.dtype)(h))
        h = conv(f2, 3, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(batch_norm(train, name="bn2", dtype=self.dtype)(h))
        h = conv(f3, 1, use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = batch_norm(train, name="bn3", dtype=self.dtype)(h)
        return nn.relu(shortcut + h)


class CrfFeatureNet(nn.Module):
    """7x7/2 stem + maxpool + res1..res5 + global average pool -> [b, 512]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = conv(64, 7, strides=2, dtype=self.dtype, name="stem")(feats)
        h = nn.relu(batch_norm(train, name="stem_bn", dtype=self.dtype)(h))
        h = max_pool(h, 3, 2, "SAME")
        h = BottleneckResBlock((64, 64, 256), projection=True, dtype=self.dtype, name="res1")(h, train)
        h = BottleneckResBlock((64, 64, 256), dtype=self.dtype, name="res2")(h, train)
        h = BottleneckResBlock((64, 64, 256), dtype=self.dtype, name="res3")(h, train)
        h = BottleneckResBlock((128, 128, 512), strides=2, projection=True, dtype=self.dtype, name="res4")(h, train)
        h = BottleneckResBlock((128, 128, 512), dtype=self.dtype, name="res5")(h, train)
        return jnp.mean(h, axis=(1, 2))


class LinearizationNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ldr: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # Build the feature stack in the compute dtype: the stack feeds a
        # dtype-cast conv anyway, and f32 intermediates at [b,h,w,16,3]-scale
        # made lin memory-bound (53 GB/batch at b64 @ 512^2 — BENCH_NOTES r2).
        feats = linearization_features(ldr.astype(self.dtype))       # [b,h,w,93]
        feat = CrfFeatureNet(dtype=self.dtype, name="crf_feature_net")(feats, train)
        w = dense(N_PCA_WEIGHTS, name="pca_head")(feat.astype(jnp.float32))
        inv_emor = load_inverse_emor()
        invcrf = decode_invcrf(
            w, jnp.asarray(inv_emor.mean), jnp.asarray(inv_emor.basis)
        )
        return monotonic_rf(invcrf)
