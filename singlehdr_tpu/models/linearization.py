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


class _StemConvParams(nn.Module):
    """Owns the stem conv (kernel, bias) without computing it — the fused
    feature+stem kernel consumes the raw weights.  Names/shapes/inits match
    ``layers.conv`` exactly: one checkpoint layout for both paths."""

    @nn.compact
    def __call__(self):
        from singlehdr_tpu.models.layers import glorot
        from singlehdr_tpu.ops.histogram import N_FEATURES

        k = self.param(
            "kernel", glorot(), (7, 7, N_FEATURES, 64), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (64,), jnp.float32)
        return k, b


class _StemBnParams(nn.Module):
    """Owns stem_bn's params/stats (eval-mode BN is affine and folds into
    the conv — exact).  Matches nn.BatchNorm's layout."""

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (64,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (64,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((64,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((64,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


def _fused_lin_enabled() -> bool:
    import os

    return os.environ.get("SINGLEHDR_FUSED_LIN", "1") == "1"


class CrfFeatureNet(nn.Module):
    """7x7/2 stem + maxpool + res1..res5 + global average pool -> [b, 512].

    ``ldr`` (given) replaces the materialized 93-channel feature stack: the
    eval-mode fused Pallas pass (ops.pallas.lin_stem_pallas) computes the
    stack in VMEM and applies the BN-folded stem in one kernel — the dense
    path materializes ~15 GB of stack traffic at b128 @ 512^2 for a tensor
    the stem immediately reduces 93 -> 64 at quarter area (BENCH_NOTES r5).
    Parameters are identical between the paths."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False,
                 ldr: jnp.ndarray | None = None) -> jnp.ndarray:
        import jax

        from singlehdr_tpu.models.layers import BN_EPSILON
        from singlehdr_tpu.ops.pallas.lin_stem_pallas import (
            lin_feature_stem,
            supported,
        )

        if (
            ldr is not None
            and not train
            and _fused_lin_enabled()
            and jax.default_backend() == "tpu"
            and supported(ldr.shape)
        ):
            k, b = _StemConvParams(name="stem")()
            scale, bias, mean, var = _StemBnParams(name="stem_bn")()
            inv = scale / jnp.sqrt(var + BN_EPSILON)
            k_fold = (k * inv[None, None, None, :]).astype(self.dtype)
            b_fold = (b - mean) * inv + bias
            h = lin_feature_stem(ldr.astype(self.dtype), k_fold, b_fold)
        else:
            if feats is None:
                feats = linearization_features(ldr.astype(self.dtype))
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
        # The feature stack is built inside CrfFeatureNet (fused with the
        # stem on the TPU eval path; dense in the compute dtype otherwise —
        # f32 intermediates at [b,h,w,16,3]-scale made lin memory-bound,
        # 53 GB/batch at b64 @ 512^2, BENCH_NOTES r2).
        feat = CrfFeatureNet(dtype=self.dtype, name="crf_feature_net")(
            None, train, ldr=ldr
        )
        w = dense(N_PCA_WEIGHTS, name="pca_head")(feat.astype(jnp.float32))
        inv_emor = load_inverse_emor()
        invcrf = decode_invcrf(
            w, jnp.asarray(inv_emor.mean), jnp.asarray(inv_emor.basis)
        )
        return monotonic_rf(invcrf)
