"""Spatial resampling primitives matching TF2 semantics.

  * ``resize_bilinear_x2`` — the U-Net up-block upsample
    (dequantization_net.py:25, hallucination_net.py:86, refinement_net.py:25):
    tf.image.resize BILINEAR with half-pixel centers at an exact x2 scale has
    fixed (0.25, 0.75) weights, so it is implemented as edge-padded interleaved
    lerps — pure VPU work, no gather — which XLA fuses into the following conv's
    input. Identical to jax.image.resize('bilinear') at 2x (verified in tests).
  * ``avg_pool_2x2``  — keras AveragePooling2D((2,2), strides=2), VALID.
  * ``max_pool``      — tf.nn.max_pool with SAME padding.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _upsample_axis_x2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Half-pixel bilinear x2 along one axis: out[2i] = .25 a[i-1] + .75 a[i],
    out[2i+1] = .75 a[i] + .25 a[i+1], edges clamped."""
    lo = jnp.concatenate(
        [lax.slice_in_dim(x, 0, 1, axis=axis), lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    hi = jnp.concatenate(
        [lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis=axis,
    )
    even = 0.25 * lo + 0.75 * x
    odd = 0.75 * x + 0.25 * hi
    stacked = jnp.stack([even, odd], axis=axis + 1)          # [..., n, 2, ...]
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape)


def resize_bilinear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """[b,h,w,c] -> [b,2h,2w,c] bilinear with TF2 half-pixel-center semantics."""
    return _upsample_axis_x2(_upsample_axis_x2(x, 1), 2)


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping 2x2 mean pool (VALID): [b,h,w,c] -> [b,h//2,w//2,c]."""
    b, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2]
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: str = "SAME") -> jnp.ndarray:
    """Max pool over H,W with TF-style SAME/VALID padding."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
