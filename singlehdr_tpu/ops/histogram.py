"""Spatial-aware soft histogram features for the Linearization-Net.

Per-pixel triangular-kernel soft binning (linearization_net.py:336-350): for bin
i in 1..B with center c_i = (2i-1)/(2B), the response is ``1 - d*B`` where
``d = |x - c_i| < 1/B`` and 0 otherwise.  Because the response hits exactly 0 at
d = 1/B, this is just ``relu(1 - d*B)`` — one fused VPU expression instead of
the reference's per-bin Python loop.

Channel order matches the reference concat: bin-major, RGB within each bin
([bin1_r, bin1_g, bin1_b, bin2_r, ...]).

``linearization_features`` assembles the Linearization-Net's 93-channel input
stack (linearization_net.py:310-322): image(3) + Sobel edges(6) + soft
histograms at B=4,8,16 (12+24+48).
"""

from __future__ import annotations

import jax.numpy as jnp

from singlehdr_tpu.ops.sobel import sobel_edges

HISTOGRAM_BINS = (4, 8, 16)
N_FEATURES = 3 + 6 + sum(3 * b for b in HISTOGRAM_BINS)  # 93


def soft_histogram(img: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Per-pixel triangular soft-binning of [b,h,w,c] into [b,h,w,n_bins*c]."""
    centers = (2.0 * jnp.arange(1, n_bins + 1, dtype=img.dtype) - 1.0) / (2.0 * n_bins)
    d = jnp.abs(img[..., None, :] - centers[:, None])       # [b,h,w,bins,c]
    resp = jnp.maximum(0.0, 1.0 - d * n_bins)
    return resp.reshape(*img.shape[:-1], n_bins * img.shape[-1])


def linearization_features(img: jnp.ndarray) -> jnp.ndarray:
    """93-channel feature stack: [img, sobel(6), hist4, hist8, hist16]."""
    parts = [img, sobel_edges(img)]
    parts += [soft_histogram(img, b) for b in HISTOGRAM_BINS]
    return jnp.concatenate(parts, axis=-1)
