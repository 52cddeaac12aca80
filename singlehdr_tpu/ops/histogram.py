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
    """Per-pixel triangular soft-binning of [b,h,w,c] into [b,h,w,n_bins*c].

    Bin-major channel order (bin0 RGB, bin1 RGB, ...), matching the reference
    loop (linearization_net.py:336-350).
    """
    centers = (2.0 * jnp.arange(1, n_bins + 1, dtype=img.dtype) - 1.0) / (2.0 * n_bins)
    d = jnp.abs(img[..., None, :] - centers[:, None])       # [b,h,w,bins,c]
    resp = jnp.maximum(0.0, 1.0 - d * n_bins)
    return resp.reshape(*img.shape[:-1], n_bins * img.shape[-1])


def linearization_features(img: jnp.ndarray) -> jnp.ndarray:
    """93-channel feature stack: [img, sobel(6), hist4, hist8, hist16].

    Computed channel-first: every intermediate is [b, c', h, w] whose minor
    (lane) dim is W, so nothing pads.  Assembled NHWC with small-c
    intermediates, XLA materializes each 3/6-channel tensor padded to the
    128-lane tile in the stem conv's preferred layout — measured 47-124 GB
    of traffic at b64 @ 512^2 vs ~10 GB this way (BENCH_NOTES r2).  One
    transpose at the end hands XLA the layout change it would otherwise do
    thirty times.
    """
    b, h, w, c = img.shape
    x = jnp.transpose(img, (0, 3, 1, 2))                     # [b, 3, h, w]

    parts = [x]
    # Sobel in NCHW, c-major (dy, dx) pairs — same math as ops.sobel:
    # smooth along W then difference along H (dy), and vice versa (dx)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    sw = xp[:, :, :, 0:w] + 2.0 * xp[:, :, :, 1 : w + 1] + xp[:, :, :, 2 : w + 2]
    dy = sw[:, :, 2 : h + 2] - sw[:, :, 0:h]
    sh = xp[:, :, 0:h] + 2.0 * xp[:, :, 1 : h + 1] + xp[:, :, 2 : h + 2]
    dx = sh[:, :, :, 2 : w + 2] - sh[:, :, :, 0:w]
    sob = jnp.stack([dy, dx], axis=2).reshape(b, 2 * c, h, w)
    parts.append(sob)

    for n_bins in HISTOGRAM_BINS:
        centers = (
            2.0 * jnp.arange(1, n_bins + 1, dtype=img.dtype) - 1.0
        ) / (2.0 * n_bins)
        d = jnp.abs(x[:, None] - centers[:, None, None, None])  # [b,bins,3,h,w]
        resp = jnp.maximum(0.0, 1.0 - d * n_bins)
        parts.append(resp.reshape(b, n_bins * c, h, w))         # bin-major

    stack = jnp.concatenate(parts, axis=1)                      # [b, 93, h, w]
    return jnp.transpose(stack, (0, 2, 3, 1))
