"""Metrics, quality measures, and observability.

Covers the reference's observability surface (SURVEY.md §2 row 20, §5):
running ``Mean`` trackers (tf.keras.metrics.Mean), TensorBoard scalar/image/
histogram summaries (via tensorboardX when available, else a JSONL event log),
and the PSNR/SSIM quality metrics used for parity evaluation.
"""

from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

try:
    from tensorboardX import SummaryWriter as _TBWriter

    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False


class Mean:
    """Running mean tracker (tf.keras.metrics.Mean equivalent)."""

    def __init__(self, name: str = "mean"):
        self.name = name
        self._total = 0.0
        self._count = 0

    def update(self, value) -> None:
        arr = np.asarray(value, np.float64)
        self._total += float(arr.sum())
        self._count += int(arr.size)

    def result(self) -> float:
        return self._total / self._count if self._count else 0.0

    def reset(self) -> None:
        self._total, self._count = 0.0, 0


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB, per batch."""
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over a [b,h,w,c] batch (Gaussian-windowed, standard constants)."""
    half = filter_size // 2
    coords = jnp.arange(filter_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)

    def blur1d(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (half, half)
        xp = jnp.pad(x, pad, mode="symmetric")
        out = 0.0
        for i in range(filter_size):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + g[i] * xp[tuple(sl)]
        return out

    def smooth(x):
        return blur1d(blur1d(x, 1), 2)

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_p, mu_t = smooth(pred), smooth(target)
    var_p = smooth(pred * pred) - mu_p**2
    var_t = smooth(target * target) - mu_t**2
    cov = smooth(pred * target) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


class MetricsWriter:
    """Scalar/image/histogram logging: TensorBoard when available + JSONL."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._tb = _TBWriter(logdir) if (_HAS_TB and use_tensorboard) else None
        # line-buffered so live runs are observable (tail -f) without waiting
        # for close()
        self._jsonl = open(os.path.join(logdir, "events.jsonl"), "a", buffering=1)

    def scalar(self, tag: str, value, step: int) -> None:
        v = float(np.asarray(value).mean())
        if self._tb:
            self._tb.add_scalar(tag, v, step)
        self._jsonl.write(
            json.dumps({"t": time.time(), "step": step, tag: v}) + "\n"
        )

    def image(self, tag: str, img, step: int, max_images: int = 3) -> None:
        if self._tb is None:
            return
        arr = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
        for i in range(min(arr.shape[0], max_images)):
            self._tb.add_image(f"{tag}/{i}", arr[i], step, dataformats="HWC")

    def histogram(self, tag: str, values, step: int) -> None:
        if self._tb:
            self._tb.add_histogram(tag, np.asarray(values).ravel(), step)

    def flush(self) -> None:
        if self._tb:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb:
            self._tb.close()
        self._jsonl.close()
