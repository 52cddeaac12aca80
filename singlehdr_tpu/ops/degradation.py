"""Camera-pipeline degradation simulator (HDR -> noisy, CRF'd, quantized LDR).

The reference runs this eagerly on host inside a tf.py_function
(train.py:28-82, duplicated at joint_training.py:26-69) — the dominant non-GPU
cost per its call stack (SURVEY.md §3.1).  Here the math is a pure jittable
function over ``jax.random`` keys that runs on-device, fused by XLA; only the
JPEG round-trip (not XLA-expressible) remains on host
(``singlehdr_tpu.data.jpeg``), pipelined by the input loader.

Per-stage semantics (train.py:28-70):
  exposure     hdr * t                             (per-sample scalar t)
  shot noise   sigma_s = 0.08/6 * U[0,1)  per-sample per-channel, scales signal
  read noise   sigma_c = 0.005  * U[0,1)  per-sample per-channel, additive
  relu         clamp negatives from noise
  clip         dynamic-range clip to [0, 1]
  CRF          apply_rf(clipped, crf)
  quantize     round(ldr * 255) to 8-bit levels
  JPEG         per-sample quality ladder 90..100 (host; see data.jpeg)
  loss mask    exclude samples >50% over-/under-exposed (ops.masks)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from singlehdr_tpu.ops.curves import apply_rf
from singlehdr_tpu.ops.masks import exposure_loss_mask

SHOT_SIGMA = 0.08 / 6.0
READ_SIGMA = 0.005


class CaptureSim(NamedTuple):
    """Device-side simulator outputs (all float32, NHWC)."""

    hdr_t: jnp.ndarray        # exposed + noised HDR (unclipped) — hal target
    clipped_hdr_t: jnp.ndarray  # clip(hdr_t, 0, 1) — lin target / hal input
    ldr: jnp.ndarray          # CRF-applied LDR in [0,1] — deq target / lin input
    quantized_u8: jnp.ndarray  # round(ldr*255) as uint8 — host JPEG input


def jpeg_quality_ladder(batch_size: int) -> list[int]:
    """Per-sample JPEG qualities 90..100: int(round(i/(B-1)*10 + 90))
    (train.py:56)."""
    if batch_size == 1:
        return [90]
    return [
        int(round(float(i) / float(batch_size - 1) * 10.0 + 90.0))
        for i in range(batch_size)
    ]


def simulate_capture(
    key: jax.Array, hdr: jnp.ndarray, crf: jnp.ndarray, t: jnp.ndarray
) -> CaptureSim:
    """Run the on-device degradation chain for a batch.

    Args:
      key: PRNG key (per step).
      hdr: [b,h,w,3] linear HDR patches (mean-normalized to 0.5 upstream).
      crf: [b,1024] per-sample camera response curves.
      t:   [b] exposure multipliers.
    """
    k_s, k_c, k_ns, k_nc = jax.random.split(key, 4)
    b = hdr.shape[0]

    hdr_t = hdr * t.reshape(b, 1, 1, 1)

    sigma_s = SHOT_SIGMA * jax.random.uniform(k_s, (b, 1, 1, 3), hdr.dtype)
    sigma_c = READ_SIGMA * jax.random.uniform(k_c, (b, 1, 1, 3), hdr.dtype)
    noise_s = jax.random.normal(k_ns, hdr_t.shape, hdr.dtype) * (sigma_s * hdr_t)
    noise_c = jax.random.normal(k_nc, hdr_t.shape, hdr.dtype) * sigma_c
    hdr_t = jax.nn.relu(hdr_t + noise_s + noise_c)

    clipped = jnp.clip(hdr_t, 0.0, 1.0)
    ldr = apply_rf(clipped, crf)
    quantized = jnp.round(ldr * 255.0).astype(jnp.uint8)
    return CaptureSim(hdr_t, clipped, ldr, quantized)


def loss_mask_from_levels(jpeg_levels: jnp.ndarray) -> jnp.ndarray:
    """[b,h,w,3] 8-bit levels (uint8 or float) -> [b,1,1,1] loss mask."""
    return exposure_loss_mask(jpeg_levels.astype(jnp.float32))
