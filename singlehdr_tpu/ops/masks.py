"""Highlight-blend alpha and over/under-exposure loss masks.

  * ``highlight_alpha``: alpha = clamp((max_c(x) - 1 + thr)/thr, 0, 1) broadcast
    over channels — blends the hallucinated residual only into near-saturated
    regions (train.py:208-212, joint_training.py:141-145,
    finetune_real_dataset.py:160-163, test_real_refinement.py:98-101).
  * ``exposure_loss_mask``: zero the per-sample loss when more than half of the
    (assumed 256x256) gray pixels are >=249 or <=6 in 8-bit levels
    (train.py:61-70).  The 256*256*0.5 threshold is a fixed constant in the
    reference even for other image sizes; kept faithful with the actual pixel
    count available via ``relative=True``.
"""

from __future__ import annotations

import jax.numpy as jnp

from singlehdr_tpu.ops.color import rgb_to_grayscale_u8

HIGHLIGHT_THRESHOLD = 0.12
_REF_PIXEL_BUDGET = 256.0 * 256.0 * 0.5


def highlight_alpha(x: jnp.ndarray, threshold: float = HIGHLIGHT_THRESHOLD) -> jnp.ndarray:
    """[b,h,w,3] linear image -> [b,h,w,3] saturation-blend alpha in [0,1]."""
    m = jnp.max(x, axis=-1, keepdims=True)
    alpha = jnp.clip((m - 1.0 + threshold) / threshold, 0.0, 1.0)
    return jnp.broadcast_to(alpha, x.shape)


def exposure_loss_mask(
    rgb_u8: jnp.ndarray,
    over_level: float = 249.0,
    under_level: float = 6.0,
    relative: bool = False,
) -> jnp.ndarray:
    """Per-sample {0,1} mask [b,1,1,1] excluding extreme exposures.

    Args:
      rgb_u8: [b,h,w,3] image holding 8-bit levels (any real dtype).
      relative: if True, compare against half of the *actual* pixel count
        rather than the reference's hard-coded 256*256/2.
    """
    gray = rgb_to_grayscale_u8(rgb_u8)                       # [b,h,w,1]
    budget = (
        0.5 * gray.shape[1] * gray.shape[2] if relative else _REF_PIXEL_BUDGET
    )
    over = jnp.sum((gray >= over_level).astype(jnp.float32), axis=(1, 2), keepdims=True)
    under = jnp.sum((gray <= under_level).astype(jnp.float32), axis=(1, 2), keepdims=True)
    extreme = jnp.logical_or(over > budget, under > budget)  # [b,1,1,1]
    return jnp.logical_not(extreme).astype(jnp.float32)
