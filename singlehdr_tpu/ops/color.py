"""Channel-order and color conversions.

The reference keeps images in a mix of RGB and BGR (cv2 reads BGR; the
Hallucination-Net outputs BGR; VGG16 expects mean-subtracted BGR).  Both of the
reference's converters (``tf_utils.py:5-13``) are the same channel reversal —
they are involutions — so a single ``flip_channels`` covers both directions.
"""

from __future__ import annotations

import jax.numpy as jnp

# ImageNet BGR means used by VGG16 and the Hallucination-Net preamble
# (vgg16.py:57, hallucination_net.py:110).
VGG_MEAN_BGR = (103.939, 116.779, 123.68)

# Luma weights used by tf.image.rgb_to_grayscale (ITU-R BT.601).
_LUMA_RGB = (0.2989, 0.587, 0.114)


def flip_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the channel axis (RGB<->BGR). Involution."""
    return x[..., ::-1]


# Named aliases for readability at call sites.
rgb_to_bgr = flip_channels
bgr_to_rgb = flip_channels


def rgb_to_grayscale_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma of an 8-bit RGB image, rounded back to integer levels.

    Matches tf.image.rgb_to_grayscale on uint8 input (float convert, weighted
    sum, round on convert back) as used by the degradation loss mask
    (``train.py:62``).  Input may be any float/int dtype holding 0..255 levels;
    output is float32 holding integer levels (kept float for TPU-friendliness).
    """
    x = rgb_u8.astype(jnp.float32)
    lum = (
        _LUMA_RGB[0] * x[..., 0] + _LUMA_RGB[1] * x[..., 1] + _LUMA_RGB[2] * x[..., 2]
    )
    return jnp.round(lum)[..., None]


def vgg_preprocess(rgb01: jnp.ndarray, mean=VGG_MEAN_BGR) -> jnp.ndarray:
    """Scale [0,1] RGB to 0..255, reorder to BGR, subtract per-channel means.

    Shared preamble of VGG16 (``vgg16.py:95-109``) and the Hallucination-Net
    (``hallucination_net.py:149-153``).  ``mean`` defaults to the ImageNet BGR
    means; the Hallucination-Net threads it as a stored variable so that
    BGR-trained reference weights (whose effective mean order is reversed —
    see train.weight_import.adapt_channel_order) import as a pure weight
    transform.
    """
    x = rgb01 * 255.0
    mean = jnp.asarray(mean, dtype=x.dtype)
    return flip_channels(x) - mean
