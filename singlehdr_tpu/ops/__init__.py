"""Pure-JAX tensor ops for the reverse-camera HDR pipeline.

All functions are jittable, shape-polymorphic in batch/spatial dims (static under
trace), NHWC, and designed to fuse well under XLA on TPU: elementwise chains stay
unfused-gather-free where possible, and the per-pixel hot ops (LUT application,
soft histograms) have Pallas TPU kernels under ``ops.pallas``.
"""

from singlehdr_tpu.ops.color import (
    flip_channels,
    rgb_to_bgr,
    bgr_to_rgb,
    rgb_to_grayscale_u8,
    vgg_preprocess,
)
from singlehdr_tpu.ops.curves import (
    apply_rf,
    decode_invcrf,
    monotonic_rf,
)
from singlehdr_tpu.ops.histogram import soft_histogram, linearization_features
from singlehdr_tpu.ops.sobel import sobel_edges
from singlehdr_tpu.ops.tonemap import (
    mu_tonemap,
    hdr_log_compression,
    hdr_log_decompression,
)
from singlehdr_tpu.ops.masks import highlight_alpha, exposure_loss_mask
from singlehdr_tpu.ops.losses import (
    hallucination_loss,
    masked_l1,
    masked_l2,
    perceptual_l1,
    scalar_from_per_sample,
    tv_loss,
)
from singlehdr_tpu.ops.degradation import (
    CaptureSim,
    jpeg_quality_ladder,
    loss_mask_from_levels,
    simulate_capture,
)
from singlehdr_tpu.ops.resize import resize_bilinear_x2, avg_pool_2x2, max_pool

__all__ = [
    "flip_channels",
    "rgb_to_bgr",
    "bgr_to_rgb",
    "rgb_to_grayscale_u8",
    "vgg_preprocess",
    "apply_rf",
    "decode_invcrf",
    "monotonic_rf",
    "soft_histogram",
    "linearization_features",
    "sobel_edges",
    "mu_tonemap",
    "hdr_log_compression",
    "hdr_log_decompression",
    "highlight_alpha",
    "exposure_loss_mask",
    "masked_l1",
    "masked_l2",
    "hallucination_loss",
    "scalar_from_per_sample",
    "tv_loss",
    "perceptual_l1",
    "CaptureSim",
    "jpeg_quality_ladder",
    "loss_mask_from_levels",
    "simulate_capture",
    "resize_bilinear_x2",
    "avg_pool_2x2",
    "max_pool",
]
