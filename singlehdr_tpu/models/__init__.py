"""Flax model families of the reverse-camera-pipeline framework.

Four trainable networks (SURVEY.md §2 rows 1-8) plus the frozen VGG16
perceptual backbone (row 9) and the composite end-to-end pipeline:

  * DequantizationNet  — 5-scale residual U-Net, tanh residual.
  * LinearizationNet   — CRF feature extractor + EMoR inverse-CRF decoder.
  * HallucinationNet   — VGG-layout autoencoder predicting an HDR residual (BGR).
  * RefinementNet      — U-Net fusing (A, B, C) stage outputs.
  * Vgg16Features      — frozen conv1_1..pool3 feature extractor for losses.
  * ReverseCameraPipeline — deq -> lin -> apply_rf -> hal -> ref composite.
"""

from singlehdr_tpu.models.unet import ResidualUNet
from singlehdr_tpu.models.dequantization import DequantizationNet
from singlehdr_tpu.models.refinement import RefinementNet
from singlehdr_tpu.models.linearization import LinearizationNet
from singlehdr_tpu.models.hallucination import HallucinationNet
from singlehdr_tpu.models.vgg16 import Vgg16Features, load_vgg16_params
from singlehdr_tpu.models.pipeline import ReverseCameraPipeline, PipelineOutputs

__all__ = [
    "ResidualUNet",
    "DequantizationNet",
    "RefinementNet",
    "LinearizationNet",
    "HallucinationNet",
    "Vgg16Features",
    "load_vgg16_params",
    "ReverseCameraPipeline",
    "PipelineOutputs",
]
