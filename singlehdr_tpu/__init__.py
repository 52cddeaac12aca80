"""singlehdr_tpu — a TPU-native single-image HDR reconstruction framework.

A brand-new JAX/Flax/Pallas framework with the capabilities of the TF2 reference
``ShinYwings/SingleHDR-tf2`` (CVPR 2020, "Single-Image HDR Reconstruction by Learning
to Reverse the Camera Pipeline"): the four-stage reverse-camera-pipeline —
Dequantization-Net, Linearization-Net, Hallucination-Net, Refinement-Net — plus the
HDR-Synth camera-degradation simulator, data pipelines, training/finetuning/inference
drivers, data-parallel + spatially-sharded execution over TPU meshes, and Pallas
kernels for the hot per-pixel ops.

Subpackages
-----------
calib     EMoR / inverse-EMoR response-curve models and CRF sampling.
ops       Pure-JAX tensor ops (LUT application, soft histograms, Sobel, tonemaps,
          masks, losses) and their Pallas TPU kernels.
models    Flax modules for the four networks and the frozen VGG16 feature extractor.
data      Dataset abstractions, HDR/LDR IO, record files, async host loaders.
train     Train states, loss-weighted train steps, checkpointing, metrics.
parallel  Device meshes and sharding policies (data / spatial axes over ICI).
cli       Command-line drivers mirroring the reference's four entry scripts.
"""

__version__ = "0.1.0"
