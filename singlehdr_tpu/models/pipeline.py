"""The composite reverse-camera pipeline: deq -> lin -> apply_rf -> hal -> ref.

One Flax module owning the four networks as named submodules (``deq`` /
``lin`` / ``hal`` / ``ref``), so per-net checkpoints restore 1:1 into the
composite's parameter subtrees.  The staging follows the inference/finetune
drivers (test_real_refinement.py:86-110, finetune_real_dataset.py:149-175):

    C_pred = clip(deq(ldr), 0, 1)
    invcrf = lin(C_pred)
    B_pred = apply_rf(C_pred, invcrf)
    alpha  = highlight_alpha(B_pred)
    A_pred = B_pred + alpha * channel_swap(hal(B_pred))
    out    = ref(concat[A_pred, B_pred, C_pred])

Note the reference's finetune driver feeds an undefined variable to the
Hallucination-Net (``_hal(pred)``, finetune_real_dataset.py:165 — a latent
NameError); the intended input per the inference driver is B_pred
(test_real_refinement.py:103), which is what this module implements.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from singlehdr_tpu.models.dequantization import DequantizationNet
from singlehdr_tpu.models.hallucination import HallucinationNet
from singlehdr_tpu.models.linearization import LinearizationNet
from singlehdr_tpu.models.refinement import RefinementNet
from singlehdr_tpu.ops.color import bgr_to_rgb
from singlehdr_tpu.ops.curves import apply_rf
from singlehdr_tpu.ops.masks import highlight_alpha


@dataclasses.dataclass
class PipelineOutputs:
    """Stage outputs named as in the reference drivers."""

    c_pred: jnp.ndarray          # dequantized LDR
    invcrf: jnp.ndarray          # [b, 1024] inverse CRF
    b_pred: jnp.ndarray          # linearized irradiance
    alpha: jnp.ndarray           # highlight blend mask
    a_pred: jnp.ndarray          # hallucinated HDR
    hdr: jnp.ndarray             # refined output (== a_pred when refinement off)


class ReverseCameraPipeline(nn.Module):
    """Full 4-net single-image HDR reconstruction."""

    use_refinement: bool = True
    dtype: Any = jnp.float32
    fast_convs: bool = True  # packed-lane convs in deq/ref (dense fallback off-TPU)

    @nn.compact
    def __call__(self, ldr: jnp.ndarray, train: bool = False) -> PipelineOutputs:
        c_pred = jnp.clip(
            DequantizationNet(
                dtype=self.dtype, fast_convs=self.fast_convs, name="deq"
            )(ldr, train),
            0.0,
            1.0,
        )
        invcrf = LinearizationNet(dtype=self.dtype, name="lin")(c_pred, train)
        b_pred = apply_rf(c_pred, invcrf)
        alpha = highlight_alpha(b_pred)
        residual = bgr_to_rgb(
            HallucinationNet(dtype=self.dtype, name="hal")(b_pred, train)
        )
        a_pred = b_pred + alpha * residual
        if self.use_refinement:
            abc = jnp.concatenate([a_pred, b_pred, c_pred], axis=-1)
            hdr = RefinementNet(
                dtype=self.dtype, fast_convs=self.fast_convs, name="ref"
            )(abc, train)
        else:
            hdr = a_pred
        return PipelineOutputs(
            c_pred=c_pred,
            invcrf=invcrf,
            b_pred=b_pred,
            alpha=alpha,
            a_pred=a_pred,
            hdr=hdr,
        )
