"""Arbitrary-size single-image HDR inference.

Reproduces the reference's inference geometry (test_real_refinement.py:124-154):
bicubic-resize each image up to the next multiple of 64, symmetric-pad by 32px,
run the 4-net pipeline, un-pad, and resize back to the original size.  Shapes
recompile per unique padded size; ``bucket_multiple`` can coarsen the padded
sizes (e.g. 256) to bound the number of XLA compilations over a directory of
mixed-size images.

Also provides ``pad_to_multiple`` / ``crop_back`` — the reference's unused
pass_net_nx helper surface (tf_utils.py:30-51) — used by the spatially-sharded
large-image path in ``parallel``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from singlehdr_tpu.models import ReverseCameraPipeline

PAD = 32
MULTIPLE = 64


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to_multiple(img: np.ndarray, multiple: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Symmetric-pad H,W up to multiples of `multiple`; returns (padded, (h, w))."""
    h, w = img.shape[:2]
    nh, nw = _ceil_to(h, multiple), _ceil_to(w, multiple)
    top, left = (nh - h) // 2, (nw - w) // 2
    padded = np.pad(
        img,
        ((top, nh - h - top), (left, nw - w - left), (0, 0)),
        mode="symmetric",
    )
    return padded, (h, w)


def crop_back(img: np.ndarray, orig_hw: Tuple[int, int]) -> np.ndarray:
    h, w = orig_hw
    nh, nw = img.shape[:2]
    top, left = (nh - h) // 2, (nw - w) // 2
    return img[top : top + h, left : left + w]


@dataclasses.dataclass
class HdrPredictor:
    """Jitted, shape-cached full-pipeline inference."""

    variables: dict
    use_refinement: bool = True
    bucket_multiple: int = MULTIPLE
    pad: int = PAD

    def __post_init__(self):
        self._pipe = ReverseCameraPipeline(use_refinement=self.use_refinement)
        self._fwd = jax.jit(lambda v, x: self._pipe.apply(v, x).hdr)

    def __call__(self, rgb01: np.ndarray) -> np.ndarray:
        """[h,w,3] float32 RGB in [0,1] -> [h,w,3] float32 HDR (RGB)."""
        oh, ow = rgb01.shape[:2]
        rh, rw = _ceil_to(oh, self.bucket_multiple), _ceil_to(ow, self.bucket_multiple)
        x = rgb01
        if (rh, rw) != (oh, ow):
            if not _HAS_CV2:
                raise RuntimeError("cv2 required for non-multiple-of-64 inputs")
            x = cv2.resize(x, (rw, rh), interpolation=cv2.INTER_CUBIC)
        x = np.pad(
            x, ((self.pad, self.pad), (self.pad, self.pad), (0, 0)), mode="symmetric"
        )
        out = self._fwd(self.variables, jnp.asarray(x, jnp.float32)[None])
        out = np.asarray(out[0])
        out = out[self.pad : -self.pad, self.pad : -self.pad]
        if (rh, rw) != (oh, ow):
            out = cv2.resize(out, (ow, oh), interpolation=cv2.INTER_CUBIC)
        return out
