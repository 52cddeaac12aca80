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
        # per padded-(h,w) bucket: batch sizes already compiled ("warm")
        self._warm: dict = {}

    def bucket_key(self, shape) -> Tuple[int, int]:
        """The padded (h, w) bucket an input shape compiles under."""
        return (
            _ceil_to(shape[0], self.bucket_multiple),
            _ceil_to(shape[1], self.bucket_multiple),
        )

    def _prepare(self, rgb01: np.ndarray) -> np.ndarray:
        """Resize to the bucket and apply the symmetric halo pad."""
        oh, ow = rgb01.shape[:2]
        rh, rw = self.bucket_key(rgb01.shape)
        x = rgb01
        if (rh, rw) != (oh, ow):
            if not _HAS_CV2:
                raise RuntimeError("cv2 required for non-multiple-of-64 inputs")
            x = cv2.resize(x, (rw, rh), interpolation=cv2.INTER_CUBIC)
        return np.pad(
            x, ((self.pad, self.pad), (self.pad, self.pad), (0, 0)), mode="symmetric"
        )

    def _finish(self, out: np.ndarray, orig_hw) -> np.ndarray:
        out = out[self.pad : -self.pad, self.pad : -self.pad]
        oh, ow = orig_hw
        if out.shape[:2] != (oh, ow):
            out = cv2.resize(out, (ow, oh), interpolation=cv2.INTER_CUBIC)
        return out

    def __call__(self, rgb01: np.ndarray) -> np.ndarray:
        """[h,w,3] float32 RGB in [0,1] -> [h,w,3] float32 HDR (RGB)."""
        return self.predict_batch([rgb01])[0]

    def warmup(self, sizes, batch_sizes=(1,)) -> None:
        """Pre-compile (bucket, batch) executables so first requests don't pay
        the multi-second XLA compile.

        ``sizes`` are *input* (h, w) pairs — each is mapped through
        ``bucket_key`` exactly like a request would be.  Compiled entries land
        in the same warm-set ``predict_batch`` consults, so a later group of
        n <= max(batch_sizes) images runs immediately on the nearest warm
        executable.
        """
        for hw in sizes:
            rh, rw = self.bucket_key(hw)
            key = (rh, rw)
            warm = self._warm.setdefault(key, set())
            for n in sorted(set(batch_sizes)):
                if n in warm:
                    continue
                x = jnp.zeros(
                    (n, rh + 2 * self.pad, rw + 2 * self.pad, 3), jnp.float32
                )
                jax.block_until_ready(self._fwd(self.variables, x))
                warm.add(n)

    def predict_batch(self, images) -> list:
        """Run same-bucket images as one device batch.

        A group reuses the smallest already-compiled ("warm") batch size that
        fits, repeat-padding up to it — wasted compute is bounded by the gap
        to the nearest warm executable, never a blanket 2x.  A cold group runs
        at its exact size (one compile, then warm), so the executable count
        stays O(shapes x distinct group sizes) without power-of-two padding.
        """
        keys = {self.bucket_key(im.shape) for im in images}
        if len(keys) != 1:
            raise ValueError(f"predict_batch requires one bucket, got {keys}")
        stacked = np.stack([self._prepare(im) for im in images])
        n = stacked.shape[0]
        warm = self._warm.setdefault(keys.pop(), set())
        n_run = min((m for m in warm if m >= n), default=n)
        if n_run != n:
            stacked = np.concatenate(
                [stacked, np.repeat(stacked[-1:], n_run - n, axis=0)]
            )
        out = np.asarray(self._fwd(self.variables, jnp.asarray(stacked, jnp.float32)))
        warm.add(n_run)
        return [
            self._finish(out[i], im.shape[:2]) for i, im in enumerate(images)
        ]
