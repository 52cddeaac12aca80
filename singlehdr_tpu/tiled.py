"""Large-image inference: overlapping tiles and spatially-sharded execution.

Two ways to push single-image inference beyond one compilation/HBM budget:

  * ``TiledPredictor`` — split the image into fixed-size tiles with halo
    overlap, run the conv stages per tile, and blend the overlaps with linear
    feathering.  The inverse CRF is *global* image state (the Linearization-Net
    pools over the whole image), so it is estimated once from a downsampled
    full view and applied per tile; the convolutional stages (deq / hal / ref)
    are local up to their receptive field, which the halo covers.  This
    generalizes the reference's unused fixed-pad helper (tf_utils.py:30-51)
    into a constant-shape scheme: every tile compiles once, any image size
    runs without recompilation.

  * ``shard_spatial`` — run the full pipeline with image rows sharded over the
    mesh's 'spatial' axis; XLA SPMD inserts halo exchanges through the conv
    stencils (the conv analog of context parallelism, SURVEY.md §5).  Exact,
    and scales HBM across chips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from singlehdr_tpu.models import (
    DequantizationNet,
    HallucinationNet,
    LinearizationNet,
    RefinementNet,
    ReverseCameraPipeline,
)
from singlehdr_tpu.ops.color import bgr_to_rgb
from singlehdr_tpu.ops.curves import apply_rf
from singlehdr_tpu.ops.masks import highlight_alpha
from singlehdr_tpu.parallel import batch_sharding, make_mesh, replicate


def _feather_weights(size: int, halo: int) -> np.ndarray:
    """1-D blend profile: 0..1 ramp across the halo, 1 in the interior."""
    w = np.ones(size, np.float32)
    if halo > 0:
        ramp = (np.arange(halo, dtype=np.float32) + 1.0) / (halo + 1.0)
        w[:halo] = ramp
        w[-halo:] = ramp[::-1]
    return w


@dataclasses.dataclass
class TiledPredictor:
    """Constant-shape tiled inference over arbitrarily large images.

    Args:
      variables: composite pipeline variables ({"params": {deq,lin,hal,ref}, ...}).
      tile: tile edge (multiple of 64); every tile compiles one XLA program.
      halo: overlap between tiles (>= the conv stacks' receptive-field radius).
      invcrf_view: the downsample size of the full-image view used for the
        global inverse-CRF estimate.
    """

    variables: dict
    tile: int = 512
    halo: int = 64
    invcrf_view: int = 256
    use_refinement: bool = True
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if self.tile % 64:
            raise ValueError("tile must be a multiple of 64")
        deq = DequantizationNet(dtype=self.dtype)
        lin = LinearizationNet(dtype=self.dtype)
        hal = HallucinationNet(dtype=self.dtype)
        ref = RefinementNet(dtype=self.dtype)
        v = self.variables

        def net_vars(name):
            return {
                "params": v["params"][name],
                "batch_stats": v.get("batch_stats", {}).get(name, {}),
            }

        @jax.jit
        def estimate_invcrf(view):
            c = jnp.clip(deq.apply(net_vars("deq"), view), 0.0, 1.0)
            return lin.apply(net_vars("lin"), c)

        @jax.jit
        def run_tile(tile_ldr, invcrf):
            c = jnp.clip(deq.apply(net_vars("deq"), tile_ldr), 0.0, 1.0)
            b = apply_rf(c, invcrf)
            alpha = highlight_alpha(b)
            a = b + alpha * bgr_to_rgb(hal.apply(net_vars("hal"), b))
            if self.use_refinement:
                return ref.apply(
                    net_vars("ref"), jnp.concatenate([a, b, c], axis=-1)
                )
            return a

        self._estimate_invcrf = estimate_invcrf
        self._run_tile = run_tile

    def __call__(self, rgb01: np.ndarray) -> np.ndarray:
        """[h,w,3] float32 RGB in [0,1] -> [h,w,3] float32 HDR."""
        h, w = rgb01.shape[:2]
        t, halo = self.tile, self.halo
        stride = t - 2 * halo
        if h <= t and w <= t:
            pad_h, pad_w = t - h, t - w
            x = np.pad(rgb01, ((0, pad_h), (0, pad_w), (0, 0)), mode="symmetric")
            invcrf = self._global_invcrf(x)
            out = np.asarray(self._run_tile(jnp.asarray(x)[None], invcrf)[0])
            return out[:h, :w]

        invcrf = self._global_invcrf(rgb01)
        acc = np.zeros((h, w, 3), np.float32)
        norm = np.zeros((h, w, 1), np.float32)
        wy = _feather_weights(t, halo)
        wx = _feather_weights(t, halo)
        blend = (wy[:, None] * wx[None, :])[..., None]

        ys = list(range(0, max(h - t, 0) + 1, stride))
        xs = list(range(0, max(w - t, 0) + 1, stride))
        if ys[-1] + t < h:
            ys.append(h - t)
        if xs[-1] + t < w:
            xs.append(w - t)
        for y in ys:
            for x0 in xs:
                tile_in = rgb01[y : y + t, x0 : x0 + t]
                ph, pw = t - tile_in.shape[0], t - tile_in.shape[1]
                if ph or pw:
                    tile_in = np.pad(
                        tile_in, ((0, ph), (0, pw), (0, 0)), mode="symmetric"
                    )
                tile_out = np.asarray(
                    self._run_tile(jnp.asarray(tile_in)[None], invcrf)[0]
                )
                th, tw = min(t, h - y), min(t, w - x0)
                acc[y : y + th, x0 : x0 + tw] += (
                    tile_out[:th, :tw] * blend[:th, :tw]
                )
                norm[y : y + th, x0 : x0 + tw] += blend[:th, :tw]
        return acc / np.maximum(norm, 1e-8)

    def _global_invcrf(self, rgb01: np.ndarray) -> jnp.ndarray:
        try:
            import cv2

            view = cv2.resize(
                rgb01,
                (self.invcrf_view, self.invcrf_view),
                interpolation=cv2.INTER_AREA,
            )
        except Exception:  # pragma: no cover
            view = np.asarray(
                jax.image.resize(
                    jnp.asarray(rgb01),
                    (self.invcrf_view, self.invcrf_view, 3),
                    "linear",
                )
            )
        return self._estimate_invcrf(jnp.asarray(view, jnp.float32)[None])


def shard_spatial(
    variables: dict,
    rgb01: np.ndarray,
    n_devices: Optional[int] = None,
    use_refinement: bool = True,
):
    """Run the exact full pipeline with rows sharded over the 'spatial' axis.

    Returns the [h,w,3] HDR output; halo exchanges are inserted by XLA SPMD.
    Height must be divisible by (n_devices * 64).
    """
    mesh = make_mesh(n_devices, spatial=n_devices or len(jax.devices()))
    pipe = ReverseCameraPipeline(use_refinement=use_refinement)
    fwd = jax.jit(lambda v, x: pipe.apply(v, x).hdr)
    x = jax.device_put(
        np.asarray(rgb01, np.float32)[None], batch_sharding(mesh, spatial_dim=1)
    )
    v = replicate(mesh, variables)
    return np.asarray(fwd(v, x)[0])
