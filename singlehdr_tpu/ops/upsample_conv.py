"""Fused bilinear-x2-upsample + 3x3 conv: one low-res conv + depth-to-space.

Every decoder stage in this model family computes ``conv3x3(resize_x2(x))``
(dequantization_net.py:25, hallucination_net.py:86-88, refinement_net.py:25).
Run literally, the conv executes at 2x resolution and the upsampled tensor
round-trips HBM — at b64 @ 512^2 the materialized intermediates reach 2 GB
per stage and dominate both time and memory (BENCH_NOTES r2: hal standalone
OOMs at b64; resize buffers are the largest allocations).

Because the x2 bilinear with half-pixel centers has fixed (0.25, 0.75) taps,
``conv(K, upsample(x))`` is algebraically ONE stride-1 3x3 convolution of the
LOW-res input per output phase.  Folding the lerp into the kernel gives a
[3, 3, Cin, 4*Cout] composite kernel; a conv at low resolution + a
depth-to-space interleave then produces the identical result with the same
FLOPs, 4x fewer conv positions, no materialized upsample, and better lane
fill for narrow stages (measured v5e b64 bf16: 1.4-2.4x per stage).

Borders are exact: the composite conv runs on an edge-replicated pad (which
reproduces the resize's clamp), and the four outer rings — where the high-res
conv's SAME *zero* padding differs from clamping — are recomputed directly
from thin upsampled strips and pasted over.

Interior derivation (per axis; K has taps -1,0,1; u = upsample(x)):
  y[2i]   = K[-1]u[2i-1] + K[0]u[2i]   + K[1]u[2i+1]
          = x[i-1](.75K[-1]+.25K[0]) + x[i](.25K[-1]+.75K[0]+.75K[1]) + x[i+1](.25K[1])
  y[2i+1] = K[-1]u[2i]   + K[0]u[2i+1] + K[1]u[2i+2]
          = x[i-1](.25K[-1]) + x[i](.75K[-1]+.75K[0]+.25K[1]) + x[i+1](.25K[0]+.75K[1])
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from singlehdr_tpu.ops.resize import resize_bilinear_x2

# axis transforms: rows = composite tap (-1, 0, +1), cols = original tap.
_T_EVEN = np.array(
    [[0.75, 0.25, 0.0], [0.25, 0.75, 0.75], [0.0, 0.0, 0.25]], np.float32
)
_T_ODD = np.array(
    [[0.25, 0.0, 0.0], [0.75, 0.75, 0.25], [0.0, 0.25, 0.75]], np.float32
)


def composite_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Cin,Cout] -> [3,3,Cin,4*Cout] lerp-folded phase kernels.

    Phase order (h, w): (0,0), (0,1), (1,0), (1,1) — matches the
    depth-to-space interleave below.  Built in f32 for accuracy.
    """
    k32 = k.astype(jnp.float32)
    phases = [
        jnp.einsum("ab,cd,bdio->acio", th, tw, k32)
        for th in (_T_EVEN, _T_ODD)
        for tw in (_T_EVEN, _T_ODD)
    ]
    return jnp.concatenate(phases, axis=-1)


def _conv(x, k, padding):
    return lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _depth_to_space_x2(x: jnp.ndarray, cout: int) -> jnp.ndarray:
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, cout)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, cout)


def upsample_conv_rings(x: jnp.ndarray, k: jnp.ndarray):
    """Exact outer 1-pixel rings of ``conv3x3_SAME(k, resize_x2(x))``.

    The composite low-res conv runs on an edge-replicated pad (reproducing
    the resize clamp), but the high-res conv's SAME *zero* padding differs
    from clamping on the outermost ring.  These strips recompute that ring
    from thin exact upsample slices (resize of a 2-wide slice matches the
    global resize on its outer two samples); ``upsample_conv_x2`` pastes
    them over the composite-conv interior.

    Returns ``(top, bottom, left, right)``: [b,1,2w,cout] x2, [b,2h,1,cout]
    x2, in x.dtype.  W rings include the true corner values.
    """
    k = k.astype(x.dtype)

    def h_ring(rows, top: bool):
        # rows: [b, 2, w, cin] low-res boundary rows (outermost first for top)
        u = resize_bilinear_x2(rows)            # [b, 4, 2w, cin]
        if top:
            strip = jnp.concatenate(
                [jnp.zeros_like(u[:, :1]), u[:, :2]], axis=1
            )
        else:
            strip = jnp.concatenate(
                [u[:, -2:], jnp.zeros_like(u[:, :1])], axis=1
            )
        # VALID over the 3-row window, SAME (zero) along W — the true border
        return _conv(strip, k, ((0, 0), (1, 1)))  # [b, 1, 2w, cout]

    def w_ring(cols, left: bool):
        u = resize_bilinear_x2(cols)            # [b, 2h, 4, cin]
        if left:
            strip = jnp.concatenate(
                [jnp.zeros_like(u[:, :, :1]), u[:, :, :2]], axis=2
            )
        else:
            strip = jnp.concatenate(
                [u[:, :, -2:], jnp.zeros_like(u[:, :, :1])], axis=2
            )
        return _conv(strip, k, ((1, 1), (0, 0)))  # [b, 2h, 1, cout]

    return (
        h_ring(x[:, :2], True),
        h_ring(x[:, -2:], False),
        w_ring(x[:, :, :2], True),
        w_ring(x[:, :, -2:], False),
    )


def upsample_conv_x2(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exactly ``conv3x3_SAME(k, resize_bilinear_x2(x))`` (no bias/act).

    x: [b, h, w, cin] NHWC; k: [3, 3, cin, cout] HWIO.  Returns
    [b, 2h, 2w, cout] in x.dtype.
    """
    if k.shape[0] != 3 or k.shape[1] != 3:
        raise ValueError(f"3x3 kernels only, got {k.shape}")
    cout = k.shape[3]
    k4 = composite_kernel(k).astype(x.dtype)

    # main body: edge-replicate pad reproduces the resize clamp; VALID conv
    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = _depth_to_space_x2(_conv(xe, k4, "VALID"), cout)

    # outer rings: the high-res conv zero-pads where the composite clamped
    y_top, y_bot, y_left, y_right = upsample_conv_rings(x, k)

    # paste via thin in-place updates: the former concatenate-of-slices form
    # materialized two full copies of the [b, 2h, 2w, cout] tensor (an extra
    # ~8 GB of traffic at dec1's b64 @ 512^2) just to replace 1-pixel rings.
    # W rings last so they own the corners (same precedence as before).
    y = y.at[:, :1].set(y_top)
    y = y.at[:, -1:].set(y_bot)
    y = y.at[:, :, :1].set(y_left)
    y = y.at[:, :, -1:].set(y_right)
    return y
